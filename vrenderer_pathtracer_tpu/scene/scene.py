"""Scene container: everything the integrator reads, as one pytree.

The reference scatters scene state across device buffers, texture binds and
constant symbols (``src/vRendererCuda.cpp:154-216``,
``cuda/src/PathTracer.cu:24-48``).  Here the whole scene is a single NamedTuple
pytree handed to the jitted render step; under multi-chip sharding every leaf
is *replicated* into each chip's HBM (the reference's single-GPU resident set,
generalised), while rays/tiles are the sharded axis.

Optional assets are `None` when absent — pytree structure then encodes the
same information as the reference's ``kHas*`` flags, and a change of structure
triggers a recompile exactly like the reference's constant-symbol flips.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.scene.spheres import SphereSet, build_sphere_set


class MeshData(NamedTuple):
    """Flattened SBVH + triangle streams (Aila/Laine layout, see accel/)."""

    bvh_nodes: jnp.ndarray   # [M,16] float32 — 4x float4 per inner node
    tri_verts: jnp.ndarray   # [T,3,3] float32 — woopified or raw vertices
    tri_normals: jnp.ndarray # [T,3,3]
    tri_tangents: jnp.ndarray# [T,3,3]
    tri_uvs: jnp.ndarray     # [T,3,2]
    tri_count: jnp.ndarray   # [] int32 — valid triangles (rest is padding)


class Scene(NamedTuple):
    spheres: SphereSet
    hdr: Optional[jnp.ndarray] = None          # [H,W,3] float32 lat-long env map
    diffuse_map: Optional[jnp.ndarray] = None  # [H,W,3] linearised
    normal_map: Optional[jnp.ndarray] = None   # [H,W,3] raw
    specular_map: Optional[jnp.ndarray] = None # [H,W,3] raw
    brdf: Optional[jnp.ndarray] = None         # [3, 90*90*180] MERL table
    mesh: Optional[MeshData] = None

    @classmethod
    def analytic(cls, settings: RenderSettings, hdr: Optional[jnp.ndarray] = None) -> "Scene":
        """Sphere-only scene matching the settings' cornell flag."""
        return cls(spheres=build_sphere_set(settings.use_cornell_box), hdr=hdr)


def settings_for_scene(scene: Scene, settings: RenderSettings) -> RenderSettings:
    """Derive the ``has_*`` static flags from which assets are present."""
    return settings.replace(
        has_diffuse_map=scene.diffuse_map is not None,
        has_normal_map=scene.normal_map is not None,
        has_specular_map=scene.specular_map is not None,
        has_brdf=scene.brdf is not None,
        has_mesh=scene.mesh is not None,
        has_hdr=scene.hdr is not None,
    )
