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


class PagedNodes(NamedTuple):
    """Two-level acceleration arrays for VMEM-exceeding meshes.

    Triangles are Morton-clustered into fixed-size pages, each with its own
    object-split BVH collapsed to the 8-wide layout (accel/paged.py); the
    Pallas paged kernel double-buffers page arrays HBM -> VMEM with manual
    DMAs.  ``tri_pack`` rows store GLOBAL slots (page*page_tris baked in);
    ``nodes8_i`` row = 8 x (ref, count) + sort axis in col 16.  Minor dims
    are lane-padded to 128 so the kernel's page DMAs can slice whole pages
    (Mosaic requires HBM slice minor dims tile-aligned).  ``nodes8_f`` is
    LANE-DENSE: 16 nodes share one (8,128) tile (node n's child boxes at
    rows (n//16)*8..+8, lanes 8*(n%16)..+8); the kernel extracts a node
    with a dynamic lane rotate (see accel/paged.py).
    """

    bbox: jnp.ndarray     # [Pg, 8] float32 — page lo.xyz, hi.xyz, pad
    nodes8_f: jnp.ndarray  # [Pg, Npp8*8, 128] float32 (boxes in cols 0:8)
    nodes8_i: jnp.ndarray  # [Pg, Npp8, 128] int32 (records in cols 0:17)
    tri_pack: jnp.ndarray  # [Pg, Rp8, 128] float32 (rows in cols 0:16)


class MeshData(NamedTuple):
    """Flattened SBVH + leaf-ordered triangle streams (see accel/mesh.py).

    Node encoding (``nodes_i[n] = (c0, n0, c1, n1)``): count 0 -> child is
    inner node ``c``; count > 0 -> leaf of ``n`` tri slots starting at ``c``;
    count < 0 -> empty child (its AABB is inverted so slab tests miss).
    Triangle slots are duplicated per leaf (spatial splits), stored in
    Möller–Trumbore (v0, e1, e2) form with per-corner attributes.
    """

    nodes_f: jnp.ndarray   # [M,12] float32 — child AABBs (lo0,hi0,lo1,hi1)
    nodes_i: jnp.ndarray   # [M,4]  int32   — (ref,count) per child
    tri_v0: jnp.ndarray    # [T,3] float32
    tri_e1: jnp.ndarray    # [T,3]
    tri_e2: jnp.ndarray    # [T,3]
    tri_n: jnp.ndarray     # [T,3,3] per-corner normals
    tri_t: jnp.ndarray     # [T,3,3] per-corner tangents
    tri_uv: jnp.ndarray    # [T,3,2] per-corner uvs
    tri_count: jnp.ndarray # [] int32 — valid slots (rest is padding)
    paged: Optional[PagedNodes] = None  # set for VMEM-exceeding meshes
    # 8-wide collapse of the same tree (accel/wide.py), used by the Pallas
    # packet kernel to amortize block-vote round trips over 8 children.
    # TWO layouts, chosen per mesh by VMEM footprint (pack_from_bvh) and
    # dispatched statically on the lane width: sparse [N*8,8] (fast direct
    # loads, 16x lane padding) or LANE-DENSE [ceil(N/16)*8,128] (16 nodes
    # per tile, dynamic lane rotate, zero padding — 8x mesh ceiling).
    nodes8_f: Optional[jnp.ndarray] = None   # [N*8,8] or lane-dense [.,128]
    nodes8_i: Optional[jnp.ndarray] = None   # [N,16] 8 x (ref,count)
    nodes8_ax: Optional[jnp.ndarray] = None  # [N,1] build-time sort axis
    # Leaf blocks (v0,e1,e2,orig slot,uv corners) for the vector leaf
    # phase: sparse [T8,16] or lane-dense [ceil(T8/64)*8,128] (8 blocks
    # per tile, lane_dense_pack16); nodes8_i leaf refs index the sparse
    # row space either way (dense block = ref//8), nodes_i the contiguous
    # arrays.  The aux pack carries tangent corners (MERL).
    tri_pack: Optional[jnp.ndarray] = None       # see layout note above
    tri_aux_pack: Optional[jnp.ndarray] = None   # 〃
    # Per-corner NORMALS pack (win-time smooth-normal capture for
    # normal-mapped scenes); loaded into VMEM only when requested.
    tri_nrm_pack: Optional[jnp.ndarray] = None   # 〃


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
    """Derive the ``has_*`` static flags from which assets are present, and
    resolve the "auto" traversal backend from where the mesh actually lives
    (Pallas packet kernel for TPU-resident meshes that fit VMEM)."""
    traversal = settings.traversal
    if traversal == "auto":
        traversal = "xla"
        if scene.mesh is not None:
            from vrenderer_pathtracer_tpu.accel.pallas_traverse import fits_vmem

            try:
                platforms = {d.platform for d in scene.mesh.tri_v0.devices()}
            except (AttributeError, TypeError):  # tracer / numpy input
                platforms = set()
            on_tpu = platforms == {"tpu"}
            if scene.mesh.paged is not None:
                # Paged meshes have no single-level nodes: the paged kernel
                # is the only traversal (interpreted off-TPU).
                traversal = "pallas_paged" if on_tpu else "pallas_paged_interpret"
            elif on_tpu and fits_vmem(scene.mesh):
                traversal = "pallas"
    radiance_kernel = settings.radiance_kernel
    if radiance_kernel == "auto":
        radiance_kernel = "xla"
        try:
            platforms = {d.platform for d in scene.spheres.pos.devices()}
        except (AttributeError, TypeError):
            platforms = set()
        if platforms == {"tpu"}:
            from vrenderer_pathtracer_tpu.render import pallas_mesh
            from vrenderer_pathtracer_tpu.render.pallas_radiance import supports

            probe = settings.replace(
                has_mesh=scene.mesh is not None,
                has_hdr=scene.hdr is not None,
                has_brdf=scene.brdf is not None,
                has_diffuse_map=scene.diffuse_map is not None,
                has_normal_map=scene.normal_map is not None,
                has_specular_map=scene.specular_map is not None,
                traversal=traversal,
            )
            if supports(scene, probe):
                # Analytic-Cornell megakernel: narrowest scope, has the
                # hand-derived backward twin (pallas_grad).
                radiance_kernel = "pallas"
            elif pallas_mesh.supports(scene, probe):
                # General-scene fused kernel with deferred asset fetches.
                radiance_kernel = "pallas_mesh"
    # Compact bounce waves on TPU-resident PAGED mesh scenes (round 5):
    # the XLA-wavefront chain gathers hit lanes after the primary
    # traversal and runs shading + the bounce tail at 1/8 width, with an
    # exact full-width fallback (render/integrator.py) — measured 2.0x at
    # config-5 spec (832 -> 414 ms/pass).  Single-level scenes are NOT
    # auto-enabled: the nm bench scene measured a 164 -> 205 ms LOSS
    # (the cond ladder's operand copies + nonzero outweigh the thin
    # savings when the primary hit rate is high); the knob stays
    # available per-settings.  The TPU gate also keeps interpret-mode CPU
    # tests single-width; dedicated tests opt in.
    compact = settings.compact_waves or (
        scene.mesh is not None and traversal == "pallas_paged")
    return settings.replace(
        radiance_kernel=radiance_kernel,
        compact_waves=compact,
        has_diffuse_map=scene.diffuse_map is not None,
        has_normal_map=scene.normal_map is not None,
        has_specular_map=scene.specular_map is not None,
        has_brdf=scene.brdf is not None,
        has_mesh=scene.mesh is not None,
        has_hdr=scene.hdr is not None,
        traversal=traversal,
    )
