"""Compiled-TPU gradient parity on a >=50k-tri paged scene (VERDICT #9).

Same check as tests/test_paged_grad_parity.py but at scale and compiled:
deferred-table grads (env map + MERL) from the pallas_paged forward vs the
XLA-wavefront forward.  Prints one JSON line with the relative L2 norms.

    python .bench/grad_parity_paged.py [n_theta]
"""
import json
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")

from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays, pixel_ids
from vrenderer_pathtracer_tpu.native import load_obj
from vrenderer_pathtracer_tpu.ops.brdf import TABLE_SIZE
from vrenderer_pathtracer_tpu.render.integrator import render_pass
from vrenderer_pathtracer_tpu.scene.scene import Scene
from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set

n_theta = int(sys.argv[1]) if len(sys.argv) > 1 else 170

p = os.path.join(tempfile.mkdtemp(), "s.obj")
write_uv_sphere(p, radius=12.0, n_theta=n_theta, n_phi=n_theta)
host = load_obj(p)
mesh = pack_mesh(host, paged=True)        # paged leg
mesh_flat = pack_mesh(host)               # XLA-lockstep leg (flat layout)
n_tris = int(host.tri_v0.shape[0]) if hasattr(host, "tri_v0") else -1

rng = np.random.default_rng(7)
hdr = jnp.asarray(rng.uniform(0.2, 1.2, (16, 32, 3)).astype(np.float32))
brdf = jnp.asarray(rng.uniform(0.0, 0.05, (3, TABLE_SIZE)).astype(np.float32))
scene = Scene(spheres=build_sphere_set(False), hdr=hdr, brdf=brdf, mesh=mesh)
scene_flat = scene._replace(mesh=mesh_flat)
cam = Camera.default()._replace(origin=jnp.asarray([0.0, 0.0, 40.0]))
w, h = 256, 128
base = RenderSettings(
    width=w, height=h, samples_per_pass=1, bounces=2, has_mesh=True,
    has_hdr=True, has_brdf=True, use_brdf=True, radiance_kernel="xla",
    remat_bounces=True,
)
ray_o, ray_d = generate_rays(cam, w, h)
ids = pixel_ids(w, h)
target = jnp.zeros((w * h, 3), jnp.float32)


@jax.jit
def grads_xla(scene, hdr, brdf):
    def loss_fn(e, bt):
        s = scene._replace(hdr=e, brdf=bt)
        rgb, _ = render_pass(s, base.replace(traversal="xla"), ray_o, ray_d,
                             ids, jnp.uint32(3), jnp.float32(0.1),
                             jnp.float32(3.0))
        return jnp.mean((rgb - target) ** 2)
    return jax.value_and_grad(loss_fn, argnums=(0, 1))(hdr, brdf)


@jax.jit
def grads_paged(scene, hdr, brdf):
    def loss_fn(e, bt):
        s = scene._replace(hdr=e, brdf=bt)
        rgb, _ = render_pass(s, base.replace(traversal="pallas_paged"),
                             ray_o, ray_d, ids, jnp.uint32(3),
                             jnp.float32(0.1), jnp.float32(3.0))
        return jnp.mean((rgb - target) ** 2)
    return jax.value_and_grad(loss_fn, argnums=(0, 1))(hdr, brdf)


l_x, (gh_x, gb_x) = jax.block_until_ready(grads_xla(scene_flat, hdr, brdf))
l_p, (gh_p, gb_p) = jax.block_until_ready(grads_paged(scene, hdr, brdf))

out = {"n_tris": n_tris, "pages": int(mesh.paged.nodes8_f.shape[0]),
       "loss_xla": float(l_x), "loss_paged": float(l_p)}
for name, g_x, g_p in (("hdr", gh_x, gh_p), ("brdf", gb_x, gb_p)):
    gx, gp = np.asarray(g_x), np.asarray(g_p)
    out[f"rel_l2_{name}"] = float(
        np.linalg.norm(gp - gx) / max(np.linalg.norm(gx), 1e-12))
    out[f"norm_{name}"] = float(np.linalg.norm(gx))
print(json.dumps(out))
