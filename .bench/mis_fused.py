"""MERL lobe-MIS x fused kernel composition (round 5, VERDICT r4 #7)."""
import os, sys, time, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays, pixel_ids
from vrenderer_pathtracer_tpu.native import load_obj
from vrenderer_pathtracer_tpu.ops.brdf import TABLE_SIZE
from vrenderer_pathtracer_tpu.render.integrator import render_pass
from vrenderer_pathtracer_tpu.render.pallas_mesh import render_pass_mesh_pallas, supports
from vrenderer_pathtracer_tpu.scene.scene import Scene
from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set

p = os.path.join(tempfile.mkdtemp(), "s.obj")
write_uv_sphere(p, radius=12.0, n_theta=90, n_phi=90)
mesh = pack_mesh(load_obj(p))
rng = np.random.default_rng(0)
hdr = jnp.asarray(rng.uniform(0, 1.5, (64, 128, 3)).astype(np.float32))
th = np.linspace(0, 1, 90) ** 0.5
lobe = np.exp(-th * 12.0)[None, :, None, None] * np.ones((3, 90, 90, 180))
table = jnp.asarray((3000.0 * lobe).reshape(3, TABLE_SIZE).astype(np.float32))
settings = RenderSettings(
    width=1024, height=1024, samples_per_pass=2, bounces=4,
    use_cornell_box=False, has_hdr=True, has_mesh=True,
    use_brdf=True, has_brdf=True, brdf_importance_sampling=True)
scene = Scene(spheres=build_sphere_set(False), mesh=mesh, hdr=hdr, brdf=table)
assert supports(scene, settings)
cams = [Camera.default()._replace(origin=jnp.asarray([1e-4*i, 0.0, 40.0], jnp.float32)) for i in range(11)]

sys.path.insert(0, "/root/repo/.bench")
from devtime import measure

def timeit(fn, label):
    us = measure(lambda c, f: fn(c, f),
                 [(cams[i], i + 1) for i in range(8)], "")
    dt = us / 1e6
    print(f"{label}: {dt*1e3:.1f} ms device "
          f"({settings.n_pixels*2*4/dt/1e6:.1f} Mrays/s)", flush=True)

def fused(cam, f):
    return render_pass_mesh_pallas(scene, settings, cam, jnp.uint32(f),
                                   jnp.float32(0.1), jnp.float32(3.0))

@jax.jit
def wave(cam, f):
    ro, rd = generate_rays(cam, 1024, 1024)
    ids = pixel_ids(1024, 1024)
    return render_pass(scene, settings.replace(radiance_kernel="xla",
                                               traversal="pallas"),
                       ro, rd, ids, jnp.uint32(f), jnp.float32(0.1),
                       jnp.float32(3.0))

timeit(fused, "fused kernel + in-kernel MIS")
timeit(wave, "XLA wavefront + MIS (old fallback)")
