import os, sys, time, tempfile
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/.bench")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from devtime import measure
from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays, pixel_ids
from vrenderer_pathtracer_tpu.native import load_obj
from vrenderer_pathtracer_tpu.render.integrator import render_pass
from vrenderer_pathtracer_tpu.scene.scene import Scene, settings_for_scene
from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set

p = os.path.join(tempfile.mkdtemp(), "bench_sphere_nm.obj")
write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
mesh = pack_mesh(load_obj(p))
rng = np.random.default_rng(0)
hdr = jnp.asarray(rng.uniform(0, 1.5, (64, 128, 3)).astype(np.float32))
tex = jnp.asarray(rng.uniform(0.1, 1, (256, 256, 3)).astype(np.float32))
nmap = jnp.asarray((rng.uniform(0, 1, (256, 256, 3)) * 0.2 + (0.4, 0.4, 0.8)).astype(np.float32))
smap = jnp.asarray(rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))
scene = Scene(spheres=build_sphere_set(False), mesh=mesh, hdr=hdr,
              diffuse_map=tex, normal_map=nmap, specular_map=smap)
base = settings_for_scene(scene, RenderSettings(
    width=1024, height=1024, samples_per_pass=2, bounces=4,
    use_cornell_box=False)).replace(radiance_kernel="xla")
frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
settings = (base.replace(compact_waves=False) if frac == 0
            else base.replace(compact_capacity_frac=frac))
cams = [Camera.default()._replace(origin=jnp.asarray([1e-4*i, 0.0, 40.0], jnp.float32)) for i in range(7)]

@jax.jit
def run(cam, frame):
    ro, rd = generate_rays(cam, settings.width, settings.height)
    ids = pixel_ids(settings.width, settings.height)
    return render_pass(scene, settings, ro, rd, ids, jnp.uint32(frame),
                       jnp.float32(0.1), jnp.float32(3.0))

us = measure(lambda c, f: run(c, f),
             [(cams[i], jnp.uint32(i+1)) for i in range(7)], "", verbose=True)
print(f"frac={frac}: total device {us/1e3:.1f} ms/pass")
