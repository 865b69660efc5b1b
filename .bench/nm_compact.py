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
cams = [Camera.default()._replace(origin=jnp.asarray([1e-4*i, 0.0, 40.0], jnp.float32)) for i in range(11)]

def run_variant(settings, label):
    @jax.jit
    def run(cam, frame):
        ro, rd = generate_rays(cam, settings.width, settings.height)
        ids = pixel_ids(settings.width, settings.height)
        return render_pass(scene, settings, ro, rd, ids, jnp.uint32(frame),
                           jnp.float32(0.1), jnp.float32(3.0))
    jax.block_until_ready(run(cams[-1], 1))
    t0 = time.perf_counter()
    outs = [run(cams[i], 2+i) for i in range(10)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter()-t0)/10
    print(f"{label}: {dt*1e3:.1f} ms  ({settings.n_pixels*2*4/dt/1e6:.1f} Mrays/s)", flush=True)

for frac, lab in [(None, "no-compact (round-4 baseline)"),
                  (0.125, "ladder cap=1/8"),
                  (0.25, "ladder cap=1/4"),
                  (0.375, "ladder cap=3/8")]:
    s = (base.replace(compact_waves=False) if frac is None
         else base.replace(compact_capacity_frac=frac))
    run_variant(s, lab)
