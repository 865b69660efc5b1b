"""Greedy vs SAH-DP 8-wide collapse: visit counts + device time (round 5).

Usage: VPT_WIDE_COLLAPSE=greedy|sah python .bench/sah_collapse.py [--counts]
"""
import os, sys, time, tempfile
if "--counts" in sys.argv:
    os.environ["VPT_TRAV_EXP"] = "count"
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/.bench")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from devtime import measure
from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.accel.pallas_traverse import traverse_packets, _tile_remap
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays
from vrenderer_pathtracer_tpu.native import load_obj

mode = os.environ.get("VPT_WIDE_COLLAPSE", "greedy")
p = os.path.join(tempfile.mkdtemp(), "s.obj")
write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
t0 = time.perf_counter()
mesh = pack_mesh(load_obj(p))
print(f"{mode}: wide nodes {mesh.nodes8_i.shape[0]}, "
      f"pack rows {mesh.tri_pack.shape[0]}, collapse+pack {time.perf_counter()-t0:.1f}s",
      flush=True)

b = 512 * 1024
tmax = jnp.full((b,), 1e6, jnp.float32)
waves = []
for i in range(4):
    cam = Camera.default()._replace(origin=jnp.asarray([1e-4*i, 0.0, 28.0], jnp.float32))
    o, d = generate_rays(cam, 1024, 512)
    waves.append((_tile_remap(o, 512, 1024), _tile_remap(d, 512, 1024)))
rng = np.random.default_rng(0)
so = jnp.asarray(rng.uniform(-20, 20, (b, 3)).astype(np.float32))
sd = rng.normal(size=(b, 3)).astype(np.float32)
sd /= np.linalg.norm(sd, axis=1, keepdims=True)
shuf = [(so + 1e-5*i, jnp.asarray(sd)) for i in range(4)]

if "--counts" in sys.argv:
    for name, (o, d) in (("coherent", waves[0]), ("shuffled", shuf[0])):
        slot, _ = traverse_packets(mesh, o, d, tmax)
        c = np.asarray(slot).reshape(-1, 8, 128)[:, 0, 0]
        print(f"{mode} {name} visits: sum {c.sum()} mean/blk {c.mean():.1f}",
              flush=True)
else:
    us_c = measure(lambda o, d: traverse_packets(mesh, o, d, tmax), waves,
                   "traverse_wide")
    us_s = measure(lambda o, d: traverse_packets(mesh, o, d, tmax), shuf,
                   "traverse_wide")
    print(f"{mode}: coherent {us_c/1e3:.2f} ms ({b/us_c:.1f} Mrays/s); "
          f"shuffled {us_s/1e3:.2f} ms ({b/us_s:.2f} Mrays/s)", flush=True)
