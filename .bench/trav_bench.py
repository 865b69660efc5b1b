"""Traversal microbench: packet (28.5k) + paged (180k) kernels, all regimes.

One TPU job; prints one JSON line per metric.  Usage:
    python .bench/trav_bench.py [packet|paged|both]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")

import tempfile

from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays
from vrenderer_pathtracer_tpu.native import load_obj


def time_runs(run, inputs):
    out = run(*inputs[-1])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [run(*i) for i in inputs[:-1]]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (len(inputs) - 1)


def shuffled_rays(n, seed):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def bench_packet():
    from vrenderer_pathtracer_tpu.accel.pallas_traverse import traverse_packets

    p = os.path.join(tempfile.mkdtemp(), "s.obj")
    write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
    mesh = pack_mesh(load_obj(p))
    n_it = 20
    rays = []
    for i in range(n_it + 1):
        cam = Camera.default()._replace(
            origin=jnp.asarray([1e-4 * i, 0.0, 28.0], jnp.float32))
        rays.append(generate_rays(cam, 1024, 512))
    b = rays[0][0].shape[0]
    tmax = jnp.full((b,), 1e6, jnp.float32)

    def run(o, d):
        return traverse_packets(mesh, o, d, tmax, image_shape=(512, 1024))

    dt = time_runs(run, rays)
    print(json.dumps({"metric": "packet_driver_view", "mrays": round(b / dt / 1e6, 1),
                      "ms": round(dt * 1e3, 2)}))

    sh = [shuffled_rays(b, i) for i in range(6)]

    def run_sh(o, d):
        return traverse_packets(mesh, o, d, tmax)

    dt = time_runs(run_sh, sh)
    print(json.dumps({"metric": "packet_shuffled", "mrays": round(b / dt / 1e6, 2),
                      "ms": round(dt * 1e3, 2)}))


def bench_paged():
    from vrenderer_pathtracer_tpu.accel.pallas_paged import traverse_paged

    p = os.path.join(tempfile.mkdtemp(), "sb.obj")
    write_uv_sphere(p, radius=12.0, n_theta=300, n_phi=300)
    mesh = pack_mesh(load_obj(p), paged=True)
    n_it = 10
    rays = []
    for i in range(n_it + 1):
        cam = Camera.default()._replace(
            origin=jnp.asarray([1e-4 * i, 0.0, 28.0], jnp.float32))
        rays.append(generate_rays(cam, 1024, 512))
    b = rays[0][0].shape[0]
    tmax = jnp.full((b,), 1e6, jnp.float32)

    def run(o, d):
        return traverse_paged(mesh, o, d, tmax, image_shape=(512, 1024))

    dt = time_runs(run, rays)
    print(json.dumps({"metric": "paged_coherent", "mrays": round(b / dt / 1e6, 1),
                      "ms": round(dt * 1e3, 2),
                      "pages": int(mesh.paged.nodes8_f.shape[0])}))

    sh = [shuffled_rays(b, i) for i in range(4)]

    def run_sh(o, d):
        return traverse_paged(mesh, o, d, tmax)

    dt = time_runs(run_sh, sh)
    print(json.dumps({"metric": "paged_shuffled", "mrays": round(b / dt / 1e6, 2),
                      "ms": round(dt * 1e3, 2)}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("packet", "both"):
        bench_packet()
    if which in ("paged", "both"):
        bench_paged()
