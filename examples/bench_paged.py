"""Paged-kernel microbenchmarks: coherent / shuffled / sorted-shuffled rays.

Measures the three coherence regimes of the paged traversal on a ~180k-tri
mesh (the same mesh bench.py's tertiary metric uses), so format changes
(dense boxes/records/pack) and the ray-sorting path can be compared on real
hardware.  Follows the measurement discipline in docs/PERF.md: varied
inputs per iteration, one block_until_ready over the batch.

    python examples/bench_paged.py [--tris-theta 300] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris-theta", type=int, default=300)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rays", type=int, default=512 * 1024)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (tiny shapes recommended)")
    args = ap.parse_args()

    from tests.test_mesh_render import write_uv_sphere
    from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
    from vrenderer_pathtracer_tpu.accel.pallas_paged import traverse_paged
    from vrenderer_pathtracer_tpu.accel.sorting import sorted_traverse
    from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays
    from vrenderer_pathtracer_tpu.native import load_obj

    p = os.path.join(tempfile.mkdtemp(), "bench_sphere.obj")
    write_uv_sphere(p, radius=12.0, n_theta=args.tris_theta,
                    n_phi=args.tris_theta)
    mesh = pack_mesh(load_obj(p), paged=True)
    pg = mesh.paged
    payload = (pg.nodes8_f.shape[1] + pg.nodes8_i.shape[1]
               + pg.tri_pack.shape[1]) * 128 * 4
    n_tris = int(mesh.tri_count)
    b = args.rays
    w, h = 1024, b // 1024
    tmax = jnp.full((b,), 1e6, jnp.float32)

    # Varied inputs per iteration (identical repeats report fake numbers
    # through the relay — docs/PERF.md).
    coh = []
    for i in range(args.iters + 1):
        cam = Camera.default()._replace(
            origin=jnp.asarray([1e-4 * i, 0.0, 28.0], jnp.float32))
        coh.append(generate_rays(cam, w, h))
    rng = np.random.default_rng(0)
    shuf = []
    for i in range(args.iters + 1):
        o = rng.uniform(-14, 14, (b, 3)).astype(np.float32)
        d = rng.standard_normal((b, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        shuf.append((jnp.asarray(o), jnp.asarray(d)))

    search = functools.partial(traverse_paged, interpret=args.interpret)
    sorted_search = jax.jit(functools.partial(sorted_traverse, search))

    def run(name, fn, rays, image_shape=None):
        kw = {"image_shape": image_shape} if image_shape else {}
        out = fn(mesh, rays[0][0], rays[0][1], tmax, **kw)
        jax.block_until_ready(out)
        outs = []
        t0 = time.perf_counter()
        for i in range(1, args.iters + 1):
            outs.append(fn(mesh, rays[i][0], rays[i][1], tmax, **kw))
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters
        hitrate = float(jnp.mean((outs[-1][0] >= 0).astype(jnp.float32)))
        mrays = b / dt / 1e6
        print(json.dumps({"case": name, "mrays_per_s": round(mrays, 2),
                          "ms": round(dt * 1e3, 2),
                          "hitrate": round(hitrate, 3)}))
        return mrays

    print(json.dumps({"tris": n_tris, "pages": int(pg.bbox.shape[0]),
                      "page_payload_MB": round(payload / 1e6, 3),
                      "platform": jax.devices()[0].platform}))
    run("coherent_tiled", search, coh, image_shape=(h, w))
    run("shuffled", search, shuf)
    run("shuffled_sorted", sorted_search, shuf)


if __name__ == "__main__":
    main()
