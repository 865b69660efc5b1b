"""In-jit device-side loop traversal bench (immune to relay artifacts).

Runs N traversals inside ONE jitted program with varied inputs (per-iter
origin jitter derived in-device), reducing outputs so nothing is dead-code
eliminated.  One block_until_ready per timing.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")

import tempfile

from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays
from vrenderer_pathtracer_tpu.native import load_obj

N_IN_JIT = 10


def device_loop(traverse_fn, mesh, o, d, tmax, image_shape):
    """Sum of slot+t over N_IN_JIT traversals with varied origins."""

    @jax.jit
    def run(o, d, tmax):
        def body(i, acc):
            oo = o + 1e-4 * (i + 1).astype(jnp.float32)
            slot, t = traverse_fn(mesh, oo, d, tmax, image_shape=image_shape)
            return acc + jnp.sum(t) + jnp.sum(slot).astype(jnp.float32)

        return lax.fori_loop(0, N_IN_JIT, body, jnp.float32(0))

    return run


def main(which):
    p = os.path.join(tempfile.mkdtemp(), "s.obj")
    if which == "packet":
        from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
            traverse_packets as fn)
        write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
        mesh = pack_mesh(load_obj(p))
    else:
        from vrenderer_pathtracer_tpu.accel.pallas_paged import (
            traverse_paged as fn)
        write_uv_sphere(p, radius=12.0, n_theta=300, n_phi=300)
        mesh = pack_mesh(load_obj(p), paged=True)

    cam = Camera.default()._replace(
        origin=jnp.asarray([0.0, 0.0, 28.0], jnp.float32))
    o, d = generate_rays(cam, 1024, 512)
    b = o.shape[0]
    tmax = jnp.full((b,), 1e6, jnp.float32)

    run = device_loop(fn, mesh, o, d, tmax, (512, 1024))
    v = run(o, d, tmax)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    v = run(o + 1e-3, d, tmax)
    jax.block_until_ready(v)
    dt = (time.perf_counter() - t0) / N_IN_JIT
    print(json.dumps({"metric": f"{which}_coherent_injit",
                      "mrays": round(b / dt / 1e6, 1),
                      "ms": round(dt * 1e3, 2)}))

    # Shuffled regime, same in-jit loop.
    rng = np.random.default_rng(0)
    so = jnp.asarray(rng.uniform(-20, 20, (b, 3)).astype(np.float32))
    sd = rng.normal(size=(b, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sd = jnp.asarray(sd)
    run = device_loop(fn, mesh, so, sd, tmax, None)
    v = run(so, sd, tmax)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    v = run(so + 1e-3, sd, tmax)
    jax.block_until_ready(v)
    dt = (time.perf_counter() - t0) / N_IN_JIT
    print(json.dumps({"metric": f"{which}_shuffled_injit",
                      "mrays": round(b / dt / 1e6, 2),
                      "ms": round(dt * 1e3, 2)}))


if __name__ == "__main__":
    for w in (sys.argv[1:] or ["packet", "paged"]):
        main(w)
