"""Device-time traversal bench: packet + paged, coherent + shuffled.

    python .bench/trav_dev.py [packet|paged|both] [--verbose]
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
sys.path.insert(0, "/root/repo/.bench")

from devtime import measure

from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays
from vrenderer_pathtracer_tpu.native import load_obj

VERBOSE = "--verbose" in sys.argv


def coherent_inputs(n_it, b=512 * 1024):
    rays = []
    for i in range(n_it + 1):
        cam = Camera.default()._replace(
            origin=jnp.asarray([1e-4 * i, 0.0, 28.0], jnp.float32))
        rays.append(generate_rays(cam, 1024, b // 1024))
    return rays


def shuffled_inputs(n_it, b=512 * 1024):
    out = []
    for i in range(n_it + 1):
        rng = np.random.default_rng(i)
        o = rng.uniform(-20, 20, (b, 3)).astype(np.float32)
        d = rng.normal(size=(b, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        out.append((jnp.asarray(o), jnp.asarray(d)))
    return out


def report(name, us, b):
    print(json.dumps({"metric": name, "mrays": round(b / us, 1),
                      "dev_ms": round(us / 1e3, 3)}))


def bench_packet():
    from vrenderer_pathtracer_tpu.accel.pallas_traverse import traverse_packets

    p = os.path.join(tempfile.mkdtemp(), "s.obj")
    write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
    mesh = pack_mesh(load_obj(p))
    b = 512 * 1024
    tmax = jnp.full((b,), 1e6, jnp.float32)
    us = measure(lambda o, d: traverse_packets(mesh, o, d, tmax,
                                               image_shape=(512, 1024)),
                 coherent_inputs(5), "traverse_", verbose=VERBOSE)
    report("packet_coherent_dev", us, b)
    us = measure(lambda o, d: traverse_packets(mesh, o, d, tmax),
                 shuffled_inputs(3), "traverse_", verbose=VERBOSE)
    report("packet_shuffled_dev", us, b)


def bench_paged():
    from vrenderer_pathtracer_tpu.accel.pallas_paged import traverse_paged

    p = os.path.join(tempfile.mkdtemp(), "sb.obj")
    write_uv_sphere(p, radius=12.0, n_theta=300, n_phi=300)
    mesh = pack_mesh(load_obj(p), paged=True)
    b = 512 * 1024
    tmax = jnp.full((b,), 1e6, jnp.float32)
    us = measure(lambda o, d: traverse_paged(mesh, o, d, tmax,
                                             image_shape=(512, 1024)),
                 coherent_inputs(5), "traverse_paged", verbose=VERBOSE)
    report("paged_coherent_dev", us, b)
    us = measure(lambda o, d: traverse_paged(mesh, o, d, tmax),
                 shuffled_inputs(3), "traverse_paged", verbose=VERBOSE)
    report("paged_shuffled_dev", us, b)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "both"
    if which in ("packet", "both"):
        bench_packet()
    if which in ("paged", "both"):
        bench_paged()
