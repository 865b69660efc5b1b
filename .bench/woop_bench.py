"""Woop vs Möller–Trumbore leaf test, device time (VERDICT r3 #4).

Same 28.5k-tri bench mesh and ray regimes as trav_dev.py; the Woop pack
replaces tri_pack in place (13 lanes used of 16 — uv dropped, per the
STATUS sizing note).
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/.bench")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from devtime import measure  # noqa: E402
from tests.test_mesh_render import write_uv_sphere  # noqa: E402
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh  # noqa: E402
from vrenderer_pathtracer_tpu.accel.pallas_traverse import (  # noqa: E402
    traverse_packets)
from vrenderer_pathtracer_tpu.accel.wide import (  # noqa: E402
    lane_dense_pack16, lane_undense_pack16, woop_pack_from_mt)
from vrenderer_pathtracer_tpu.core.camera import (  # noqa: E402
    Camera, generate_rays)
from vrenderer_pathtracer_tpu.native import load_obj  # noqa: E402

B = 512 * 1024


def coherent_inputs(n_it):
    rays = []
    for i in range(n_it + 1):
        cam = Camera.default()._replace(
            origin=jnp.asarray([1e-4 * i, 0.0, 28.0], jnp.float32))
        rays.append(generate_rays(cam, 1024, B // 1024))
    return rays


def shuffled_inputs(n_it):
    out = []
    for i in range(n_it + 1):
        rng = np.random.default_rng(i)
        o = rng.uniform(-20, 20, (B, 3)).astype(np.float32)
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        out.append((jnp.asarray(o), jnp.asarray(d)))
    return out


def main():
    p = os.path.join(tempfile.mkdtemp(), "s.obj")
    write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
    mesh = pack_mesh(load_obj(p))
    pack = np.asarray(mesh.tri_pack)
    if pack.shape[-1] == 128:
        woop = lane_dense_pack16(woop_pack_from_mt(lane_undense_pack16(pack)))
    else:
        woop = woop_pack_from_mt(pack)
    mesh_w = mesh._replace(tri_pack=jnp.asarray(woop))
    tmax = jnp.full((B,), 1e6, jnp.float32)

    for name, m, lt in [("mt", mesh, "mt"), ("woop", mesh_w, "woop")]:
        us_c = measure(
            lambda o, d, m=m, lt=lt: traverse_packets(
                m, o, d, tmax, image_shape=(B // 1024, 1024), leaf_test=lt),
            coherent_inputs(5), "traverse_wide")
        us_s = measure(
            lambda o, d, m=m, lt=lt: traverse_packets(m, o, d, tmax,
                                                      leaf_test=lt),
            shuffled_inputs(3), "traverse_wide")
        print(json.dumps({"leaf_test": name,
                          "coherent_mrays": round(B / us_c, 1),
                          "shuffled_mrays": round(B / us_s, 2),
                          "coherent_dev_ms": round(us_c / 1e3, 3),
                          "shuffled_dev_ms": round(us_s / 1e3, 3)}))


main()
