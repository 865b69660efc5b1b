"""Probe the dense single-level kernel's real VMEM ceiling (VERDICT r3 #6).

Builds UV spheres at increasing triangle counts, forces single-level
packing (dense layout auto-selects), and measures coherent + shuffled
traversal.  Compares against the paged kernel on the same mesh.

    python .bench/dense_ceiling.py [ntheta ...]
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
    traverse_packets, wide_vmem_bytes)
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
    sizes = [int(a) for a in sys.argv[1:]] or [340, 420, 470, 520]
    tmax = jnp.full((B,), 1e6, jnp.float32)
    for nt in sizes:
        p = os.path.join(tempfile.mkdtemp(), f"s{nt}.obj")
        write_uv_sphere(p, radius=12.0, n_theta=nt, n_phi=nt)
        host = load_obj(p)
        try:
            mesh = pack_mesh(host, paged=False)
        except Exception as e:
            print(json.dumps({"ntheta": nt, "error": f"pack: {e}"}))
            continue
        tris = int(mesh.tri_count)
        phys = wide_vmem_bytes(mesh) / 1e6
        layout = "dense" if mesh.nodes8_f.shape[-1] == 128 else "sparse"
        try:
            us_c = measure(
                lambda o, d: traverse_packets(mesh, o, d, tmax,
                                              image_shape=(B // 1024, 1024)),
                coherent_inputs(5), "traverse_wide")
            us_s = measure(
                lambda o, d: traverse_packets(mesh, o, d, tmax),
                shuffled_inputs(3), "traverse_wide")
            print(json.dumps({
                "ntheta": nt, "tris": tris, "layout": layout,
                "vmem_mb": round(phys, 1),
                "coherent_mrays": round(B / us_c, 1),
                "shuffled_mrays": round(B / us_s, 2)}))
        except Exception as e:
            print(json.dumps({"ntheta": nt, "tris": tris, "layout": layout,
                              "vmem_mb": round(phys, 1),
                              "error": str(e)[:300]}))


main()
