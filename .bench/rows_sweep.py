"""Block-size (sublane rows) sweep for the packet + paged traversal kernels.

    python .bench/rows_sweep.py [packet|paged|both]

Measures device time (profiler events) for coherent and shuffled 512k-ray
batches at block_rows in {8, 16, 32, 64}.  Motivation (docs/PERF.md round
3): shuffled waves are vote-saturated — visits/block caps at the reachable
tree regardless of ray count — so bigger blocks amortize the per-visit
scalar chain over more rays.
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
from trav_dev import coherent_inputs, shuffled_inputs

from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.native import load_obj

VERBOSE = "--verbose" in sys.argv
ROWS = (8, 16, 32, 64)
B = 512 * 1024


def report(name, rows, us):
    print(json.dumps({"metric": name, "rows": rows,
                      "mrays": round(B / us, 2),
                      "dev_ms": round(us / 1e3, 3)}), flush=True)


def bench(kind):
    if kind == "packet":
        from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
            traverse_packets as trav)
        n_theta, match, paged = 120, "traverse_", False
    else:
        from vrenderer_pathtracer_tpu.accel.pallas_paged import (
            traverse_paged as trav)
        n_theta, match, paged = 300, "traverse_paged", True
    p = os.path.join(tempfile.mkdtemp(), "s.obj")
    write_uv_sphere(p, radius=12.0, n_theta=n_theta, n_phi=n_theta)
    mesh = pack_mesh(load_obj(p), paged=paged)
    tmax = jnp.full((B,), 1e6, jnp.float32)
    coh = coherent_inputs(5)
    shf = shuffled_inputs(3)
    for rows in ROWS:
        us = measure(lambda o, d: trav(mesh, o, d, tmax,
                                       image_shape=(512, 1024),
                                       block_rows=rows),
                     coh, match, verbose=VERBOSE)
        report(f"{kind}_coherent", rows, us)
        us = measure(lambda o, d: trav(mesh, o, d, tmax, block_rows=rows),
                     shf, match, verbose=VERBOSE)
        report(f"{kind}_shuffled", rows, us)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "both"
    if which in ("packet", "both"):
        bench("packet")
    if which in ("paged", "both"):
        bench("paged")
