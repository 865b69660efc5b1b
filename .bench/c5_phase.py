"""Config-5 pass device-time breakdown (round 5).

Runs the config-5 pipeline at spec shape (1920x1080, 2 spp/pass, 4 bounces,
~500k-tri paged mesh, HDRI+MERL+FXAA) for a few passes under jax.profiler
and prints every device event's total time — the ground truth for what the
0.79 s/pass is actually bound by, per kernel instance (the 4 traverse_paged
calls per pass show up individually in the instance list).

Usage: python .bench/c5_phase.py [--small]
"""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from examples.config5 import synth_assets
from vrenderer_pathtracer_tpu import Renderer, RenderSettings

small = "--small" in sys.argv
w, h = (960, 540) if small else (1920, 1080)

tmp = tempfile.mkdtemp()
obj, hdr, brdf = synth_assets(tmp)
r = Renderer(w, h, settings=RenderSettings(
    samples_per_pass=2, bounces=4, use_fxaa=True, use_brdf=True,
    remat_bounces=True))
t0 = time.perf_counter()
r.load_hdr(hdr)
r.load_brdf(brdf)
r.load_mesh(obj)
print(f"assets {time.perf_counter()-t0:.1f}s traversal={r.settings.traversal}",
      flush=True)

t0 = time.perf_counter()
r.render()
jax.block_until_ready(r._accum)
print(f"first pass (compile) {time.perf_counter()-t0:.1f}s", flush=True)
# Second warm pass: the renderer's measured compact-mode switch recompiles
# the step after pass 1; keep that out of the timed window.
t0 = time.perf_counter()
r.render()
jax.block_until_ready(r._accum)
print(f"second pass ({r.settings.compact_mode}) "
      f"{time.perf_counter()-t0:.1f}s", flush=True)

n_pass = 3
d = tempfile.mkdtemp()
with jax.profiler.trace(d):
    t0 = time.perf_counter()
    for _ in range(n_pass):
        r.render()
    jax.block_until_ready(r._accum)
    wall = (time.perf_counter() - t0) / n_pass
print(f"steady-state wall {wall*1e3:.0f} ms/pass", flush=True)

path = sorted(glob.glob(f"{d}/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    tr = json.load(f)
agg = collections.defaultdict(lambda: [0, 0.0])
insts = collections.defaultdict(list)
for e in tr["traceEvents"]:
    if e.get("ph") == "X" and not e["name"].startswith(("$", "jit_", "Pjit")):
        agg[e["name"]][0] += 1
        agg[e["name"]][1] += e.get("dur", 0)
        if "traverse" in e["name"]:
            insts[e["name"]].append(e.get("dur", 0) / 1e3)

tot = sum(v[1] for v in agg.values())
print(f"\ntotal device {tot/1e3/n_pass:.1f} ms/pass; top events (ms/pass):")
for name, (n, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:18]:
    print(f"  {dur/1e3/n_pass:9.2f} x{n//n_pass:3d}  {name[:84]}")
for name, ds in insts.items():
    ds = [round(x, 1) for x in ds]
    print(f"\n{name} instances (ms): {ds}")
