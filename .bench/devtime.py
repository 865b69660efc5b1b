"""Profiler-based device timing: immune to relay/async-dispatch artifacts.

``measure(fn, inputs, match)`` runs fn over varied inputs under one
jax.profiler trace and returns total device µs of events whose name contains
``match``, divided by len(inputs).
"""
import collections
import glob
import gzip
import json
import tempfile

import jax


def device_events(trace_dir):
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    agg = collections.defaultdict(lambda: [0, 0.0])
    for e in tr["traceEvents"]:
        if e.get("ph") == "X":
            agg[e["name"]][0] += 1
            agg[e["name"]][1] += e.get("dur", 0)
    return agg


def measure(fn, inputs, match, verbose=False):
    from vrenderer_pathtracer_tpu.utils.profiling import profiler_trace

    out = fn(*inputs[-1])
    jax.block_until_ready(out)
    d = tempfile.mkdtemp()
    outs = []
    with profiler_trace(d):
        for i in inputs[:-1]:
            outs.append(fn(*i))
        jax.block_until_ready(outs)
    agg = device_events(d)
    if verbose:
        for name, (n, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:12]:
            print(f"  {dur/1e3:10.3f} ms x{n:4d}  {name[:80]}")
    tot = sum(dur for name, (n, dur) in agg.items()
              if match in name and not name.startswith(("jit_", "Pjit", "$")))
    return tot / (len(inputs) - 1)  # µs per call
