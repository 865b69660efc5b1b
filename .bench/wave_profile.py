"""Config-5 bounce-wave anatomy + page-size sweep (round 5).

Reproduces the exact wave structure of the config-5 pass (default camera at
z=150 over the 500k-tri radius-12 sphere, 1920x1080, 2 spp) and measures,
per bounce wave and per page size:

  - live-lane fraction
  - traverse_paged device ms (profiler events, dispatch-immune)
  - schedule stats: reachable (block, page) pairs, blocks with any page
  - per-ray page reachability (exact slab): mean pages/live ray -> the
    lower bound a per-ray binned page-major scheduler could approach

Usage: python .bench/wave_profile.py [--pages 4096,8192,16384,32768]
       [--counts]   (adds VPT_TRAV_EXP=count visit totals; separate trace)
"""
import os
import sys
import tempfile
import time

if "--counts" in sys.argv:
    os.environ["VPT_TRAV_EXP"] = "count"

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/.bench")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from devtime import measure
from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.accel.paged import pack_mesh_paged
from vrenderer_pathtracer_tpu.accel.pallas_paged import (
    COLS, _page_schedule_c, traverse_paged)
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays
from vrenderer_pathtracer_tpu.native import load_obj
from vrenderer_pathtracer_tpu.accel.pallas_traverse import _tile_remap

W, H = 1920, 1080
B = W * H
arg = next((a.split("=")[1] for a in sys.argv if a.startswith("--pages")),
           "4096,16384,32768")
PAGE_SIZES = [int(x) for x in arg.split(",")]

print("loading mesh...", flush=True)
p = os.path.join(tempfile.mkdtemp(), "mesh.obj")
write_uv_sphere(p, radius=12.0, n_theta=500, n_phi=500)
host = load_obj(p)

cam = Camera.default()
o, d = generate_rays(cam, W, H)
# 1080 % 32 != 0, so the real config-5 pass runs in RASTER order (the
# kernels' tile remap requires 32-divisible dims) — reproduce that.
o_t, d_t = o, d
tmax = jnp.full((B,), 1e6, jnp.float32)


def face_normals(mesh, slot):
    v0 = np.asarray(mesh.tri_v0)
    e1 = np.asarray(mesh.tri_e1)
    e2 = np.asarray(mesh.tri_e2)
    s = np.clip(np.asarray(slot), 0, v0.shape[0] - 1)
    n = np.cross(e1[s], e2[s])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    return n


def cosine_sample(n, seed):
    rng = np.random.default_rng(seed)
    u1 = rng.uniform(size=n.shape[0]).astype(np.float32)
    u2 = rng.uniform(size=n.shape[0]).astype(np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t = np.cross(n, np.where(np.abs(n[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0]))
    t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-20)
    bt = np.cross(n, t)
    local = np.stack([r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - u1)], 1)
    return (local[:, 0:1] * t + local[:, 1:2] * bt
            + local[:, 2:3] * n).astype(np.float32)


def sched_stats(mesh, o_np, d_np, t_np, block_rows=16):
    block = block_rows * COLS
    pad = (-B) % block
    o_c = [jnp.asarray(np.concatenate([o_np[:, k], np.zeros(pad, np.float32)]))
           for k in range(3)]
    d_c = [jnp.asarray(np.concatenate([d_np[:, k], np.ones(pad, np.float32)]))
           for k in range(3)]
    t_p = jnp.asarray(np.concatenate([t_np, np.zeros(pad, np.float32)]))
    nb = (B + pad) // block
    count, _ = _page_schedule_c(mesh.paged, o_c, d_c, t_p, nb, block)
    c = np.asarray(count)
    return int(c.sum()), int((c > 0).sum()), nb


def per_ray_pages(mesh, o_np, d_np, t_np, live):
    """Exact per-ray slab vs page boxes -> pages/live-ray histogram."""
    bbox = np.asarray(mesh.paged.bbox)            # [Pg, 6]
    ol, dl, tl = o_np[live], d_np[live], t_np[live]
    inv = 1.0 / np.where(np.abs(dl) > 1e-12, dl,
                         np.where(dl >= 0, 1e-12, -1e-12))
    cnt = np.zeros(ol.shape[0], np.int64)
    for p0 in range(0, bbox.shape[0], 16):
        bb = bbox[p0:p0 + 16]
        t0 = (bb[None, :, 0:3] - ol[:, None, :]) * inv[:, None, :]
        t1 = (bb[None, :, 3:6] - ol[:, None, :]) * inv[:, None, :]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        hit = (np.maximum(tn, 0.0) <= tf) & (tn <= tl[:, None])
        cnt += hit.sum(axis=1)
    return cnt


for page_tris in PAGE_SIZES:
    t0 = time.perf_counter()
    mesh = pack_mesh_paged(host, page_tris=page_tris)
    n_pages = mesh.paged.nodes8_f.shape[0]
    page_mb = (mesh.paged.nodes8_f[0].nbytes + mesh.paged.nodes8_i[0].nbytes
               + mesh.paged.tri_pack[0].nbytes) / 1e6
    print(f"\n=== page_tris={page_tris}: {n_pages} pages, "
          f"{page_mb:.2f} MB/page, packed {time.perf_counter()-t0:.1f}s",
          flush=True)

    # bounce 0: coherent primaries
    slot0, t0_ = traverse_paged(mesh, o_t, d_t, tmax, image_shape=None)
    slot0.block_until_ready()
    slot0_np = np.asarray(slot0).astype(np.int64)
    t0_np = np.asarray(t0_)
    live0 = slot0_np >= 0
    print(f"bounce0 hit rate {live0.mean():.4f}", flush=True)

    # bounce-1 wave: cosine scatter at hit points, dead lanes t_max=0
    o_np = np.asarray(o_t)
    d_np = np.asarray(d_t)
    waves = []
    for seed in range(4):
        n = face_normals(mesh, slot0_np)
        # flip normal against incoming dir (two-sided, as shading does)
        flip = (n * d_np).sum(1) > 0
        n[flip] = -n[flip]
        d1 = cosine_sample(n, seed)
        o1 = o_np + d_np * t0_np[:, None] + 0.05 * n
        t1 = np.where(live0, 1e6, 0.0).astype(np.float32)
        waves.append((jnp.asarray(o1), jnp.asarray(d1), jnp.asarray(t1)))

    pairs, blks, nb = sched_stats(mesh, np.asarray(waves[0][0]),
                                  np.asarray(waves[0][1]),
                                  np.asarray(waves[0][2]))
    print(f"bounce1 schedule: {pairs} (block,page) pairs over {blks}/{nb} "
          f"live blocks", flush=True)
    prp = per_ray_pages(mesh, np.asarray(waves[0][0]),
                        np.asarray(waves[0][1]),
                        np.full(B, 1e6, np.float32), live0)
    print(f"bounce1 per-ray pages: mean {prp.mean():.2f} max {prp.max()} "
          f"sum {prp.sum()} (binned pair lower bound "
          f"{int(prp.sum()) // 1024 + n_pages})", flush=True)

    us0 = measure(
        lambda o_, d_, t_: traverse_paged(mesh, o_, d_, t_, image_shape=None),
        [(o_t + 1e-5 * i, d_t, tmax) for i in range(4)], "traverse_paged")
    us1 = measure(
        lambda o_, d_, t_: traverse_paged(mesh, o_, d_, t_, image_shape=None),
        waves, "traverse_paged")
    live_ct = int(live0.sum())
    print(f"device: bounce0 {us0/1e3:.1f} ms ({B/us0:.1f} Mrays/s); "
          f"bounce1 {us1/1e3:.1f} ms ({live_ct/us1:.2f} live-Mrays/s, "
          f"{live_ct} live)", flush=True)
    if os.environ.get("VPT_TRAV_EXP") == "count":
        for name, (o_, d_, t_) in (("bounce0", (o_t, d_t, tmax)),
                                   ("bounce1", waves[0])):
            slot, _ = traverse_paged(mesh, o_, d_, t_, image_shape=None)
            c = np.asarray(slot).reshape(-1, 16, COLS)[:, 0, 0]
            print(f"{name} visits: sum {c.sum()} mean/blk {c.mean():.1f} "
                  f"max {c.max()}", flush=True)
