"""Paged Pallas traversal: two-level packet tracing for huge meshes.

Companion to pallas_traverse.py for meshes that exceed VMEM (BASELINE
config 5, ~500k tris).  Re-derives the role of the reference's single-level
CUDA traversal at 100k+ tris (``cuda/src/PathTracer.cu:269-463``) for a
memory system where the scene cannot sit next to the compute: pages of
~4k triangles (Morton-ordered, object-split SBVH per page) stream
HBM -> VMEM on demand, per ray block.

Round-2 redesign: the Pallas grid is 1-D over 1024-ray blocks (8x128 — one
VPU tile, the same block the single-level kernel uses), and each block runs
a DYNAMIC page loop: a host-computed conservative schedule (count, perm)
lists the pages each block's ray frustum can reach, near-to-far, and the
kernel double-buffers page data through VMEM scratch with explicit
``make_async_copy`` DMAs — page i+1 streams while page i is traversed.
Blocks therefore pay exactly for the pages they touch, not for a static
(blocks x pages) sweep.  The earlier 16k-ray variant made every BVH-node
visit cost 128 vector groups and collapsed the block any-hit vote (one
outlier lane dragged 16k rays through the tree); 1024-ray pixel-tile
blocks keep both local.

Per page the block runs the same 8-wide packet traversal as the
single-level kernel (``pallas_common.wide_packet_traverse``): vector
child-box blocks, vector leaf blocks, child records scalar-read from VMEM.
Winning slots are global (``page * page_tris + local`` is baked into the
leaf packs) so the shading gather path is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrenderer_pathtracer_tpu.accel.pallas_common import (
    make_slab_any, safe_inv, wide_packet_traverse_dual)
from vrenderer_pathtracer_tpu.accel.wide import WIDE_STACK_DEPTH
from vrenderer_pathtracer_tpu.scene.scene import MeshData

ROWS = 8          # 1024 rays/block: one f32 VPU tile
COLS = 128
BLOCK = ROWS * COLS


def _kernel(count_ref, perm_ref, nodes8_f, nodes8_i, bbox, tri_pack,
            ox, oy, oz, dx, dy, dz, tmax_ref,
            slot_out, t_out, buf_f, buf_i, buf_u, buf_p, sem, stack,
            started, vcnt, *, packed16=True):
    import os
    blk = pl.program_id(0)
    vcnt[0] = 0
    cnt = count_ref[blk]
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    inv = safe_inv(d)

    slot_out[:] = jnp.full(slot_out.shape, -1, jnp.int32)
    # Clamp search bounds to the global mesh-box exit (see
    # pallas_common.root_exit_clamp): miss lanes go silent instead of
    # dragging the block through every page.
    tn = jnp.full(slot_out.shape, -jnp.inf, jnp.float32)
    tf = jnp.full(slot_out.shape, jnp.inf, jnp.float32)
    for k in range(3):
        glo = jnp.min(bbox[:, k])
        ghi = jnp.max(bbox[:, 3 + k])
        t0 = (glo - o[k]) * inv[k]
        t1 = (ghi - o[k]) * inv[k]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    hit_root = jnp.maximum(tn, 0.0) <= tf
    bound = jnp.where(hit_root, tf * 1.0001 + 1e-3, 0.0)
    t_out[:] = jnp.minimum(tmax_ref[:], bound)
    # Sky-block early-out (round 5): a block whose every lane misses the
    # global mesh box (or arrives dead, t_max=0) can skip its whole page
    # schedule — at config-5 1080p most primary-ray blocks are sky, yet
    # raster-row frustums list many pages, and the per-page slab gates
    # alone cost tens of ms/pass.  One vector reduce decides.
    cnt = jnp.where(jnp.max(t_out[:]) > 0.0, cnt, 0)

    def dmas(slot, page):
        return (
            pltpu.make_async_copy(nodes8_f.at[page], buf_f.at[slot],
                                  sem.at[slot, 0]),
            pltpu.make_async_copy(nodes8_i.at[page], buf_i.at[slot],
                                  sem.at[slot, 1]),
            pltpu.make_async_copy(tri_pack.at[page], buf_p.at[slot],
                                  sem.at[slot, 2]),
        )

    slab_any = make_slab_any(o, inv, t_out)

    def page_live(page):
        """Exact per-lane slab test vs the page box and CURRENT best t.

        The host schedule is conservative (interval frustum, no occlusion);
        this gate — run just before each DMA start — also exploits the
        near-to-far page order: once every lane holds a hit closer than a
        page's entry, that page's DMA never starts.  Skipping on the
        current t is safe: t only shrinks, so a skipped page stays dead.
        """
        hit, _ = slab_any(bbox[page, 0], bbox[page, 1], bbox[page, 2],
                          bbox[page, 3], bbox[page, 4], bbox[page, 5])
        return hit

    # Words per block of the FLAT page schedule (1-D: 2-D SMEM windows pad
    # every row to 128 lanes, which is what used to blow the ~1MB budget
    # at 1080p and force block_rows past the measured optimum).
    wpb = perm_ref.shape[0] // count_ref.shape[0]

    def sched(i):
        """Page id i of this block's schedule.

        Packed layout: TWO 16-bit ids per word (the default; exact 1-D SMEM
        sizing).  Meshes beyond 65536 pages fall back to one 32-bit id per
        word (``packed16=False``) instead of failing — double the SMEM
        footprint, same semantics.
        """
        if not packed16:
            return perm_ref[blk * wpb + i]
        w = perm_ref[blk * wpb + i // 2]
        return (w >> (16 * (1 - lax.rem(i, 2)))) & 0xFFFF

    @pl.when(cnt > 0)
    def _():
        live = page_live(sched(0))
        started[0] = live.astype(jnp.int32)

        @pl.when(live)
        def _():
            for c in dmas(0, sched(0)):
                c.start()

    def body(i, _):
        slot = lax.rem(i, 2)
        page = sched(i)

        @pl.when(i + 1 < cnt)  # prefetch the next page into the other slot
        def _():
            nxt = sched(i + 1)
            live = page_live(nxt)
            started[lax.rem(i + 1, 2)] = live.astype(jnp.int32)

            @pl.when(live)
            def _():
                for c in dmas(lax.rem(i + 1, 2), nxt):
                    c.start()

        @pl.when(started[slot] != 0)
        def _():
            for c in dmas(slot, page):
                c.wait()

        # Re-check with the (possibly tighter) current t before paying the
        # traversal.
        page_hit = page_live(page)

        # Lane-dense boxes: 16 nodes per (8,128) tile (accel/paged.py).
        # A dynamic lane offset is not sliceable on Mosaic, but a dynamic
        # lane ROTATE is one native vector op: bring node n's 8-lane group
        # to lanes [0,8) and let the slab test read lanes 0..5.
        def node_boxes(n):
            tile = buf_f[slot, pl.ds((n // 16) * 8, 8), :]
            return pltpu.roll(tile, (128 - 8 * (n % 16)) & 127, 1)

        # Dense child records: ONE packed int32 word per child (bits 0-19
        # ref, 20-23 count+1, word 0 adds 24-25 axis / 26 leaf-parent), 16
        # nodes per 128-lane row (accel/paged.py).  Scalar VMEM loads at
        # COMPUTED LANE offsets don't compile on Mosaic (it must prove lane
        # indices 128-aligned), so after the DMA the row-dense records are
        # unpacked once per page with 16 STATIC lane rotates into
        # ``buf_u[j, r, k]`` = word k of node ``16*r+j`` — reads then use a
        # dynamic sublane index + static lane, which Mosaic supports.  One
        # word per child = 8 scalar VMEM reads per visit; the unpacked
        # two-word layout paid 18 at ~19ns each (docs/PERF.md round 3).
        def node_meta(n):
            words = [buf_u[lax.rem(n, 16), n // 16, j] for j in range(8)]
            refs = [w & 0xFFFFF for w in words]
            cnts = [((w >> 20) & 0xF) - 1 for w in words]
            return refs, cnts, (words[0] >> 24) & 3, (words[0] >> 26) & 1

        @pl.when((started[slot] != 0) & page_hit)
        def _():
            for j in range(16):
                buf_u[j] = pltpu.roll(buf_i[slot], (128 - 8 * j) & 127, 1)
            # Dual-node visits: two disjoint stack entries per iteration
            # interleave their scalar<->vector sync chains (measured +20%
            # coherent / +15% shuffled on the packet kernel, BASELINE.md
            # round 3).
            wide_packet_traverse_dual(
                o, d, t_out, slot_out, stack,
                node_boxes=node_boxes,
                node_meta=node_meta,
                dense=True,
                dense_pack=buf_p.at[slot],
                n_nodes=buf_i.shape[1] * 16,
                visit_acc=vcnt,
            )
        return 0

    lax.fori_loop(0, cnt, body, 0, unroll=False)
    # Report the caller's t_max on miss lanes (contract of traverse()).
    t_out[:] = jnp.where(slot_out[:] >= 0, t_out[:], tmax_ref[:])
    if os.environ.get("VPT_TRAV_EXP", "") == "count":  # probe readback
        slot_out[0:1, :] = jnp.zeros_like(slot_out[0:1, :]) + vcnt[0]


def _page_schedule_c(paged, o_c, d_c, t_max, nb, block=BLOCK, packed16=True):
    """Per-block page lists: conservative interval-frustum culling.

    Round-1 streamed EVERY page to EVERY ray block (only a per-lane bbox
    test pruned after the DMA already happened) — the single largest perf
    deficit vs the reference.  Here each block gets a near-to-far list of
    the pages it can possibly reach, computed with interval arithmetic:
    for origins in the block's origin box, directions in its direction
    box and t in [0, max t_max], axis k constrains t to
    ``{t : t*d_lo_k <= B_k  and  t*d_hi_k >= A_k}`` with
    ``[A_k, B_k]`` the page slab widened by the origin box; a page is
    reachable iff the three t-intervals and [0, T] intersect.  This is
    exact for a point origin + direction box (captures the shared-t
    correlation a reach-box test loses) and conservative otherwise.

    Returns ``(count [nb] int32, perm [nb, Pg] int32)`` where positions
    past ``count`` repeat the last reachable page id.
    """
    big = jnp.float32(3e38)
    # Per-block bounds from flat [B] components ([nb,BLOCK,3] reductions
    # run 3-lane-minor at ~1/40 lane efficiency — docs/PERF.md round 3).
    o_lo = jnp.stack([c.reshape(nb, block).min(axis=1) for c in o_c],
                     axis=1)[:, None, :]   # [nb,1,3]
    o_hi = jnp.stack([c.reshape(nb, block).max(axis=1) for c in o_c],
                     axis=1)[:, None, :]
    d_lo = jnp.stack([c.reshape(nb, block).min(axis=1) for c in d_c],
                     axis=1)[:, None, :]
    d_hi = jnp.stack([c.reshape(nb, block).max(axis=1) for c in d_c],
                     axis=1)[:, None, :]
    t_cap = t_max.reshape(nb, block).max(axis=1)          # [nb]

    p_lo = paged.bbox[None, :, 0:3]    # [1,Pg,3]
    p_hi = paged.bbox[None, :, 3:6]
    a = p_lo - o_hi                    # [nb,Pg,3]
    b_ = p_hi - o_lo
    # Small conservative margin against fp disagreement with the kernel's
    # exact per-lane slab test.
    eps = 1e-4 * (1.0 + jnp.maximum(jnp.abs(a), jnp.abs(b_)))
    a = a - eps
    b_ = b_ + eps

    def t_interval(dl, dh, av, bv):
        # {t >= 0 : t*dl <= bv} = [0, bv/dl] if dl>0; [0,inf) if dl<=0<=bv;
        # [bv/dl, inf) if dl<0 and bv<0 (division flips); empty if dl==0>bv.
        hi1 = jnp.where(dl > 0, bv / jnp.where(dl > 0, dl, 1.0), big)
        lo1 = jnp.where((dl < 0) & (bv < 0),
                        bv / jnp.where(dl < 0, dl, -1.0), 0.0)
        empty1 = (dl == 0) & (bv < 0)
        # {t >= 0 : t*dh >= av} = [av/dh, inf) if dh>0; [0,inf) if av<=0;
        # [0, av/dh] if dh<0 and av<0; empty if dh<=0<av.
        lo2 = jnp.where((dh > 0) & (av > 0),
                        av / jnp.where(dh > 0, dh, 1.0), 0.0)
        hi2 = jnp.where((dh < 0) & (av < 0),
                        av / jnp.where(dh < 0, dh, -1.0), big)
        empty2 = (dh <= 0) & (av > 0)
        lo = jnp.maximum(lo1, lo2)
        hi = jnp.minimum(hi1, hi2)
        hi = jnp.where(empty1 | empty2, -big, hi)
        return lo, hi

    lo = jnp.zeros(a.shape[:2], jnp.float32)
    hi = jnp.broadcast_to(t_cap[:, None], a.shape[:2])
    for k in range(3):
        lk, hk = t_interval(d_lo[..., k], d_hi[..., k], a[..., k], b_[..., k])
        lo = jnp.maximum(lo, lk)
        hi = jnp.minimum(hi, hk)
    reachable = lo <= hi                                   # [nb,Pg]

    count = reachable.sum(axis=1).astype(jnp.int32)        # [nb]
    key = jnp.where(reachable, lo, big)                    # near-to-far
    perm = jnp.argsort(key, axis=1).astype(jnp.int32)      # [nb,Pg]
    # Repeat the last reachable page into the tail (count==0 keeps col 0).
    last = jnp.take_along_axis(
        perm, jnp.maximum(count - 1, 0)[:, None], axis=1)  # [nb,1]
    pos = jnp.arange(perm.shape[1], dtype=jnp.int32)[None, :]
    perm = jnp.where(pos < jnp.maximum(count, 1)[:, None], perm, last)
    # Pack TWO 16-bit page ids per int32 word: the schedule rides the
    # scalar-prefetch SMEM window, whose ~768KB budget otherwise forces
    # block_rows past the measured optimum at 1080p (docs/PERF.md).
    # Meshes with more than PACK16_MAX_PAGES pages (~8M+ tris at the
    # default page size) keep one 32-bit id per word instead of
    # overflowing the packed ids — a capacity fallback, not a perf path.
    pg = perm.shape[1]
    if not packed16:
        return count, perm.reshape(-1)
    assert pg <= PACK16_MAX_PAGES
    if pg % 2:
        perm = jnp.pad(perm, ((0, 0), (0, 1)))
    packed = (perm[:, 0::2] << 16) | perm[:, 1::2]
    return count, packed.reshape(-1)   # FLAT (1-D SMEM windows are exact)


SMEM_SCHEDULE_BUDGET = 768 * 1024  # bytes for the prefetched (count, perm)
PACK16_MAX_PAGES = 0x10000         # beyond: unpacked 32-bit schedule ids


def traverse_paged(mesh: MeshData, ray_o, ray_d, t_max, interpret=False,
                   image_shape=None, block_rows=2 * ROWS):
    """Two-level paged traversal over [B] rays.  Same contract as
    accel.traverse.traverse: returns (slot [B] int32, t [B] f32).

    ``image_shape=(h, w)``: rays are raster-ordered frames; blocks are
    remapped to compact 32x32 pixel tiles (pallas_traverse._tile_remap),
    which tightens each block's frustum — fewer reachable pages per block
    AND a tighter any-hit vote inside each page.

    ``block_rows`` (static): sublane rows per ray block (block = 128*rows
    rays).  Default 16 — the measured best for this kernel on coherent
    views (+12% over 8: fewer page-DMA streams; 32/64 lose, and shuffled
    batches measure flat 8-vs-16 — the any-hit union does NOT saturate,
    .bench/rows_sweep.py).  Auto-escalated (doubled) until the prefetched
    page schedule ``perm [nb, Pg]`` fits the ~1MB SMEM window — at
    1920x1080 over a ~500k-tri mesh the 8-row schedule alone is ~2MB and
    refuses to compile.  The escalation runs in THIS un-jitted wrapper so
    the inner jit's static ``block_rows`` always reflects the
    ``SMEM_SCHEDULE_BUDGET`` in force at call time (a trace-time read
    inside the jit would not be part of the cache key).
    """
    n_pages = mesh.paged.nodes8_f.shape[0]
    # Two 16-bit page ids per int32 word; >PACK16_MAX_PAGES pages fall
    # back to one 32-bit id per word (_page_schedule_c).  Decided HERE,
    # un-jitted, so the static flag is always part of the jit cache key.
    packed16 = n_pages <= PACK16_MAX_PAGES
    sched_words = -(-n_pages // 2) if packed16 else n_pages
    b = ray_o.shape[0]
    while ((-(-b // (block_rows * COLS))) * sched_words * 4
           > SMEM_SCHEDULE_BUDGET
           and block_rows * COLS < b):  # nb==1: nothing left to merge
        block_rows *= 2
    return _traverse_paged(mesh, ray_o, ray_d, t_max, interpret=interpret,
                           image_shape=image_shape, block_rows=block_rows,
                           packed16=packed16)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "image_shape", "block_rows",
                                    "packed16"))
def _traverse_paged(mesh: MeshData, ray_o, ray_d, t_max, interpret,
                    image_shape, block_rows, packed16=True):
    from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
        TILE, _tile_remap)

    paged = mesh.paged
    n_pages = paged.nodes8_f.shape[0]
    nir16 = paged.nodes8_i.shape[1]  # packed record rows: 16 nodes/row
    nbr = paged.nodes8_f.shape[1]   # dense box rows: 8 * ceil(nodes/16)
    rp8 = paged.tri_pack.shape[1]

    b = ray_o.shape[0]
    BLOCK = block_rows * COLS
    tiled = (image_shape is not None
             and b % (image_shape[0] * image_shape[1]) == 0
             and image_shape[0] % TILE == 0 and image_shape[1] % TILE == 0)
    if tiled:
        h, w = image_shape
        ray_o = _tile_remap(ray_o, h, w)
        ray_d = _tile_remap(ray_d, h, w)
        t_max = _tile_remap(t_max, h, w)
    pad = (-b) % BLOCK
    if pad:
        # Pad [B] components, not [B,3] arrays: a concat on [B,3] runs in a
        # 3-lane-minor layout at ~1/40 lane efficiency (6.5 ms per pad on a
        # 1 MP frame, docs/PERF.md round 3); flat [B] pads are full-lane.
        def pad1(v, fill):
            return jnp.concatenate([v, jnp.full((pad,), fill, v.dtype)])

        o_c = [pad1(ray_o[:, k], 0.0) for k in range(3)]
        d_c = [pad1(ray_d[:, k], 1.0) for k in range(3)]
        t_max = pad1(t_max, 0.0)
    else:
        o_c = [ray_o[:, k] for k in range(3)]
        d_c = [ray_d[:, k] for k in range(3)]
    nb = o_c[0].shape[0] // BLOCK

    def comp(x):
        return x.reshape(nb * block_rows, COLS)

    count, perm = _page_schedule_c(paged, o_c, d_c, t_max, nb, BLOCK,
                                   packed16=packed16)

    # index_map signature: (*grid_ids, *scalar_prefetch_refs).
    ray_spec = pl.BlockSpec(
        (block_rows, COLS), lambda i, cnt, perm: (i, 0),
        memory_space=pltpu.VMEM)
    # Page arrays stay in HBM (ANY); the kernel streams them per block
    # with double-buffered DMAs into the VMEM scratch below.
    hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,      # count [nb], perm [nb, Pg] — SMEM
        grid=(nb,),
        in_specs=[
            hbm_spec,                               # wide child boxes
            hbm_spec,                               # child records + axis
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bbox: tiny, whole-array
            hbm_spec,                               # vector leaf blocks
            *([ray_spec] * 7),
        ],
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[
            pltpu.VMEM((2, nbr, 128), jnp.float32),       # dense node boxes
            pltpu.VMEM((2, nir16, 128), jnp.int32),       # packed records
            pltpu.VMEM((16, nir16, 128), jnp.int32),      # unpacked records
            pltpu.VMEM((2, rp8, 128), jnp.float32),       # leaf blocks
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),   # per-slot DMA-started flags
            pltpu.SMEM((1,), jnp.int32),   # visit counter (probe)
        ],
    )

    slot, t = pl.pallas_call(
        functools.partial(_kernel, packed16=packed16),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb * block_rows, COLS), jnp.int32),
            jax.ShapeDtypeStruct((nb * block_rows, COLS), jnp.float32),
        ),
        name="traverse_paged",
        # The surrounding XLA program pins extra buffers in VMEM when this
        # kernel is embedded in the full render step; raise the scoped
        # limit above the 16MB default (v5e has headroom) so both fit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        count, perm,
        paged.nodes8_f, paged.nodes8_i,
        paged.bbox, paged.tri_pack,
        comp(o_c[0]), comp(o_c[1]), comp(o_c[2]),
        comp(d_c[0]), comp(d_c[1]), comp(d_c[2]),
        comp(t_max),
    )
    slot = slot.reshape(-1)[:b]
    t = t.reshape(-1)[:b]
    if tiled:
        slot = _tile_remap(slot, h, w, inverse=True)
        t = _tile_remap(t, h, w, inverse=True)
    return slot, t
