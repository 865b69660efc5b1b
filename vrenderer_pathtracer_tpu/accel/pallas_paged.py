"""Paged Pallas traversal: two-level packet tracing for huge meshes.

Companion to pallas_traverse.py for meshes that exceed VMEM (BASELINE
config 5, ~500k tris).  The Pallas grid is ``(ray_blocks, pages)`` with the
page dimension fastest: each program gets one VMEM-resident block of rays
(kept across the page sweep — the output BlockSpec ignores the page index,
so Pallas leaves the best-hit block in VMEM) and one page's node/triangle
arrays, which the Pallas pipeline streams HBM -> VMEM double-buffered at
full bandwidth while the previous page is being traversed.

Per (block, page) step: if no lane can hit the page bbox within its current
best t, the page is skipped outright (the top level of the two-level BVH);
otherwise the page-local object-split BVH is packet-traversed exactly like
the single-level kernel.  Winning slots are globalized as
``page * page_tris + local`` so the shading gather path is unchanged.

Traffic model: rays stay resident; page data is streamed once per ray
block.  With 16k-ray blocks a 500k-tri mesh (~30MB of pages) costs
~2MB of HBM reads per 1k rays per bounce — bandwidth, not latency, bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrenderer_pathtracer_tpu.accel.pallas_common import (
    make_slab_any, safe_inv, wide_packet_traverse)
from vrenderer_pathtracer_tpu.accel.wide import WIDE_STACK_DEPTH
from vrenderer_pathtracer_tpu.scene.scene import MeshData

ROWS = 128        # 16384 rays/block
COLS = 128
BLOCK = ROWS * COLS


def _kernel(count_ref, perm_ref, nodes8_f, nodes8_i, bbox,
            tri_pack, ox, oy, oz, dx, dy, dz, tmax_ref,
            slot_out, t_out, stack):
    # Per-BLOCK page schedule (round-2): perm_ref[i] lists this ray block's
    # conservatively-reachable pages near-to-far (see _page_schedule);
    # positions past count_ref[i] repeat the last relevant page, so Pallas
    # skips their DMA (unchanged block index) and the body is gated off.
    # Each reachable page runs the 8-wide packet traversal (accel/wide.py):
    # vector child-box blocks, child records scalar-read from a VMEM window
    # (per-page SMEM windows would pad the minor dim to 128 lanes and blow
    # the 1MB budget), vector leaf blocks with GLOBAL slots baked in.
    blk = pl.program_id(0)
    step = pl.program_id(1)
    page = perm_ref[blk, step]

    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])

    @pl.when(step == 0)  # first page STEP for this ray block
    def _():
        slot_out[:] = jnp.full((ROWS, COLS), -1, jnp.int32)
        # Clamp search bounds to the global mesh-box exit (see
        # pallas_common.root_exit_clamp): miss lanes go silent instead of
        # dragging every page in.
        inv = safe_inv(d)
        tn = jnp.full((ROWS, COLS), -jnp.inf, jnp.float32)
        tf = jnp.full((ROWS, COLS), jnp.inf, jnp.float32)
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
    slab_any = make_slab_any(o, safe_inv(d), t_out)
    page_hit, _ = slab_any(bbox[page, 0], bbox[page, 1], bbox[page, 2],
                           bbox[page, 3], bbox[page, 4], bbox[page, 5])

    @pl.when(page_hit & (step < count_ref[blk]))
    def _():
        wide_packet_traverse(
            o, d, t_out, slot_out, stack,
            node_boxes=lambda n: nodes8_f[0, pl.ds(n * 8, 8), :],
            node_i=lambda n, k: nodes8_i[0, n, k],
            node_ax=lambda n: nodes8_i[0, n, 16],
            leaf_blk=lambda ref: tri_pack[0, pl.ds(ref, 8), :],
            n_nodes=nodes8_i.shape[1],
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)  # last page step
    def _():
        # Report the caller's t_max on miss lanes (contract of traverse()).
        t_out[:] = jnp.where(slot_out[:] >= 0, t_out[:], tmax_ref[:])


def _page_schedule(paged, ray_o, ray_d, t_max, nb):
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
    past ``count`` repeat the last reachable page id (so the Pallas
    pipeline sees an unchanged block index and skips the copy).
    """
    big = jnp.float32(3e38)
    o = ray_o.reshape(nb, BLOCK, 3)
    d = ray_d.reshape(nb, BLOCK, 3)
    o_lo = o.min(axis=1)[:, None, :]   # [nb,1,3]
    o_hi = o.max(axis=1)[:, None, :]
    d_lo = d.min(axis=1)[:, None, :]
    d_hi = d.max(axis=1)[:, None, :]
    t_cap = t_max.reshape(nb, BLOCK).max(axis=1)          # [nb]

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
    return count, perm


@functools.partial(jax.jit, static_argnames=("interpret",))
def traverse_paged(mesh: MeshData, ray_o, ray_d, t_max, interpret=False):
    """Two-level paged traversal over [B] rays.  Same contract as
    accel.traverse.traverse: returns (slot [B] int32, t [B] f32)."""
    paged = mesh.paged
    n_pages = paged.nodes8_f.shape[0]
    npp8 = paged.nodes8_i.shape[1]
    rp8 = paged.tri_pack.shape[1]

    b = ray_o.shape[0]
    pad = (-b) % BLOCK
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    nb = ray_o.shape[0] // BLOCK

    def comp(x):
        return x.reshape(nb * ROWS, COLS)

    count, perm = _page_schedule(paged, ray_o, ray_d, t_max, nb)

    # index_map signature: (*grid_ids, *scalar_prefetch_refs).
    ray_spec = pl.BlockSpec(
        (ROWS, COLS), lambda i, p, cnt, perm: (i, 0), memory_space=pltpu.VMEM
    )
    page3 = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda i, p, cnt, perm: (perm[i, p],) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, n_pages),
        in_specs=[
            page3((npp8 * 8, 8)),                   # wide child boxes
            page3((npp8, 17)),                      # child records + axis
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bbox: tiny, whole-array
            page3((rp8, 16)),                       # vector leaf blocks
            *([ray_spec] * 7),
        ],
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32)],
    )

    slot, t = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb * ROWS, COLS), jnp.int32),
            jax.ShapeDtypeStruct((nb * ROWS, COLS), jnp.float32),
        ),
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
        comp(ray_o[:, 0]), comp(ray_o[:, 1]), comp(ray_o[:, 2]),
        comp(ray_d[:, 0]), comp(ray_d[:, 1]), comp(ray_d[:, 2]),
        comp(t_max),
    )
    return slot.reshape(-1)[:b], t.reshape(-1)[:b]
