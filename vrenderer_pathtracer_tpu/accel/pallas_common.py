"""Shared packet-traversal body for the Pallas BVH kernels.

Both the single-level kernel (pallas_traverse.py, whole scene in VMEM) and
the paged kernel (pallas_paged.py, page streamed per grid step) run the same
block-synchronous traversal: one SMEM stack per ray block, scalar node
fetches slab-tested across all lanes, any-hit votes, near-to-far child
ordering, inline MAX_LEAF leaf resolution.  This module holds that body
once, parameterized by data accessors, so the two kernels differ only in
where their arrays live.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrenderer_pathtracer_tpu.accel.mesh import MAX_LEAF, STACK_DEPTH
from vrenderer_pathtracer_tpu.accel.traverse import TRI_EPS


def safe_inv(d):
    """Per-component 1/d with the slab test's signed-epsilon guard."""
    return tuple(
        1.0 / jnp.where(jnp.abs(c) > 1e-12, c, jnp.where(c >= 0, 1e-12, -1e-12))
        for c in d
    )


def root_exit_clamp(o, d, t_max, node_f):
    """Clamp per-lane search bounds to the root-box exit distance.

    Any triangle hit satisfies ``t <= exit(root box)``, so a lane's search
    bound can be tightened to it for free.  Lanes whose rays miss the root
    box entirely get bound 0 and thus fail every subsequent slab test —
    without this, miss lanes carried t=1e6 and forced the block-wide
    any-hit vote to descend subtrees no lane could ever hit.  A small
    relative margin guards fp disagreement between this slab test and the
    per-node ones.  ``node_f(n, k)`` is the scalar node-float accessor.
    """
    inv = safe_inv(d)
    lo = (jnp.minimum(node_f(0, 0), node_f(0, 6)),
          jnp.minimum(node_f(0, 1), node_f(0, 7)),
          jnp.minimum(node_f(0, 2), node_f(0, 8)))
    hi = (jnp.maximum(node_f(0, 3), node_f(0, 9)),
          jnp.maximum(node_f(0, 4), node_f(0, 10)),
          jnp.maximum(node_f(0, 5), node_f(0, 11)))
    tn = jnp.full_like(t_max, -jnp.inf)
    tf = jnp.full_like(t_max, jnp.inf)
    for k in range(3):
        t0 = (lo[k] - o[k]) * inv[k]
        t1 = (hi[k] - o[k]) * inv[k]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    hit_root = jnp.maximum(tn, 0.0) <= tf
    bound = jnp.where(hit_root, tf * 1.0001 + 1e-3, 0.0)
    return jnp.minimum(t_max, bound)


def make_slab_any(o, inv, t_out):
    """Vector slab test vs one scalar AABB -> (any_hit, min entry t)."""

    def slab_any(lo0, lo1, lo2, hi0, hi1, hi2):
        best = t_out[:]
        t0x = (lo0 - o[0]) * inv[0]
        t1x = (hi0 - o[0]) * inv[0]
        t0y = (lo1 - o[1]) * inv[1]
        t1y = (hi1 - o[1]) * inv[1]
        t0z = (lo2 - o[2]) * inv[2]
        t1z = (hi2 - o[2]) * inv[2]
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hit = jnp.maximum(tn, 0.0) <= jnp.minimum(tf, best)
        return jnp.any(hit), jnp.min(jnp.where(hit, tn, jnp.inf))

    return slab_any


def root_exit_clamp_wide(o, d, t_max, root_boxes):
    """root_exit_clamp for the 8-wide layout: root box = union of the root
    node's child boxes (``root_boxes`` = the root's (8,>=6) box block;
    empty slots carry inverted boxes, which the per-axis min/max here
    ignores by construction)."""
    inv = safe_inv(d)
    lo = [root_boxes[0, 0], root_boxes[0, 1], root_boxes[0, 2]]
    hi = [root_boxes[0, 3], root_boxes[0, 4], root_boxes[0, 5]]
    for c in range(1, 8):
        for k in range(3):
            lo[k] = jnp.minimum(lo[k], root_boxes[c, k])
            hi[k] = jnp.maximum(hi[k], root_boxes[c, 3 + k])
    tn = jnp.full_like(t_max, -jnp.inf)
    tf = jnp.full_like(t_max, jnp.inf)
    for k in range(3):
        t0 = (lo[k] - o[k]) * inv[k]
        t1 = (hi[k] - o[k]) * inv[k]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    hit_root = jnp.maximum(tn, 0.0) <= tf
    bound = jnp.where(hit_root, tf * 1.0001 + 1e-3, 0.0)
    return jnp.minimum(t_max, bound)


def make_leaf_fn(o, d, t_out, slot_out, tri, slot_base, on_hit=None):
    """Inline leaf resolver: ``leaf(start, count)`` runs up to MAX_LEAF
    Möller–Trumbore tests, each one triangle broadcast against all lanes,
    updating the running best (t, slot) refs in place."""

    def tri_test(s, live):
        v0, e1, e2 = tri(s)
        px = d[1] * e2[2] - d[2] * e2[1]
        py = d[2] * e2[0] - d[0] * e2[2]
        pz = d[0] * e2[1] - d[1] * e2[0]
        det = e1[0] * px + e1[1] * py + e1[2] * pz
        ok_det = jnp.abs(det) > TRI_EPS
        inv_det = 1.0 / jnp.where(ok_det, det, 1.0)
        tx = o[0] - v0[0]
        ty = o[1] - v0[1]
        tz = o[2] - v0[2]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1[2] - tz * e1[1]
        qy = tz * e1[0] - tx * e1[2]
        qz = tx * e1[1] - ty * e1[0]
        v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det
        t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
        ok = (
            live & ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > TRI_EPS) & (t < t_out[:])
        )
        t_out[:] = jnp.where(ok, t, t_out[:])
        slot_out[:] = jnp.where(ok, slot_base + s, slot_out[:])
        if on_hit is not None:
            on_hit(s, ok, u, v, e1, e2)

    def leaf(start, count):
        # All MAX_LEAF slots are tested unconditionally with the validity
        # folded into the hit mask: straight-line vector code pipelines
        # (measured ~160ns/test vs ~350ns when each test hides behind a
        # pl.when branch).  Over-read slots belong to the NEXT leaf (slots
        # are contiguous) or to degenerate padding; `live` masks them.
        def tb(k, _):
            tri_test(start + k, k < count)
            return 0

        lax.fori_loop(0, MAX_LEAF, tb, 0, unroll=True)

    return leaf


def make_pack_leaf_fn(o, d, t_out, slot_out, leaf_blk, on_win=None,
                      test_fn=None):
    """Vector leaf resolver for the 8-aligned ``tri_pack`` layout.

    ``leaf_blk(ref)`` returns rows [ref, ref+8) of the pack as ONE (8,16)
    vector block — row = (v0, e1, e2, original slot, uv corners) — and
    runs the Möller–Trumbore test 8-triangles x 128-rays per op: ray
    group g is broadcast across sublanes while triangle components
    broadcast across lanes, so a whole leaf costs zero scalar loads (the
    scalar-leaf path paid 9 scalar fetches per triangle, which set its
    ~160ns/test floor).  Zero padding rows have det 0 and never hit;
    each winning lane takes the pack row's stored ORIGINAL slot, so
    downstream attribute lookups keep indexing the contiguous arrays.

    ``on_win(g, ref, win, select, blk, bu, bv)`` — optional hook, called
    once per ray group with the (1,C) win mask, a ``select(vals(8,C)) ->
    (1,C)`` reduction that picks the winner triangle row per lane, the
    leaf's (8,16) block, and the (8,C) barycentrics; the fused radiance
    kernel uses it to capture shading attributes at win time.
    """
    test = test_fn or make_pack_test_fn(o, d, t_out, slot_out, on_win)

    def leaf(ref, count):
        del count  # all 8 rows tested; padding rows are degenerate
        test(leaf_blk(ref), ref)

    return leaf


def make_pack_test_fn_woop(o, d, t_out, slot_out):
    """Woop unit-triangle test over a (8, >=16) WOOP-layout block.

    Experiment named in BASELINE.json (the reference uses Möller–Trumbore,
    ``/root/reference/cuda/include/RayIntersection.cuh:45-47``): rows store
    the affine world->unit-triangle transform — A^{-1} (9 floats, cols
    0:9, row-major) and -A^{-1}·v0 (cols 9:12) with A = [e1 e2 n] — plus
    the original slot at col 12.  Then o' = A^{-1}o + b, d' = A^{-1}d,
    t = -o'_z/d'_z, u = o'_x + t d'_x, v = o'_y + t d'_y: ~39 VPU ops per
    group vs Möller–Trumbore's ~50.  Zero padding rows give d'_z = 0 ->
    t = NaN -> every compare false (never hit).
    """
    n_groups = o[0].shape[0]

    def test(blk, ref):
        m = [[blk[:, 3 * r + c:3 * r + c + 1] for c in range(3)]
             for r in range(3)]
        bvec = [blk[:, 9 + k:10 + k] for k in range(3)]
        slotc = blk[:, 12:13]
        shape = (8, t_out.shape[1])
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        for g in range(n_groups):
            og = [jnp.broadcast_to(o[k][g:g + 1, :], shape) for k in range(3)]
            dg = [jnp.broadcast_to(d[k][g:g + 1, :], shape) for k in range(3)]
            op = [m[r][0] * og[0] + m[r][1] * og[1] + m[r][2] * og[2]
                  + bvec[r] for r in range(3)]
            dp = [m[r][0] * dg[0] + m[r][1] * dg[1] + m[r][2] * dg[2]
                  for r in range(3)]
            t = -op[2] * (1.0 / dp[2])
            u = op[0] + t * dp[0]
            v = op[1] + t * dp[1]
            best_g = t_out[g:g + 1, :]
            ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t > TRI_EPS) & (t < jnp.broadcast_to(best_g, shape)))
            tm = jnp.where(ok, t, jnp.inf)
            t_min = jnp.min(tm, axis=0, keepdims=True)
            win = t_min < best_g
            w_row = jnp.min(jnp.where(tm <= t_min, rows, 8),
                            axis=0, keepdims=True)
            onehot = rows == w_row
            s_win = jnp.sum(jnp.where(onehot, jnp.broadcast_to(slotc, shape),
                                      0.0), axis=0, keepdims=True)
            t_out[g:g + 1, :] = jnp.where(win, t_min, best_g)
            slot_out[g:g + 1, :] = jnp.where(
                win, s_win.astype(jnp.int32), slot_out[g:g + 1, :])

    return test


def make_pack_test_fn(o, d, t_out, slot_out, on_win=None):
    """Möller–Trumbore test of one (8, >=16) triangle block against all
    ray groups, updating the best hit in place (the vector core of
    :func:`make_pack_leaf_fn`; the dense paged layout calls it directly
    with statically lane-sliced sub-blocks)."""
    n_groups = o[0].shape[0]

    def test(blk, ref):
        v0 = [blk[:, k:k + 1] for k in range(3)]
        e1 = [blk[:, 3 + k:4 + k] for k in range(3)]
        e2 = [blk[:, 6 + k:7 + k] for k in range(3)]
        slotc = blk[:, 9:10]
        shape = (8, t_out.shape[1])
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        for g in range(n_groups):
            og = [jnp.broadcast_to(o[k][g:g + 1, :], shape) for k in range(3)]
            dg = [jnp.broadcast_to(d[k][g:g + 1, :], shape) for k in range(3)]
            px = dg[1] * e2[2] - dg[2] * e2[1]
            py = dg[2] * e2[0] - dg[0] * e2[2]
            pz = dg[0] * e2[1] - dg[1] * e2[0]
            det = e1[0] * px + e1[1] * py + e1[2] * pz
            ok_det = jnp.abs(det) > TRI_EPS
            inv_det = 1.0 / jnp.where(ok_det, det, 1.0)
            tx = og[0] - v0[0]
            ty = og[1] - v0[1]
            tz = og[2] - v0[2]
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1[2] - tz * e1[1]
            qy = tz * e1[0] - tx * e1[2]
            qz = tx * e1[1] - ty * e1[0]
            v = (dg[0] * qx + dg[1] * qy + dg[2] * qz) * inv_det
            t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
            best_g = t_out[g:g + 1, :]
            ok = (
                ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > TRI_EPS) & (t < jnp.broadcast_to(best_g, shape))
            )
            tm = jnp.where(ok, t, jnp.inf)
            t_min = jnp.min(tm, axis=0, keepdims=True)        # (1,128)
            win = t_min < best_g
            # Deterministic winner: the FIRST row at the minimum (pack
            # order = leaf order, matching the sequential first-tri-wins
            # tie convention), as a one-hot for exact value selection.
            w_row = jnp.min(jnp.where(tm <= t_min, rows, 8),
                            axis=0, keepdims=True)
            onehot = rows == w_row                            # (8,128)

            def select(vals):
                return jnp.sum(jnp.where(onehot, vals, 0.0),
                               axis=0, keepdims=True)

            s_win = select(jnp.broadcast_to(slotc, shape))
            t_out[g:g + 1, :] = jnp.where(win, t_min, best_g)
            slot_out[g:g + 1, :] = jnp.where(
                win, s_win.astype(jnp.int32), slot_out[g:g + 1, :])
            if on_win is not None:
                on_win(g, ref, win, select, blk, u, v)

    return test


def make_node_boxes_fn(nodes8_f):
    """Node-box accessor, dispatching on the box layout (STATIC, from the
    lane width).  Sparse [N*8,8]: direct (8,8) block load — fastest, but
    VMEM pads the 8 lanes to 128 (16x waste).  LANE-DENSE [.,128]
    (accel/wide.py lane_dense_boxes): 16 nodes share one (8,128) tile;
    node n's block is brought to lanes [0,8) with one dynamic lane rotate
    — zero waste, ~+10-20% visit cost, raising the mesh ceiling 8x.
    pack_from_bvh picks the layout per mesh by VMEM footprint."""
    if nodes8_f.shape[-1] != 128:
        return lambda n: nodes8_f[pl.ds(pl.multiple_of(n * 8, 8), 8), :]

    def node_boxes(n):
        tile = nodes8_f[pl.ds(pl.multiple_of((n // 16) * 8, 8), 8), :]
        return pltpu.roll(tile, (128 - 8 * lax.rem(n, 16)) & 127, 1)

    return node_boxes


def make_leaf_blk_fn(tri_pack):
    """Leaf-block accessor, dispatching on the pack layout (see
    :func:`make_node_boxes_fn`).  Sparse [T8,16]: direct (8,16) slice.
    LANE-DENSE (accel/wide.py lane_dense_pack16): 8 leaf blocks share one
    (8,128) tile; block l = ref//8 lives at rows (l//8)*8..+8, lanes
    16*(l%8)..+16 — dynamic sublane slice + dynamic lane rotate."""
    if tri_pack.shape[-1] != 128:
        return lambda ref: tri_pack[pl.ds(ref, 8), :]

    def leaf_blk(ref):
        l = ref // 8
        tile = tri_pack[pl.ds(pl.multiple_of((l // 8) * 8, 8), 8), :]
        return pltpu.roll(tile, (128 - 16 * lax.rem(l, 8)) & 127, 1)[:, :16]

    return leaf_blk


def wide_packet_traverse(o, d, t_out, slot_out, stack, *,
                         node_boxes, node_meta, n_nodes,
                         leaf_blk=None, dense=False, dense_pack=None,
                         on_win=None, visit_acc=None, nodes_per_visit=1,
                         leaf_test="mt"):
    """8-wide packet traversal (accel/wide.py layout) for one ray block.

    Per visit, ALL EIGHT child boxes arrive in one aligned (8,8) VECTOR
    load from ``node_fv`` (row ``n*8+c`` = child c's lo3/hi3) — the
    per-visit scalar-unit loads, not FLOPs, dominate packet traversal on
    TPU (measured ~20-45ns per scalar fetch), and this removes all 48 of
    them.  The slab test then runs child-parallel: rays are processed in
    eight 128-lane groups, each group broadcast across sublanes so one
    (8,128) op tests 8 children x 128 rays.  The eight any-hit votes
    resolve with TWO packed reductions (per-child lane counts weighted
    into 8-bit fields of two scalars) instead of one vote round trip per
    child.  Traversal order comes from the build-time child sort: children
    are pushed far-to-near along the node's stored axis, flipped by the
    sign of the block-representative ray direction (lane 0), so no
    block-wide min-reduction is needed.

    ``node_boxes(n)`` — (8, >=6) vector block of node n's child AABBs;
    ``node_meta(n)`` — scalar accessor returning ``(refs[8], cnts[8], ax,
    lp)``: per-child (ref, count) lists, the sort axis, and the
    leaf-parent flag (anything for non-dense layouts).  The kernel owning
    the storage decides how many scalar reads that costs — the paged
    layout packs a whole child record into ONE int32 word (8 reads/visit),
    the SMEM layout reads 16+1.  The stack must hold ``stack_need(depth)``
    entries (checked at build time against WIDE_STACK_DEPTH; the bound
    covers the dual-node worst case of ~14 residual entries per level).

    ``nodes_per_visit=2`` selects the dual-node body (see
    :func:`wide_packet_traverse_dual`).

    Leaf layouts (exactly one must be given):
    - ``leaf_blk(ref)`` — (8,16) aligned leaf block (leaf refs in
      ``node_meta`` index THIS space; winners record the original slot
      stored per row).
    - ``dense=True`` + ``dense_pack`` — the DENSE layout
      (accel/wide.py build_dense_page): nodes flagged by ``lp`` are
      leaf-parents whose child j is sub-block j of pack row-group
      ``refs[0]``, extracted with a STATIC lane slice — the layout
      that lets page DMAs move zero padding.  Leaf order within a node
      is irrelevant (its any-hit bits are already fixed), so the static
      position j needs no near-to-far flip.
    """
    import os
    # Cost probes (measurement instrumentation, see docs/PERF.md round 3):
    # duplicate one phase of the visit and measure the delta on hardware —
    # device timings through the tunnel are deterministic, so single-phase
    # deltas are exact.  "count" stashes per-block visit counts in slot row
    # 0 (.bench/visit_count.py).  Losing design variants measured this way
    # (single-scalar vote, carry-the-near-child, box prefetch-into-carry)
    # are recorded in docs/PERF.md and were removed from the body.  Probes
    # apply to the single-node body only (the measurement baseline).
    EXP = os.environ.get("VPT_TRAV_EXP", "")            # dup_* cost probes
    inv = safe_inv(d)
    if dense:
        # The dense leaf-parent branch passes the GROUP base ref for all 8
        # sub-blocks, which would mis-index any on_win that reads an aux
        # pack by ref — reject until a per-sub-block ref is plumbed.
        assert on_win is None, "dense leaf layout has no on_win hook"
        test = make_pack_test_fn(o, d, t_out, slot_out)
    else:
        assert not (leaf_test == "woop" and on_win is not None), \
            "the Woop leaf test has no on_win hook (capture would be lost)"
        tf = (make_pack_test_fn_woop(o, d, t_out, slot_out)
              if leaf_test == "woop" else None)
        leaf = make_pack_leaf_fn(o, d, t_out, slot_out, leaf_blk, on_win,
                                 test_fn=tf)
    dneg = tuple(d[k][0, 0] < 0.0 for k in range(3))
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    w_lo = jnp.where(rows < 4, jnp.left_shift(1, 8 * rows), 0)
    w_hi = jnp.where(rows >= 4, jnp.left_shift(1, 8 * (rows - 4)), 0)
    n_groups = o[0].shape[0]

    def slab8(boxes, bias=0.0):
        """Eight-child slab test -> (8, C) any-hit accumulator.  ``bias``
        shifts every plane distance (probe-only: lets dup_slab duplicate
        the full phase without the compiler folding the copies)."""
        lo = [boxes[:, k:k + 1] for k in range(3)]
        hi = [boxes[:, 3 + k:4 + k] for k in range(3)]
        shape = (8, t_out.shape[1])
        acc = jnp.zeros(shape, jnp.int32)
        best = t_out[:]
        for g in range(n_groups):
            tn = jnp.full(shape, -jnp.inf)
            tf = jnp.full(shape, jnp.inf)
            for k in range(3):
                og = jnp.broadcast_to(o[k][g:g + 1, :], shape)
                ig = jnp.broadcast_to(inv[k][g:g + 1, :], shape)
                t0 = (lo[k] - og) * ig + bias
                t1 = (hi[k] - og) * ig + bias
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            bg = jnp.broadcast_to(best[g:g + 1, :], shape)
            hit = jnp.maximum(tn, 0.0) <= jnp.minimum(tf, bg)
            acc = acc | hit.astype(jnp.int32)
        return acc

    def vote(acc):
        """All eight any-hit votes from two packed count reductions.  (A
        one-reduction variant — per-child any via jnp.max then one
        weighted sum — measured 0.5ms SLOWER on the bench view: int max
        lowers worse than the sum+shift pair.)"""
        counts = jnp.sum(acc, axis=1, keepdims=True)
        return jnp.sum(counts * w_lo), jnp.sum(counts * w_hi)

    def extract_bits(s_lo, s_hi, valid=True):
        return ([((jnp.right_shift(s_lo, 8 * c) & 0xFF) > 0) & valid
                 for c in range(4)]
                + [((jnp.right_shift(s_hi, 8 * c) & 0xFF) > 0) & valid
                   for c in range(4)])

    def leaves_and_push(sp, bits, refs, cnts, ax, is_lp):
        neg = jnp.where(ax == 0, dneg[0], jnp.where(ax == 1, dneg[1], dneg[2]))
        if dense:
            # Leaf-parent: child j IS sub-block j of pack row-group grp —
            # its lane offset 16*j is static, which is what permits the
            # zero-padding pack (Mosaic has no dynamic lane slicing).
            lp_b = is_lp != 0
            grp = refs[0]
            for j in range(8):
                @pl.when(lp_b & bits[j] & (cnts[j] > 0))
                def _(j=j, grp=grp):
                    test(dense_pack[pl.ds(grp * 8, 8),
                                    16 * j: 16 * j + 16], grp * 8)
        else:
            # Leaf tests in STATIC child order: each test is a running-min
            # update, so intra-visit order cannot change the result — the
            # near-to-far flip only ever mattered for stack pops (dropping
            # it removes 24 scalar selects per visit).
            for j in range(8):
                @pl.when(bits[j] & (cnts[j] > 0))
                def _(ref=refs[j], cnt=cnts[j]):
                    leaf(ref, cnt)
                    if EXP == "dup_leaf":  # cost probe: leaf tests twice
                        leaf(ref, cnt)     # idempotent running-min update

        # Inner pushes far-to-near, so the near child pops first.  Writes
        # are unconditional select(push, ...) RMWs — no scalar branches.
        # No bounds clamp: the build-time guard (accel/wide.py stack_need)
        # sizes WIDE_STACK_DEPTH for the dual worst case (14/level).
        for j in range(8):
            b = jnp.where(neg, bits[j], bits[7 - j])
            ref = jnp.where(neg, refs[j], refs[7 - j])
            cnt = jnp.where(neg, cnts[j], cnts[7 - j])
            push = b & (cnt == 0)
            stack[sp] = jnp.where(push, ref, stack[sp])
            sp = sp + push.astype(jnp.int32)
        return sp

    if nodes_per_visit == 1:
        def body(carry):
            # The current node rides in the loop carry (popped at the END
            # of the previous iteration).  Measured dead ends
            # (docs/PERF.md): a carry-the-near-child descent and a
            # prefetch-the-next-box carry both LOST to this plain pop —
            # their select chains cost more than the SMEM round trip they
            # saved, and dynamic-index vector loads are an issue-cost, not
            # a hidable latency.
            sp, node, it = carry
            refs, cnts, ax, is_lp = node_meta(node)
            boxes = node_boxes(node)              # (8, >=6): child boxes
            if EXP == "dup_load_pure":  # extra dynamic load, no syncs:
                b2 = node_boxes(jnp.maximum(node - 1, 0))
                # pad cols 6:8 are 0.0 by construction; data-dependent so
                # the compiler cannot fold the multiply away.
                boxes = boxes + b2[:, 6:7] * 7.0
            acc = slab8(boxes)
            s_lo, s_hi = vote(acc)
            bits = extract_bits(s_lo, s_hi)
            if EXP == "dup_slab":  # cost probe: slab work twice, unused —
                # folded with a runtime-never-true, compile-time-unprovable
                # predicate so the probe work can't be DCE'd.
                never = jnp.sum(slab8(boxes, bias=1.0)) == -12345
                bits = [b & (~never) for b in bits]
            if EXP == "dup_vote":  # cost probe: vote reduction+extract x2
                x_lo, x_hi = vote(acc + acc)
                never = (x_lo & x_hi) == -12345
                bits = [b & (~never) for b in bits]
            if EXP == "dup_reads":  # cost probe: child-record reads twice
                off = jnp.where(s_lo == -12345, 1, 0)  # runtime 0
                r2, c2_, a2, l2_ = node_meta(node + off)
                extra = a2
                for c in range(8):
                    extra = extra | r2[c] | c2_[c]
                never = extra == -12345
                bits = [b & (~never) for b in bits]
            if EXP == "dup_boxes":  # cost probe: (8,8) box load twice
                off = jnp.where(s_lo == -12345, 1, 0)
                b2 = node_boxes(node + off)
                never = (jnp.sum(b2[:, 0:1]) == 1.2345e-13)
                bits = [b & (~never) for b in bits]
            if EXP == "dup_boxes_static":  # same load, STATIC node index
                off = jnp.where(s_lo == -12345, 1.0, 0.0)
                b2 = node_boxes(0)
                never = (jnp.sum(b2[:, 0:1]) + off == 1.2345e-13)
                bits = [b & (~never) for b in bits]
            if EXP == "dup_slice":  # re-slice the loaded boxes into lo/hi
                l2 = [boxes[:, k:k + 1] + 1.0 for k in range(3)]
                h2 = [boxes[:, 3 + k:4 + k] + 1.0 for k in range(3)]
                acc2 = (l2[0] + l2[1] + l2[2] + h2[0] + h2[1] + h2[2])
                never = jnp.sum(acc2) == 1.2345e-13
                bits = [b & (~never) for b in bits]
            if EXP == "dup_branch":  # cost probe: 8 extra untaken branches
                for j in range(8):
                    @pl.when(bits[j] & (cnts[j] > -99999))
                    def _(j=j):
                        stack[stack.shape[0] - 1 - j] = jnp.int32(0)

            sp = leaves_and_push(sp, bits, refs, cnts, ax, is_lp)
            if EXP == "dup_push":  # cost probe: selects + RMW chain twice,
                sp2 = sp + 128     # shadowed into unused upper stack slots
                neg = jnp.where(ax == 0, dneg[0],
                                jnp.where(ax == 1, dneg[1], dneg[2]))
                for j in range(8):
                    b = jnp.where(neg, bits[j], bits[7 - j])
                    ref = jnp.where(neg, refs[j], refs[7 - j]) + 1
                    cnt = jnp.where(neg, cnts[j], cnts[7 - j])
                    push = b & (cnt == 0)
                    i2 = jnp.minimum(sp2, stack.shape[0] - 1)
                    stack[i2] = jnp.where(push, ref, stack[i2])
                    sp2 = sp2 + push.astype(jnp.int32)
            top = stack[jnp.maximum(sp - 1, 0)]
            nxt = jnp.where(sp > 0, top, jnp.int32(-1))
            sp = jnp.maximum(sp - 1, 0)
            return sp, nxt, it + 1

        fin = lax.while_loop(
            lambda c: (c[1] >= 0) & (c[2] < n_nodes + 8),
            body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        )
        visits = fin[2]
    else:
        assert nodes_per_visit == 2

        def body(carry):
            sp, na, nb, vis, it = carry
            vb = nb >= 0
            # Interleave the two nodes' chains: all scalar record reads and
            # both vector box loads issue first, then both slab/vote
            # blocks, so neither node's extracts stall an idle scalar unit.
            meta_a = node_meta(na)
            meta_b = node_meta(jnp.maximum(nb, 0))
            boxes_a = node_boxes(na)
            boxes_b = node_boxes(jnp.maximum(nb, 0))
            acc_a = slab8(boxes_a)
            acc_b = slab8(boxes_b)
            bits_a = extract_bits(*vote(acc_a))
            bits_b = extract_bits(*vote(acc_b), vb)
            sp = leaves_and_push(sp, bits_a, *meta_a)
            sp = leaves_and_push(sp, bits_b, *meta_b)
            top = stack[jnp.maximum(sp - 1, 0)]
            na2 = jnp.where(sp > 0, top, jnp.int32(-1))
            sp = jnp.maximum(sp - 1, 0)
            top = stack[jnp.maximum(sp - 1, 0)]
            nb2 = jnp.where(sp > 0, top, jnp.int32(-1))
            sp = jnp.maximum(sp - 1, 0)
            return sp, na2, nb2, vis + 1 + vb.astype(jnp.int32), it + 1

        fin = lax.while_loop(
            lambda c: (c[1] >= 0) & (c[4] < n_nodes + 8),
            body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(-1), jnp.int32(0),
             jnp.int32(0)),
        )
        visits = fin[3]

    if EXP == "count":  # visit-count probe (clobbers slot row 0)
        if visit_acc is not None:
            visit_acc[0] = visit_acc[0] + visits
        else:
            slot_out[0:1, :] = jnp.zeros_like(slot_out[0:1, :]) + visits


def wide_packet_traverse_dual(o, d, t_out, slot_out, stack, **kw):
    """:func:`wide_packet_traverse` processing TWO stack entries per
    iteration (VERDICT round-2 #1 suggestion: "process 2-4 nodes per
    scalar step").

    Stack entries are roots of DISJOINT subtrees, so popping two at once
    is order-free for the running-min/any-hit semantics (only culling
    tightness can differ — the second node is processed before the first
    node's leaf hits can shrink ``t``, the classic packet trade).  The
    point is latency, not work: each visit's pop → box-load → slab →
    vote-reduce → extract chain serializes the scalar unit against vector
    results (~0.9 µs of a 1.1 µs visit, docs/PERF.md §2); two independent
    chains interleaved give the scalar unit node B's work while node A's
    reductions drain.  The second node is masked (``valid``) when the
    stack holds fewer than two entries.  Equivalence is pinned by
    tests/test_pallas_traverse.py.
    """
    return wide_packet_traverse(o, d, t_out, slot_out, stack,
                                nodes_per_visit=2, **kw)


def packet_traverse(o, d, t_out, slot_out, stack, *,
                    node_f, node_i, tri, slot_base, n_nodes, on_hit=None):
    """Traverse one BVH for one ray block, updating best hits in place.

    ``o``/``d``       — 3-tuples of (R,C) component tiles.
    ``t_out``/``slot_out`` — refs holding the running best (pre-initialized).
    ``stack``         — SMEM (STACK_DEPTH,) int32 scratch.
    ``node_f(n,k)``   — scalar fetch of node float k (two child AABBs, 12).
    ``node_i(n,k)``   — scalar fetch of node int k ((ref,count) pairs, 4).
    ``tri(s)``        — scalar fetch tuple (v0, e1, e2) of 3-tuples for slot s.
    ``slot_base``     — added to local slots when writing winners (paging).
    ``on_hit(s, ok, u, v, e1, e2)`` — optional hook called per triangle test
    with the win mask and per-lane barycentrics; the fused radiance kernel
    uses it to capture shading attributes (normal, uv, tangent) at win time
    — the triangle's data is broadcast as scalars HERE, which is what makes
    gather-free mesh shading possible on Mosaic.
    """
    inv = safe_inv(d)
    slab_any = make_slab_any(o, inv, t_out)
    leaf = make_leaf_fn(o, d, t_out, slot_out, tri, slot_base, on_hit)

    def body(carry):
        sp, it = carry
        node = stack[sp - 1]
        sp = sp - 1
        c0, n0, c1, n1 = (node_i(node, 0), node_i(node, 1),
                          node_i(node, 2), node_i(node, 3))
        hit0, near0 = slab_any(
            node_f(node, 0), node_f(node, 1), node_f(node, 2),
            node_f(node, 3), node_f(node, 4), node_f(node, 5),
        )
        hit1, near1 = slab_any(
            node_f(node, 6), node_f(node, 7), node_f(node, 8),
            node_f(node, 9), node_f(node, 10), node_f(node, 11),
        )

        is_leaf0 = hit0 & (n0 > 0)
        is_inner0 = hit0 & (n0 == 0)
        is_leaf1 = hit1 & (n1 > 0)
        is_inner1 = hit1 & (n1 == 0)

        @pl.when(is_leaf0)
        def _():
            leaf(c0, n0)

        @pl.when(is_leaf1)
        def _():
            leaf(c1, n1)

        # Push inner children far-first so the block visits near first.
        # Conditional pushes are expressed as unconditional SMEM writes of
        # select(push, child, old) — cheaper than pl.when branches.
        both = is_inner0 & is_inner1
        near_is_0 = near0 <= near1
        first = jnp.where(both, jnp.where(near_is_0, c1, c0),
                          jnp.where(is_inner0, c0, c1))
        second = jnp.where(near_is_0, c0, c1)
        any_push = is_inner0 | is_inner1

        i0 = jnp.minimum(sp, STACK_DEPTH - 1)
        stack[i0] = jnp.where(any_push, first, stack[i0])
        i1 = jnp.minimum(sp + any_push.astype(jnp.int32), STACK_DEPTH - 1)
        stack[i1] = jnp.where(both, second, stack[i1])

        sp = jnp.minimum(
            sp + is_inner0.astype(jnp.int32) + is_inner1.astype(jnp.int32),
            STACK_DEPTH - 1,
        )
        return sp, it + 1

    stack[0] = 0
    lax.while_loop(
        lambda c: (c[0] > 0) & (c[1] < 4 * n_nodes + STACK_DEPTH),
        body,
        (jnp.int32(1), jnp.int32(0)),
    )
