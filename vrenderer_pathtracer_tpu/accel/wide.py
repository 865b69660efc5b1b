"""8-wide BVH collapse for the Pallas packet-traversal kernel.

The reference GPU traversal visits binary Aila/Laine nodes per thread
(``/root/reference/cuda/src/PathTracer.cu:269-463``); divergence costs are
hidden by the warp scheduler.  The TPU packet kernel has no scheduler to
hide behind: every node visit pays a serialized scalar-unit round trip
(child fetches, the block-wide any-hit vote, stack maintenance), so visit
COUNT — not FLOPs — dominates mixed hit/miss blocks.  Collapsing the binary
SBVH into an 8-wide BVH cuts inner-node visits ~2.3x on top of tiled ray
blocks (measured on the bench scene: 14.3k -> 6.2k visits for 512 blocks)
and lets the kernel amortize one vote round trip over eight children.

Children are sorted at build time by box centroid along the widest axis of
their union, and that axis is stored per node: the kernel then orders its
stack pushes near-to-far with a single scalar sign test instead of a
block-wide min-reduction per child (the CWBVH octant-order idea, reduced
to one axis).

Encoding (``nodes8_i[n] = 8 x (ref, count)``): count 0 -> inner child,
``ref`` is a wide-node id; count > 0 -> leaf of ``count`` tri slots at
``ref``; count < 0 -> empty slot.  Empty slots are EXCLUDED by the count
gates in every consumer (leaf calls need count > 0, pushes need count ==
0) — NOT by their inverted AABB: the min/max-swapped slab test reports a
hit for an inverted box, so a consumer reading the vote bits without a
count gate would descend phantom children.
"""

from __future__ import annotations

import numpy as np

# Hard bound for the wide-traversal SMEM stack.  The DUAL traversal
# (pallas_common, nodes_per_visit=2 — the default packet/paged path) pops
# two entries and pushes up to 16 per iteration; a complete 8-ary tree
# measures max occupancy 14*depth - 6 (simulated, tests/test_wide.py), so
# the build-time guard requires stack_need(depth) = 14*depth + 8 entries
# (the single-node bound is the classic 7*depth + 1, strictly smaller).
# 544 int32s = ~2.1KB of SMEM scratch — noise next to the ~1MB budget.
WIDE_STACK_DEPTH = 544


def stack_need(max_depth: int) -> int:
    """SMEM stack entries needed to traverse a tree of ``max_depth`` wide
    levels with the dual-node body (worst case ~14 residual entries per
    level; +8 headroom over the measured complete-tree peak)."""
    return 14 * max_depth + 8


def _check_depth(max_depth: int, kind: str) -> None:
    if stack_need(max_depth) > WIDE_STACK_DEPTH:
        raise ValueError(
            f"{kind} BVH8 depth {max_depth} needs stack "
            f"{stack_need(max_depth)} > {WIDE_STACK_DEPTH}; rebuild with a "
            f"shallower tree")

_EMPTY_BOX = (np.float32(3e38), np.float32(3e38), np.float32(3e38),
              np.float32(-3e38), np.float32(-3e38), np.float32(-3e38))


def _area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]


def _sah_wide_forest(nodes_f, nodes_i, c_node=1.0, c_leaf=0.25):
    """SAH-optimal 8-wide grouping (Ylitie et al. 2017 style DP).

    For every binary node ``b`` and slot budget ``i`` in 1..8, compute the
    minimum expected traversal cost of representing subtree(b) as a forest
    of at most ``i`` wide-node child slots:

      CC(leaf entity, i)  = A(leaf) * c_leaf            (one slot)
      D(b, j)             = min_k CC(left, k) + CC(right, j-k)
      CC(inner b, 1)      = A(b) * c_node + D(b, 8)     (close: a wide node)
      CC(inner b, i > 1)  = min(CC(b, 1), D(b, i))

    ``c_node`` is the cost of one block-synchronous wide-node visit,
    ``c_leaf`` one vector leaf-block test (~157 of ~633 ns measured,
    docs/PERF.md round 3; MAX_LEAF=8 means every leaf is one block).  The
    greedy largest-area expansion this replaces is the same cost model
    optimized locally; the DP is globally optimal for it.

    Returns ``slots_of[b]`` — for each binary node that becomes a wide
    node, its list of (lo, hi, ref, cnt) child slots — keyed by binary id.
    """
    m = nodes_i.shape[0]
    # Child entities per binary node: (lo, hi, ref, cnt) with cnt>0 leaf.
    ch = [[], []]
    area_b = np.empty(m, np.float64)
    for b in range(m):
        f = nodes_f[b]
        lo = np.minimum(f[0:3], f[6:9])
        hi = np.maximum(f[3:6], f[9:12])
        # An empty child carries an inverted box; union with the live one.
        if nodes_i[b, 1] < 0:
            lo, hi = f[6:9], f[9:12]
        elif nodes_i[b, 3] < 0:
            lo, hi = f[0:3], f[3:6]
        area_b[b] = _area(lo, hi)

    # Bottom-up DP, VECTORIZED BY TREE LEVEL (children have larger ids
    # than parents — emission order — so levels computed in one reverse
    # pass; all nodes of a level are independent).  The per-node Python
    # version cost ~2.4 s at 28.5k tris; this runs in ~tens of ms.
    cc = np.full((m, 9), np.inf)      # cc[b, i] for inner subtree b
    dd = np.full((m, 9), np.inf)
    split_k = np.zeros((m, 9), np.int8)

    level = np.zeros(m, np.int32)
    for b in range(m - 1, -1, -1):
        lv = 0
        if nodes_i[b, 1] == 0:
            lv = max(lv, level[nodes_i[b, 0]] + 1)
        if nodes_i[b, 3] == 0:
            lv = max(lv, level[nodes_i[b, 2]] + 1)
        level[b] = lv

    # Per-child leaf costs (cnt > 0): area * c_leaf (MAX_LEAF=8: 1 block).
    refs = nodes_i[:, [0, 2]].astype(np.int64)
    cnts = nodes_i[:, [1, 3]]
    lo01 = np.stack([nodes_f[:, 0:3], nodes_f[:, 6:9]], axis=1)
    hi01 = np.stack([nodes_f[:, 3:6], nodes_f[:, 9:12]], axis=1)
    d01 = np.maximum(hi01 - lo01, 0.0).astype(np.float64)
    area01 = (d01[..., 0] * d01[..., 1] + d01[..., 1] * d01[..., 2]
              + d01[..., 2] * d01[..., 0])                   # [m, 2]
    for lv in range(int(level.max()) + 1 if m else 0):
        ids = np.nonzero(level == lv)[0]
        if ids.size == 0:
            continue
        # Child cost tables [n, 2, 9]: leaf children broadcast their leaf
        # cost; inner children read cc[ref] (already final: deeper level).
        ch = np.empty((ids.size, 2, 9))
        for s in range(2):
            is_leaf = cnts[ids, s] > 0
            ch[:, s, :] = np.where(
                is_leaf[:, None], (area01[ids, s] * c_leaf)[:, None],
                cc[refs[ids, s] * (cnts[ids, s] == 0)])
        have0 = cnts[ids, 0] >= 0
        have1 = cnts[ids, 1] >= 0
        both = have0 & have1
        single_side = np.where(have0, 0, 1)
        for j in range(2, 9):
            ks = np.arange(1, j)
            vals = ch[:, 0, ks] + ch[:, 1, j - ks]          # [n, j-1]
            k = np.argmin(vals, axis=1)
            dd[ids, j] = np.where(both, vals[np.arange(ids.size), k],
                                  ch[np.arange(ids.size), single_side, j])
            split_k[ids, j] = np.where(both, k + 1, 0)
        dd[ids, 1] = np.where(both, np.inf,
                              ch[np.arange(ids.size), single_side, 1])
        split_k[ids, 1] = 0
        close = area_b[ids] * c_node + dd[ids, 8]
        cc[ids, 1] = close
        for i in range(2, 9):
            cc[ids, i] = np.minimum(close, dd[ids, i])

    # Reconstruction: collect the slots of each wide node.
    def collect(b, budget, out):
        """Slots for subtree(b) under ``budget`` (distribute or close)."""
        if budget == 1 or cc[b, 1] <= dd[b, budget]:
            # Close: b is ONE wide-node slot (parent records an inner ref).
            out.append(("inner", b))
            return
        _distribute(b, budget, out)

    def _distribute(b, budget, out):
        have0 = nodes_i[b, 1] >= 0
        have1 = nodes_i[b, 3] >= 0
        k = int(split_k[b, budget])
        sides = ((0, k), (1, budget - k)) if (have0 and have1) else \
            (((0 if have0 else 1), budget),)
        for side, bud in sides:
            ref = int(nodes_i[b, 2 * side])
            cnt = int(nodes_i[b, 2 * side + 1])
            f = nodes_f[b]
            lo, hi = (f[0:3], f[3:6]) if side == 0 else (f[6:9], f[9:12])
            if cnt > 0:
                out.append(("leaf", (lo, hi, ref, cnt)))
            else:
                sub = []
                collect(ref, bud, sub)
                # Tag inner slots with the box stored in THEIR parent when
                # they close exactly here.
                for kind, val in sub:
                    if kind == "inner" and val == ref:
                        out.append(("inner_box", (lo, hi, ref)))
                    else:
                        out.append((kind, val))

    slots_of = {}
    boxes_of_inner = {}

    def box_of(b):
        """Box of binary node b as stored in its parent (fallback: union
        of its children boxes)."""
        if b in boxes_of_inner:
            return boxes_of_inner[b]
        f = nodes_f[b]
        lo = np.minimum(f[0:3], f[6:9])
        hi = np.maximum(f[3:6], f[9:12])
        if nodes_i[b, 1] < 0:
            lo, hi = f[6:9], f[9:12]
        elif nodes_i[b, 3] < 0:
            lo, hi = f[0:3], f[3:6]
        return lo, hi

    work = [0]
    seen = {0}
    while work:
        b = work.pop()
        out = []
        _distribute(b, 8, out)
        slots = []
        for kind, val in out:
            if kind == "leaf":
                slots.append(val)
            else:
                if kind == "inner_box":
                    lo, hi, ref = val
                    boxes_of_inner[ref] = (lo, hi)
                else:
                    ref = val
                    lo, hi = box_of(ref)
                slots.append((lo, hi, int(ref), 0))
                if ref not in seen:
                    seen.add(ref)
                    work.append(int(ref))
        slots_of[b] = slots
    return slots_of


def collapse_bvh8(nodes_f: np.ndarray, nodes_i: np.ndarray, mode="greedy"):
    """Collapse a binary SBVH into 8-wide nodes.

    ``nodes_f``: [M,12] two child AABBs (lo0,hi0,lo1,hi1) per binary node.
    ``nodes_i``: [M,4] (c0,n0,c1,n1) child records (see accel/mesh.py).

    Returns ``(nodes8_f [N,48], nodes8_i [N,16], nodes8_ax [N], max_depth)``.
    Child boxes are stored as (lo3, hi3) per slot; empty slots carry an
    inverted box (cosmetic only — exclusion is by count, see module doc).

    ``mode``: "greedy" — starting from a binary node's two children,
    repeatedly expand the largest-area inner child until eight slots are
    filled or only leaves remain; "sah" — the globally SAH-optimal DP
    grouping (:func:`_sah_wide_forest`).
    """
    nodes_f = np.asarray(nodes_f, np.float32)
    nodes_i = np.asarray(nodes_i, np.int64)

    def bin_children(b):
        """Binary node b -> list of (lo, hi, ref, count); empties dropped."""
        f = nodes_f[b]
        c0, n0, c1, n1 = nodes_i[b]
        out = []
        if n0 >= 0:
            out.append((f[0:3], f[3:6], int(c0), int(n0)))
        if n1 >= 0:
            out.append((f[6:9], f[9:12], int(c1), int(n1)))
        return out

    if mode == "sah":
        sah_slots = _sah_wide_forest(nodes_f, nodes_i)
        # Emit wide nodes in DFS order with the same structures greedy uses.
        wide_children = []
        wide_of_bin = {}
        order = [0]
        wide_of_bin[0] = 0
        wide_children.append(None)
        depth_of = {0: 1}
        max_depth = 1
        while order:
            b = order.pop()
            w = wide_of_bin[b]
            slots = sah_slots[b]
            for lo, hi, ref, cnt in slots:
                if cnt == 0:
                    wid = len(wide_children)
                    wide_of_bin[ref] = wid
                    wide_children.append(None)
                    depth_of[wid] = depth_of[w] + 1
                    max_depth = max(max_depth, depth_of[wid])
                    order.append(ref)
            wide_children[w] = slots
    else:
        wide_children = []   # per wide node: list of (lo, hi, ref, count)
        wide_of_bin = {}     # binary node id -> wide node id
        order = [0]
        wide_of_bin[0] = 0
        wide_children.append(None)
        depth_of = {0: 1}
        max_depth = 1
        while order:
            b = order.pop()
            w = wide_of_bin[b]
            slots = bin_children(b)
            # Greedy: expand the largest-area inner child while room remains.
            while len(slots) < 8:
                best, best_a = -1, -1.0
                for i, (lo, hi, ref, cnt) in enumerate(slots):
                    if cnt == 0:
                        a = _area(lo, hi)
                        if a > best_a:
                            best, best_a = i, a
                if best < 0:
                    break
                lo, hi, ref, cnt = slots.pop(best)
                sub = bin_children(ref)
                if len(slots) + len(sub) > 8:
                    slots.append((lo, hi, ref, cnt))
                    break
                slots.extend(sub)
            # Recurse into remaining inner children.
            for lo, hi, ref, cnt in slots:
                if cnt == 0:
                    wid = len(wide_children)
                    wide_of_bin[ref] = wid
                    wide_children.append(None)
                    depth_of[wid] = depth_of[w] + 1
                    max_depth = max(max_depth, depth_of[wid])
                    order.append(ref)
            wide_children[w] = slots

    n = len(wide_children)
    # Box layout [n*8, 8]: row w*8+c = child c's (lo3, hi3, pad2).  The
    # kernel loads a node's eight boxes as ONE aligned (8,8) vector block
    # (sublane start w*8 is a multiple of 8) — zero scalar box fetches.
    nodes8_f = np.empty((n * 8, 8), np.float32)
    nodes8_f[:, 6:8] = 0.0
    nodes8_i = np.empty((n, 16), np.int32)
    nodes8_ax = np.empty((n,), np.int32)
    for w, slots in enumerate(wide_children):
        lo_all = np.min([s[0] for s in slots], axis=0)
        hi_all = np.max([s[1] for s in slots], axis=0)
        ax = int(np.argmax(hi_all - lo_all))
        nodes8_ax[w] = ax
        slots = sorted(slots, key=lambda s: float(s[0][ax] + s[1][ax]))
        for c in range(8):
            if c < len(slots):
                lo, hi, ref, cnt = slots[c]
                nodes8_f[w * 8 + c, 0:3] = lo
                nodes8_f[w * 8 + c, 3:6] = hi
                nodes8_i[w, 2 * c] = wide_of_bin[ref] if cnt == 0 else ref
                nodes8_i[w, 2 * c + 1] = cnt
            else:
                nodes8_f[w * 8 + c, 0:6] = _EMPTY_BOX
                nodes8_i[w, 2 * c] = 0
                nodes8_i[w, 2 * c + 1] = -1
    _check_depth(max_depth, "collapsed")
    return nodes8_f, nodes8_i, nodes8_ax, max_depth


def sweep_sah_boxes(lo: np.ndarray, hi: np.ndarray):
    """Binary sweep-SAH BVH over [N] prim boxes (numpy host build).

    Same node encoding as the native SBVH (``csrc/sbvh.cc``): ``nodes_f``
    [M,12] two child AABBs, ``nodes_i`` [M,4] (ref,count) pairs; leaves are
    single prims (ref=prim id, count=1).  Used for the per-page block BVHs
    of the dense paged format, where prims are 8-triangle sub-blocks —
    N is a few hundred, so a Python build is fine.
    """
    n = lo.shape[0]
    nodes_f, nodes_i = [], []

    def emit(ids):
        my = len(nodes_f)
        nodes_f.append(np.zeros(12, np.float32))
        nodes_i.append(np.zeros(4, np.int32))

        def child(sub):
            clo, chi = lo[sub].min(axis=0), hi[sub].max(axis=0)
            if len(sub) == 1:
                return clo, chi, int(sub[0]), 1
            return clo, chi, emit(sub), 0

        if len(ids) == 1:
            # Root-only degenerate: single prim as child 0, empty child 1.
            c = child(ids)
            nodes_f[my][0:3], nodes_f[my][3:6] = c[0], c[1]
            nodes_f[my][6:9], nodes_f[my][9:12] = 1.0, -1.0
            nodes_i[my][:] = (c[2], c[3], 0, -1)
            return my
        cent = (lo[ids] + hi[ids]) * 0.5
        best = None  # (cost, axis, k, order)
        for ax in range(3):
            order = ids[np.argsort(cent[:, ax], kind="stable")]
            llo = np.minimum.accumulate(lo[order], axis=0)
            lhi = np.maximum.accumulate(hi[order], axis=0)
            rlo = np.minimum.accumulate(lo[order][::-1], axis=0)[::-1]
            rhi = np.maximum.accumulate(hi[order][::-1], axis=0)[::-1]

            def area(a, b):
                d = np.maximum(b - a, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            m = len(order)
            cost = (area(llo, lhi)[: m - 1] * np.arange(1, m)
                    + area(rlo, rhi)[1:] * np.arange(m - 1, 0, -1))
            k = int(np.argmin(cost))
            if best is None or cost[k] < best[0]:
                best = (cost[k], ax, k, order)
        _, _, k, order = best
        c0 = child(order[: k + 1])
        c1 = child(order[k + 1:])
        nodes_f[my][0:3], nodes_f[my][3:6] = c0[0], c0[1]
        nodes_f[my][6:9], nodes_f[my][9:12] = c1[0], c1[1]
        nodes_i[my][:] = (c0[2], c0[3], c1[2], c1[3])
        return my

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * n + 64))
    try:
        emit(np.arange(n))
    finally:
        sys.setrecursionlimit(old)
    return np.stack(nodes_f), np.stack(nodes_i)


def build_dense_page_py(v0, e1, e2, uvs6, slot_base=0):
    """Dense page format for the paged kernel: zero lane padding on tris.

    Triangles (already Morton-ordered) are grouped into 8-tri SUB-BLOCKS;
    a binary sweep-SAH BVH over sub-block boxes is collapsed 8-wide; then
    every wide node's sub-block children are bundled under LEAF-PARENT
    nodes whose 8 children are the 8 sub-blocks of one dense (8,128) pack
    row-group — sub-block j lives at lanes [16j, 16j+16), so the kernel
    extracts it with a STATIC lane slice (Mosaic cannot reshape lanes to
    sublanes, and dynamic lane offsets are unsupported; static per-child
    offsets are the one layout that allows dense rows).

    Returns ``(nodes8_i [N,18] int32, nodes8_f [N*8,8] f32, pack
    [B*8,128] f32, max_depth)``.  ``nodes8_i`` row = 8 x (ref,count) +
    axis (col 16) + is_leaf_parent (col 17).  For a leaf-parent, col 0 =
    its pack row-group index r (rows r*8..r*8+8), and child j's count is
    8 (tris padded with degenerate zero rows) or -1 (empty slot, inverted
    box).  Pack row layout: tri i of sub-block j at row i, comp k at lane
    16j+k; comps = (v0, e1, e2, slot_base+slot, uv corners) as in
    ``build_leaf_packs``.
    """
    r = v0.shape[0]
    nsb = -(-r // 8)
    # Sub-block boxes from real tris (v0, v0+e1, v0+e2 corners).
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # [r,3,3]
    sb_lo = np.full((nsb, 3), 3e38, np.float32)
    sb_hi = np.full((nsb, 3), -3e38, np.float32)
    for j in range(nsb):
        p = pts[8 * j: 8 * j + 8].reshape(-1, 3)
        sb_lo[j], sb_hi[j] = p.min(axis=0), p.max(axis=0)

    bf, bi = sweep_sah_boxes(sb_lo, sb_hi)
    n8f, n8i, n8ax, max_depth = collapse_bvh8(bf, bi)

    # Bundle sub-block children under leaf-parents.  A node whose children
    # are ALL sub-blocks becomes a leaf-parent itself (no extra level); a
    # mixed node's sub-block children move under one appended leaf-parent.
    #
    # Leaf-parents then BIN-PACK into shared pack row-groups: an LP with m
    # sub-blocks claims m consecutive lane slots of some group (first-fit
    # decreasing), and its children sit at child positions == its assigned
    # lane slots (leaf order within a node is irrelevant — any-hit bits are
    # already fixed — so child positions are free).  One group per LP left
    # groups ~1/3 full and the pack is ~90% of every page DMA; shared
    # groups pack them ~full.  Every slot of an LP (members AND empties)
    # carries ref = grp so the kernel's ``grp = refs[0]`` read works from
    # any position.
    n = n8i.shape[0]
    rows_f = [n8f[8 * w: 8 * w + 8].copy() for w in range(n)]
    rows_i = [n8i[w].copy() for w in range(n)]
    rows_ax = [int(n8ax[w]) for w in range(n)]
    rows_lp = [0] * n
    lps = []  # (node_id, [(sub_block_id, lo, hi), ...])
    any_bundled = False

    for w in range(n):
        rec = rows_i[w]
        sub_slots = [(c, int(rec[2 * c]))
                     for c in range(8) if rec[2 * c + 1] > 0]
        if not sub_slots:
            continue
        inner = [c for c in range(8) if rec[2 * c + 1] == 0]
        members = [(sid, rows_f[w][c, 0:3].copy(), rows_f[w][c, 3:6].copy())
                   for c, sid in sub_slots]
        if not inner:
            # Pure leaf node -> leaf-parent in place (slots rewritten below).
            rows_lp[w] = 1
            lps.append((w, members))
        else:
            # Mixed: bundle sub-blocks under one appended leaf-parent.
            wid = len(rows_i)
            rows_f.append(np.empty((8, 8), np.float32))
            rows_i.append(np.zeros(18, np.int32))
            rows_ax.append(0)
            rows_lp.append(1)
            lps.append((wid, members))
            first = sub_slots[0][0]
            rec[2 * first] = wid
            rec[2 * first + 1] = 0
            rows_f[w][first, 0:3] = np.min([m[1] for m in members], axis=0)
            rows_f[w][first, 3:6] = np.max([m[2] for m in members], axis=0)
            for c, _ in sub_slots[1:]:
                rows_f[w][c, 0:6] = _EMPTY_BOX
                rec[2 * c] = 0
                rec[2 * c + 1] = -1
            any_bundled = True

    # First-fit decreasing over group capacity 8 (stable: ties by node id).
    order = sorted(range(len(lps)), key=lambda i: (-len(lps[i][1]), i))
    group_fill = []
    placement = {}  # lp index -> (grp, lane offset)
    for i in order:
        m = len(lps[i][1])
        for g, fill in enumerate(group_fill):
            if fill + m <= 8:
                placement[i] = (g, fill)
                group_fill[g] = fill + m
                break
        else:
            placement[i] = (len(group_fill), 0)
            group_fill.append(m)

    pack = np.zeros((max(len(group_fill), 1) * 8, 128), np.float32)
    for i, (w, members) in enumerate(lps):
        grp, off = placement[i]
        f = rows_f[w]
        rec = rows_i[w]
        f[:, 0:3] = 3e38
        f[:, 3:6] = -3e38
        f[:, 6:8] = 0.0
        rec[0:16:2] = grp
        rec[1:16:2] = -1
        for k, (sid, lo, hi) in enumerate(members):
            j = off + k
            f[j, 0:3], f[j, 3:6] = lo, hi
            rec[2 * j + 1] = 8
            for t in range(8):
                s = sid * 8 + t
                if s >= r:
                    break
                row = pack[grp * 8 + t]
                row[16 * j + 0: 16 * j + 3] = v0[s]
                row[16 * j + 3: 16 * j + 6] = e1[s]
                row[16 * j + 6: 16 * j + 9] = e2[s]
                row[16 * j + 9] = float(slot_base + s)
                row[16 * j + 10: 16 * j + 16] = uvs6[s]

    max_depth += int(any_bundled)  # bundled leaf-parents add one level
    nodes8_i = np.zeros((len(rows_i), 18), np.int32)
    for w, rec in enumerate(rows_i):
        nodes8_i[w, : rec.shape[0]] = rec
        nodes8_i[w, 16] = rows_ax[w]
        nodes8_i[w, 17] = rows_lp[w]
    nodes8_f = np.concatenate(rows_f, axis=0)
    _check_depth(max_depth, "dense")
    return nodes8_i, nodes8_f, pack, max_depth


def build_dense_page(v0, e1, e2, uvs6, slot_base=0):
    """Dense page build — native fast path (csrc/dense.cc) with the numpy
    reference implementation as fallback and test oracle.  The trees may
    differ in SAH tie-breaks; both satisfy the invariants tests check and
    the traversal contract."""
    try:
        from vrenderer_pathtracer_tpu.native import build_dense_page_native

        n8i, n8f, pack, depth = build_dense_page_native(
            v0, e1, e2, uvs6, slot_base)
    except (OSError, AttributeError):  # stale library: rebuild-free fallback
        return build_dense_page_py(v0, e1, e2, uvs6, slot_base)
    _check_depth(depth, "dense")
    return n8i, n8f, pack, depth


def lane_undense_pack16(dense: np.ndarray) -> np.ndarray:
    """Inverse of :func:`lane_dense_pack16`: [G*8,128] -> [G*64,16]."""
    g = dense.shape[0] // 8
    return dense.reshape(g, 8, 8, 16).transpose(0, 2, 1, 3).reshape(-1, 16)


def woop_pack_from_mt(tri_pack16: np.ndarray) -> np.ndarray:
    """Convert a [T8,16] Möller–Trumbore leaf pack (pre-densified layout)
    to the Woop unit-triangle layout: A^{-1} rows (cols 0:9, A = [e1 e2 n],
    n = e1 x e2), -A^{-1} v0 (cols 9:12), slot (col 12).  Degenerate
    padding rows keep all-zero transforms (d'_z = 0 -> NaN t -> no hit).
    Experiment plumbing for traverse_packets(leaf_test="woop")."""
    out = np.zeros_like(tri_pack16)
    v0 = tri_pack16[:, 0:3]
    e1 = tri_pack16[:, 3:6]
    e2 = tri_pack16[:, 6:9]
    n = np.cross(e1, e2)
    a = np.stack([e1, e2, n], axis=2)          # [R,3,3] columns e1,e2,n
    det = np.linalg.det(a)
    good = np.abs(det) > 1e-30
    inv = np.zeros_like(a)
    if good.any():
        inv[good] = np.linalg.inv(a[good])
    out[:, 0:9] = inv.reshape(-1, 9)
    out[:, 9:12] = -np.einsum("rij,rj->ri", inv, v0)
    out[:, 12] = tri_pack16[:, 9]
    return out


def lane_dense_boxes(nodes8_f: np.ndarray) -> np.ndarray:
    """[N*8, 8] child-box blocks -> lane-dense [ceil(N/16)*8, 128].

    A [M,8] f32 VMEM array physically pads its 8 lanes to 128 (16x waste);
    packing 16 nodes per (8,128) tile — node n's block at rows
    (n//16)*8..+8, lanes 8*(n%16)..+8 — moves zero padding.  The kernel
    extracts a node with one dynamic lane ROTATE (pltpu.roll), the same
    trick the paged page format uses (accel/paged.py).  Node 0 stays at
    rows 0:8 lanes 0:8, so root_exit_clamp_wide reads it unchanged.
    """
    n = nodes8_f.shape[0] // 8
    nt = -(-n // 16)
    padded = np.zeros((nt * 16, 8, 8), np.float32)
    padded[:n] = nodes8_f.reshape(n, 8, 8)
    # [nt,16,8,8] -> tile rows = box rows, lanes = 16 nodes side by side
    return (padded.reshape(nt, 16, 8, 8).transpose(0, 2, 1, 3)
            .reshape(nt * 8, 128))


def lane_dense_pack16(pack16: np.ndarray) -> np.ndarray:
    """[T8,16] leaf blocks -> lane-dense [ceil(T8/64)*8, 128].

    Leaf block l (old rows l*8..+8) lands at rows (l//8)*8..+8, lanes
    16*(l%8)..+16; extraction is a dynamic sublane slice + dynamic lane
    rotate.  Same 8x VMEM saving as the boxes (16 lanes padded to 128).
    """
    nb = pack16.shape[0] // 8
    nbp = -(-nb // 8) * 8
    p = np.zeros((nbp, 8, 16), pack16.dtype)
    p[:nb] = pack16.reshape(nb, 8, 16)
    return (p.reshape(nbp // 8, 8, 8, 16).transpose(0, 2, 1, 3)
            .reshape(-1, 128))


def build_leaf_packs(n8i, v0, e1, e2, uvs6, tans9, slot_base=0, nrms9=None):
    """8-aligned leaf blocks for the vector leaf phase.

    Rewrites the leaf refs of ``n8i`` (returned as a copy) to index a
    freshly-built pack where every leaf's MAX_LEAF slots start at a
    multiple of 8, so the kernel fetches a whole leaf as ONE (8,16)
    vector block.  Pack row = (v0[3], e1[3], e2[3], slot_base+slot,
    uv corners[6]); aux row = (tangent corners[9], zeros).  Zero padding
    rows are degenerate (det 0) and never hit.

    ``v0/e1/e2`` are [R,3] leaf-ordered triangle data, ``uvs6`` [R,6] uv
    corners, ``tans9`` [R,9] tangent corners; ``slot_base`` offsets the
    recorded winner slots (paged meshes use page*page_tris).  With
    ``nrms9`` ([R,9] per-corner normals) a third pack is returned for
    win-time smooth-normal capture (normal-mapped scenes).
    """
    pack_rows = []
    aux_rows = []
    nrm_rows = []
    n8i = n8i.copy()
    for w in range(n8i.shape[0]):
        for c in range(8):
            ref, cnt = n8i[w, 2 * c], n8i[w, 2 * c + 1]
            if cnt > 0:
                n8i[w, 2 * c] = len(pack_rows)
                for j in range(cnt):
                    s = ref + j
                    row = np.zeros(16, np.float32)
                    row[0:3] = v0[s]
                    row[3:6] = e1[s]
                    row[6:9] = e2[s]
                    row[9] = float(slot_base + s)
                    row[10:16] = uvs6[s]
                    pack_rows.append(row)
                    arow = np.zeros(16, np.float32)
                    arow[0:9] = tans9[s]
                    aux_rows.append(arow)
                    if nrms9 is not None:
                        nrow = np.zeros(16, np.float32)
                        nrow[0:9] = nrms9[s]
                        nrm_rows.append(nrow)
                while len(pack_rows) % 8:
                    pack_rows.append(np.zeros(16, np.float32))
                    aux_rows.append(np.zeros(16, np.float32))
                    if nrms9 is not None:
                        nrm_rows.append(np.zeros(16, np.float32))
    tri_pack = (np.stack(pack_rows) if pack_rows
                else np.zeros((8, 16), np.float32))
    aux_pack = (np.stack(aux_rows) if aux_rows
                else np.zeros((8, 16), np.float32))
    if nrms9 is None:
        return n8i, tri_pack, aux_pack
    nrm_pack = (np.stack(nrm_rows) if nrm_rows
                else np.zeros((8, 16), np.float32))
    return n8i, tri_pack, aux_pack, nrm_pack
