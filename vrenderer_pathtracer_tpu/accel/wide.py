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
``ref``; count < 0 -> empty slot (its AABB is inverted so slab tests miss).
"""

from __future__ import annotations

import numpy as np

# Hard bound for the wide-traversal SMEM stack: each visit pops one entry
# and pushes at most 8, so the stack is bounded by 7 * depth + 1.
# collapse_bvh8 reports the actual depth; pack checks 7*depth+1 fits.
WIDE_STACK_DEPTH = 256

_EMPTY_BOX = (np.float32(3e38), np.float32(3e38), np.float32(3e38),
              np.float32(-3e38), np.float32(-3e38), np.float32(-3e38))


def _area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]


def collapse_bvh8(nodes_f: np.ndarray, nodes_i: np.ndarray):
    """Collapse a binary SBVH into 8-wide nodes.

    ``nodes_f``: [M,12] two child AABBs (lo0,hi0,lo1,hi1) per binary node.
    ``nodes_i``: [M,4] (c0,n0,c1,n1) child records (see accel/mesh.py).

    Returns ``(nodes8_f [N,48], nodes8_i [N,16], nodes8_ax [N], max_depth)``.
    Child boxes are stored as (lo3, hi3) per slot; empty slots carry an
    inverted box.  Greedy collapse: starting from a binary node's two
    children, repeatedly expand the largest-area inner child until eight
    slots are filled or only leaves remain.
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
                nodes8_i[w, 2 * c] = ref if cnt == 0 else ref
                nodes8_i[w, 2 * c + 1] = cnt
                if cnt == 0:
                    nodes8_i[w, 2 * c] = wide_of_bin[ref]
            else:
                nodes8_f[w * 8 + c, 0:6] = _EMPTY_BOX
                nodes8_i[w, 2 * c] = 0
                nodes8_i[w, 2 * c + 1] = -1
    if 7 * max_depth + 1 > WIDE_STACK_DEPTH:
        raise ValueError(
            f"BVH8 depth {max_depth} needs stack {7 * max_depth + 1} > "
            f"{WIDE_STACK_DEPTH}; rebuild with a shallower tree")
    return nodes8_f, nodes8_i, nodes8_ax, max_depth


def build_leaf_packs(n8i, v0, e1, e2, uvs6, tans9, slot_base=0):
    """8-aligned leaf blocks for the vector leaf phase.

    Rewrites the leaf refs of ``n8i`` (returned as a copy) to index a
    freshly-built pack where every leaf's MAX_LEAF slots start at a
    multiple of 8, so the kernel fetches a whole leaf as ONE (8,16)
    vector block.  Pack row = (v0[3], e1[3], e2[3], slot_base+slot,
    uv corners[6]); aux row = (tangent corners[9], zeros).  Zero padding
    rows are degenerate (det 0) and never hit.

    ``v0/e1/e2`` are [R,3] leaf-ordered triangle data, ``uvs6`` [R,6] uv
    corners, ``tans9`` [R,9] tangent corners; ``slot_base`` offsets the
    recorded winner slots (paged meshes use page*page_tris).
    """
    pack_rows = []
    aux_rows = []
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
                while len(pack_rows) % 8:
                    pack_rows.append(np.zeros(16, np.float32))
                    aux_rows.append(np.zeros(16, np.float32))
    tri_pack = (np.stack(pack_rows) if pack_rows
                else np.zeros((8, 16), np.float32))
    aux_pack = (np.stack(aux_rows) if aux_rows
                else np.zeros((8, 16), np.float32))
    return n8i, tri_pack, aux_pack
