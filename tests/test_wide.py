"""Host-side invariants of the 8-wide collapse and dense page builder
(accel/wide.py) — pure numpy, no device needed.
"""

import numpy as np

from vrenderer_pathtracer_tpu.accel.wide import (
    WIDE_STACK_DEPTH, build_dense_page, stack_need, sweep_sah_boxes)


def _tris(n, seed=0, extent=10.0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    v0 = c + 0.2 * rng.standard_normal((n, 3)).astype(np.float32)
    e1 = 0.5 * rng.standard_normal((n, 3)).astype(np.float32)
    e2 = 0.5 * rng.standard_normal((n, 3)).astype(np.float32)
    return v0, e1, e2


def test_sweep_sah_boxes_partitions_prims():
    rng = np.random.default_rng(1)
    lo = rng.uniform(-5, 5, (97, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.1, 1.0, (97, 3)).astype(np.float32)
    nf, ni = sweep_sah_boxes(lo, hi)
    seen = []

    def walk(node):
        c0, n0, c1, n1 = ni[node]
        for c, n, f0 in ((c0, n0, 0), (c1, n1, 6)):
            if n == 1:
                seen.append(int(c))
                # child box == prim box
                np.testing.assert_allclose(nf[node][f0:f0 + 3], lo[c])
                np.testing.assert_allclose(nf[node][f0 + 3:f0 + 6], hi[c])
            elif n == 0:
                walk(int(c))

    walk(0)
    assert sorted(seen) == list(range(97))


def test_build_dense_page_covers_every_triangle():
    n = 613  # not a multiple of 8 or 64
    v0, e1, e2 = _tris(n, seed=2)
    uvs6 = np.zeros((n, 6), np.float32)
    n8i, n8f, pack, depth = build_dense_page(v0, e1, e2, uvs6, slot_base=100)
    assert n8i.shape[1] == 18 and n8f.shape == (n8i.shape[0] * 8, 8)
    assert pack.shape[1] == 128 and pack.shape[0] % 8 == 0

    # Walk the tree: collect (group, sub-block) reachable via leaf-parents.
    slots = []
    stack = [0]
    visited = set()
    while stack:
        w = stack.pop()
        assert w not in visited, "node graph must be acyclic"
        visited.add(w)
        rec = n8i[w]
        if rec[17]:  # leaf-parent
            grp = int(rec[0])
            for j in range(8):
                if rec[2 * j + 1] > 0:
                    assert rec[2 * j] == grp, "one pack group per leaf-parent"
                    blk = pack[grp * 8: grp * 8 + 8, 16 * j: 16 * j + 16]
                    box_lo = n8f[w * 8 + j, 0:3]
                    box_hi = n8f[w * 8 + j, 3:6]
                    for row in blk:
                        sv0, se1, se2, slot = row[0:3], row[3:6], row[6:9], row[9]
                        if not np.any(np.cross(se1, se2)):
                            continue  # padding row
                        slots.append(int(slot) - 100)
                        for pt in (sv0, sv0 + se1, sv0 + se2):
                            assert (pt >= box_lo - 1e-3).all()
                            assert (pt <= box_hi + 1e-3).all()
        else:
            for j in range(8):
                if rec[2 * j + 1] == 0:  # inner child (never node 0)
                    stack.append(int(rec[2 * j]))
    # Every triangle appears exactly once with its global slot.
    assert sorted(slots) == list(range(n))
    assert 7 * depth + 1 <= 256


def test_build_dense_page_empty_subblock_boxes_inverted():
    v0, e1, e2 = _tris(40, seed=3)
    n8i, n8f, pack, _ = build_dense_page(
        v0, e1, e2, np.zeros((40, 6), np.float32))
    for w in range(n8i.shape[0]):
        for j in range(8):
            if n8i[w, 2 * j + 1] < 0:  # empty slot
                assert (n8f[w * 8 + j, 0:3] > n8f[w * 8 + j, 3:6]).all()


def _sim_dual_stack(children):
    """Worst-case (every child hits) stack occupancy of the DUAL traversal
    discipline (pallas_common, nodes_per_visit=2): pop two entries, push
    all inner children of both, far-to-near order irrelevant for the
    bound.  Mirrors the kernel's pop-at-end-of-iteration shape."""
    stack, maxsp = [], 0
    na, nb = 0, None
    while na is not None:
        for n in (na, nb):
            if n is None:
                continue
            stack.extend(reversed(children.get(n, [])))
        maxsp = max(maxsp, len(stack))
        na = stack.pop() if stack else None
        nb = stack.pop() if stack else None
    return maxsp


def test_dual_stack_bound_complete_trees():
    """stack_need() covers the dual traversal's worst case: a complete
    8-ary tree measures max occupancy 14*depth - 6, and no simulated
    random shape beats ~14 entries per level (the guard the ADVICE
    round-3 medium finding asked for — the old 7*depth+1 single-node
    bound underestimates the dual body's 16-push/2-pop iterations)."""
    for depth in range(1, 7):
        children, nid = {}, [0]

        def build(n, d):
            if d == 0:
                return
            kids = []
            for _ in range(8):
                nid[0] += 1
                kids.append(nid[0])
            children[n] = kids
            for k in kids:
                build(k, d - 1)

        build(0, depth)
        occ = _sim_dual_stack(children)
        # wide levels = depth + 1 in collapse_bvh8's counting (root = 1)
        assert occ <= stack_need(depth), (depth, occ)
    # Random lopsided shapes stay under the bound too.
    rng = np.random.default_rng(7)
    for _ in range(200):
        children, nid, maxd = {}, [0], [0]

        def build(n, d, budget):
            maxd[0] = max(maxd[0], d)
            if budget[0] <= 0 or d >= 12:
                return
            kids = []
            for _ in range(int(rng.choice([0, 1, 2, 3, 8]))):
                nid[0] += 1
                kids.append(nid[0])
                budget[0] -= 1
            if kids:
                children[n] = kids
            for k in kids:
                build(k, d + 1, budget)

        build(0, 0, [2000])
        assert _sim_dual_stack(children) <= stack_need(max(maxd[0], 1))


def test_dense_page_depth_passes_dual_guard():
    """Real dense pages report depths whose dual stack need fits SMEM."""
    v0, e1, e2 = _tris(2000, seed=5)
    _, _, _, depth = build_dense_page(
        v0, e1, e2, np.zeros((2000, 6), np.float32))
    assert stack_need(depth) <= WIDE_STACK_DEPTH


def test_native_dense_page_matches_invariants():
    """The native builder (csrc/dense.cc) satisfies the same structural
    contract as the numpy oracle: every triangle in exactly one pack
    sub-block, inside its leaf-parent child box, with global slots."""
    from vrenderer_pathtracer_tpu.native import build_dense_page_native

    n = 613
    v0, e1, e2 = _tris(n, seed=2)
    uvs6 = np.arange(n * 6, dtype=np.float32).reshape(n, 6)
    n8i, n8f, pack, depth = build_dense_page_native(
        v0, e1, e2, uvs6, slot_base=100)
    assert n8i.shape[1] == 18 and n8f.shape == (n8i.shape[0] * 8, 8)
    assert pack.shape[1] == 128 and depth >= 1

    slots = []
    stack, visited = [0], set()
    while stack:
        w = stack.pop()
        assert w not in visited
        visited.add(w)
        rec = n8i[w]
        if rec[17]:
            grp = int(rec[0])
            for j in range(8):
                if rec[2 * j + 1] > 0:
                    assert rec[2 * j] == grp
                    blk = pack[grp * 8: grp * 8 + 8, 16 * j: 16 * j + 16]
                    box_lo, box_hi = n8f[w * 8 + j, 0:3], n8f[w * 8 + j, 3:6]
                    for row in blk:
                        if not np.any(np.cross(row[3:6], row[6:9])):
                            continue
                        s = int(row[9]) - 100
                        slots.append(s)
                        np.testing.assert_array_equal(row[10:16], uvs6[s])
                        for pt in (row[0:3], row[0:3] + row[3:6],
                                   row[0:3] + row[6:9]):
                            assert (pt >= box_lo - 1e-3).all()
                            assert (pt <= box_hi + 1e-3).all()
        else:
            for j in range(8):
                if rec[2 * j + 1] == 0:
                    stack.append(int(rec[2 * j]))
    assert sorted(slots) == list(range(n))

    # The dispatcher in accel/wide.py picks the native path.
    from vrenderer_pathtracer_tpu.accel.wide import build_dense_page
    n8i2, n8f2, pack2, d2 = build_dense_page(v0, e1, e2, uvs6, slot_base=100)
    np.testing.assert_array_equal(n8i2, n8i)
