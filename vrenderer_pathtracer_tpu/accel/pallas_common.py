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

from vrenderer_pathtracer_tpu.accel.mesh import MAX_LEAF, STACK_DEPTH
from vrenderer_pathtracer_tpu.accel.traverse import TRI_EPS


def safe_inv(d):
    """Per-component 1/d with the slab test's signed-epsilon guard."""
    return tuple(
        1.0 / jnp.where(jnp.abs(c) > 1e-12, c, jnp.where(c >= 0, 1e-12, -1e-12))
        for c in d
    )


def root_exit_clamp(o, d, t_max, nodes_f):
    """Clamp per-lane search bounds to the root-box exit distance.

    Any triangle hit satisfies ``t <= exit(root box)``, so a lane's search
    bound can be tightened to it for free.  Lanes whose rays miss the root
    box entirely get bound 0 and thus fail every subsequent slab test —
    without this, miss lanes carried t=1e6 and forced the block-wide
    any-hit vote to descend subtrees no lane could ever hit.  A small
    relative margin guards fp disagreement between this slab test and the
    per-node ones.
    """
    inv = safe_inv(d)
    lo = (jnp.minimum(nodes_f[0, 0], nodes_f[0, 6]),
          jnp.minimum(nodes_f[0, 1], nodes_f[0, 7]),
          jnp.minimum(nodes_f[0, 2], nodes_f[0, 8]))
    hi = (jnp.maximum(nodes_f[0, 3], nodes_f[0, 9]),
          jnp.maximum(nodes_f[0, 4], nodes_f[0, 10]),
          jnp.maximum(nodes_f[0, 5], nodes_f[0, 11]))
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

    def tri_test(s):
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
            ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > TRI_EPS) & (t < t_out[:])
        )
        t_out[:] = jnp.where(ok, t, t_out[:])
        slot_out[:] = jnp.where(ok, slot_base + s, slot_out[:])
        if on_hit is not None:
            on_hit(s, ok, u, v, e1, e2)

    def leaf(start, count):
        def tb(k, _):
            @pl.when(k < count)
            def _():
                tri_test(start + k)
            return 0

        lax.fori_loop(0, MAX_LEAF, tb, 0, unroll=True)

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
        both = is_inner0 & is_inner1
        near_is_0 = near0 <= near1
        first = jnp.where(both, jnp.where(near_is_0, c1, c0),
                          jnp.where(is_inner0, c0, c1))
        second = jnp.where(near_is_0, c0, c1)
        any_push = is_inner0 | is_inner1

        @pl.when(any_push)
        def _():
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = first

        @pl.when(both)
        def _():
            stack[jnp.minimum(sp + 1, STACK_DEPTH - 1)] = second

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
