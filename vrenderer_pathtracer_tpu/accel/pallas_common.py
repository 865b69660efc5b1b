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
                    node_f, node_i, tri, slot_base, n_nodes):
    """Traverse one BVH for one ray block, updating best hits in place.

    ``o``/``d``       — 3-tuples of (R,C) component tiles.
    ``t_out``/``slot_out`` — refs holding the running best (pre-initialized).
    ``stack``         — SMEM (STACK_DEPTH,) int32 scratch.
    ``node_f(n,k)``   — scalar fetch of node float k (two child AABBs, 12).
    ``node_i(n,k)``   — scalar fetch of node int k ((ref,count) pairs, 4).
    ``tri(s)``        — scalar fetch tuple (v0, e1, e2) of 3-tuples for slot s.
    ``slot_base``     — added to local slots when writing winners (paging).
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
