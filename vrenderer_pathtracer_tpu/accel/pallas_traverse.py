"""Pallas packet traversal: the TPU-native BVH kernel.

The reference's hot loop is a per-thread stack traversal with warp votes
(``cuda/src/PathTracer.cu:269-463``).  A TPU has no per-lane control flow, so
the kernel re-derives the *packet tracing* idea instead: each Pallas program
owns a block of rays (8x128 = 1024 lanes, one VPU tile) and ONE traversal
stack shared by the whole block.  Every BVH node is visited at most once per
block; its two child AABBs are fetched with a *scalar* dynamic index (no
vector gathers — Mosaic's weak spot) and slab-tested across all lanes in one
VPU op.  A child is descended if ANY lane hits it (the block-level analog of
the reference's warp vote ``__ballot``), children ordered near-to-far by the
block-wide minimum entry distance.  Leaves resolve inline: up to MAX_LEAF
Möller–Trumbore tests, each one triangle broadcast against all lanes.

Scene residency: node and triangle arrays live in VMEM (~16MB/core), which
bounds the mesh at roughly 300k leaf-ordered triangles; larger scenes fall
back to the XLA traversal (accel/traverse.py) until the streaming variant
lands.  Coherent packets (primary/shadow rays) amortize perfectly; divergent
deep-bounce packets overtrace — the classic packet-tracing trade, and still
a large win over lockstep XLA gathers.

The kernel is used under the same detached-hit convention as the XLA path:
it returns discrete winning slots; differentiable attributes are recomputed
outside (traverse.shade_mesh_hit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrenderer_pathtracer_tpu.accel.mesh import MAX_LEAF, STACK_DEPTH
from vrenderer_pathtracer_tpu.accel.traverse import TRI_EPS
from vrenderer_pathtracer_tpu.scene.scene import MeshData

LANE_ROWS = 8
LANE_COLS = 128
BLOCK = LANE_ROWS * LANE_COLS  # rays per program: one f32 VPU tile

# VMEM residency estimate: nodes 64B each, traversal tris 3x12B rows.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(mesh: MeshData) -> bool:
    n_nodes = mesh.nodes_f.shape[0]
    n_tris = mesh.tri_v0.shape[0]
    return 64 * n_nodes + 3 * 16 * n_tris < VMEM_BUDGET_BYTES


def _kernel(nodes_f, nodes_i, tri_v0, tri_e1, tri_e2,
            ox, oy, oz, dx, dy, dz, tmax_ref,
            slot_out, t_out, stack):
    """One ray block vs the whole BVH.  All ray refs are [8,128] f32."""
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    inv = tuple(
        1.0 / jnp.where(jnp.abs(c) > 1e-12, c, jnp.where(c >= 0, 1e-12, -1e-12))
        for c in d
    )

    t_out[:] = tmax_ref[:]
    slot_out[:] = jnp.full((LANE_ROWS, LANE_COLS), -1, jnp.int32)
    stack[0] = 0  # root

    def slab_any(lo0, lo1, lo2, hi0, hi1, hi2):
        """Vector slab test vs one (scalar) AABB -> (any_hit, min_t_near)."""
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
        tn_masked = jnp.where(hit, tn, jnp.inf)
        return jnp.any(hit), jnp.min(tn_masked)

    def tri_test(s):
        """One triangle (scalar fetch) vs all lanes; updates best in refs."""
        v0 = tri_v0[s]
        e1 = tri_e1[s]
        e2 = tri_e2[s]
        # cross(d, e2) with scalar e2
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
        slot_out[:] = jnp.where(ok, s, slot_out[:])

    def body(carry):
        sp, it = carry
        node = stack[sp - 1]
        sp = sp - 1

        c0, n0, c1, n1 = nodes_i[node, 0], nodes_i[node, 1], nodes_i[node, 2], nodes_i[node, 3]
        hit0, near0 = slab_any(
            nodes_f[node, 0], nodes_f[node, 1], nodes_f[node, 2],
            nodes_f[node, 3], nodes_f[node, 4], nodes_f[node, 5],
        )
        hit1, near1 = slab_any(
            nodes_f[node, 6], nodes_f[node, 7], nodes_f[node, 8],
            nodes_f[node, 9], nodes_f[node, 10], nodes_f[node, 11],
        )

        def leaf(start, count):
            def tb(k, _):
                @pl.when(k < count)
                def _():
                    tri_test(start + k)
                return 0

            lax.fori_loop(0, MAX_LEAF, tb, 0, unroll=True)

        # Child 0
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

    n_nodes = nodes_i.shape[0]
    lax.while_loop(
        lambda c: (c[0] > 0) & (c[1] < 4 * n_nodes + STACK_DEPTH),
        body,
        (jnp.int32(1), jnp.int32(0)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def traverse_packets(mesh: MeshData, ray_o, ray_d, t_max, interpret=False):
    """Pallas packet traversal over [B] rays (B padded to 1024 internally).

    Returns ``(slot [B] int32, t [B] f32)`` matching accel.traverse.traverse.
    """
    b = ray_o.shape[0]
    pad = (-b) % BLOCK
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    nb = ray_o.shape[0] // BLOCK

    def comp(x):  # [B] -> [nb*8, 128] tiles
        return x.reshape(nb * LANE_ROWS, LANE_COLS)

    ray_spec = pl.BlockSpec(
        (LANE_ROWS, LANE_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    scene_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    slot, t = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[scene_spec] * 5 + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((nb * LANE_ROWS, LANE_COLS), jnp.int32),
            jax.ShapeDtypeStruct((nb * LANE_ROWS, LANE_COLS), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        # Headroom beyond the 16MB default so the kernel still fits when the
        # surrounding render-step program pins buffers in VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        mesh.nodes_f, mesh.nodes_i, mesh.tri_v0, mesh.tri_e1, mesh.tri_e2,
        comp(ray_o[:, 0]), comp(ray_o[:, 1]), comp(ray_o[:, 2]),
        comp(ray_d[:, 0]), comp(ray_d[:, 1]), comp(ray_d[:, 2]),
        comp(t_max),
    )
    slot = slot.reshape(-1)[:b]
    t = t.reshape(-1)[:b]
    return slot, t
