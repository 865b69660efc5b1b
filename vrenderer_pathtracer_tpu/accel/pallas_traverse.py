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

import numpy as np

from vrenderer_pathtracer_tpu.accel.mesh import STACK_DEPTH
from vrenderer_pathtracer_tpu.accel.pallas_common import (
    make_leaf_blk_fn,
    make_node_boxes_fn,
    packet_traverse,
    root_exit_clamp_wide,
    wide_packet_traverse,
)
from vrenderer_pathtracer_tpu.accel.wide import WIDE_STACK_DEPTH
from vrenderer_pathtracer_tpu.scene.scene import MeshData

LANE_ROWS = 8
LANE_COLS = 128
BLOCK = LANE_ROWS * LANE_COLS  # rays per program: one f32 VPU tile

# PHYSICAL VMEM budgets for the wide kernel's scene arrays, leaving room
# for ray tiles, scratch and the surrounding program.  Narrow VMEM arrays
# pad their lane dim to 128, so the sparse layout's physical footprint is
# 8-16x its payload; pack_from_bvh keeps the (faster: no per-visit lane
# rotates, +15-20% on traversal) sparse layout while boxes+tri_pack fit
# SPARSE_PHYS_BUDGET and switches to the lane-dense layout beyond.
# Evidence: a 46.6MB sparse scene (the 28.5k-tri bench mesh) compiled and
# ran through rounds 2-4; a 27.4MB dense scene runs and 31.9MB fails
# remote-compile (.bench/dense_ceiling.py — the binding limit there is
# plausibly the flattened-records SMEM window, which grows with node
# count, not VMEM).  The MERL aux pack does NOT join the layout choice
# (loaded only for measured-BRDF scenes; those are gated separately by
# the callers via wide_vmem_bytes(with_aux=True)).
VMEM_BUDGET_BYTES = 44 * 1024 * 1024       # dense-layout scene budget
SPARSE_PHYS_BUDGET = 48 * 1024 * 1024      # sparse-layout scene budget
# Round-5 diagnosis (VERDICT r4 #4): the dense layout's 31.9 MB
# "remote-compile failure" was the RECORDS SMEM WINDOW, not VMEM — the
# [N,16]+ax records cost 68 B per wide node against the ~1 MB SMEM cap
# (~15k nodes), which the 27.4/31.9 MB probe scenes straddled.  Records
# are now PACKED one word per child (32 B/node, pack_node_words) and the
# node count is gated explicitly below; the VMEM budget rises toward the
# sparse-proven 48 MB physical.
RECORDS_SMEM_BUDGET = 768 * 1024           # packed records (32 B/node)
# Physical bytes per f32 ELEMENT of the sparse arrays (lane dim padded to
# 128): boxes [N*8,8] -> 16x lanes x 4B = 64; packs [T8,16] -> 8x x 4B =
# 32.  Shared by wide_vmem_bytes and pack_from_bvh's layout choice so the
# two accountings cannot drift.
SPARSE_BOX_BYTES_PER_EL = 64
SPARSE_PACK_BYTES_PER_EL = 32


def wide_vmem_bytes(mesh: MeshData, with_aux: bool = False) -> int:
    """Physical VMEM bytes of the wide-kernel scene arrays (layout-aware:
    sparse boxes pad 8->128 lanes (16x), sparse packs 16->128 (8x))."""
    dense = mesh.nodes8_f.shape[-1] == 128
    boxes = mesh.nodes8_f.size * (4 if dense else SPARSE_BOX_BYTES_PER_EL)
    pack = mesh.tri_pack.size * (4 if dense else SPARSE_PACK_BYTES_PER_EL)
    if with_aux:
        pack += mesh.tri_aux_pack.size * (
            4 if dense else SPARSE_PACK_BYTES_PER_EL)
    return int(boxes) + int(pack)


def fits_vmem(mesh: MeshData) -> bool:
    if mesh.nodes8_f is None:
        n_nodes = mesh.nodes_f.shape[0]
        n_tris = mesh.tri_v0.shape[0]
        return 64 * n_nodes + 3 * 16 * n_tris < VMEM_BUDGET_BYTES
    dense = mesh.nodes8_f.shape[-1] == 128
    budget = VMEM_BUDGET_BYTES if dense else SPARSE_PHYS_BUDGET
    n_wide = mesh.nodes8_i.shape[0]
    return (wide_vmem_bytes(mesh) <= budget
            and 32 * n_wide <= RECORDS_SMEM_BUDGET)


def _kernel(nodes_f, nodes_i, tri_v0, tri_e1, tri_e2,
            ox, oy, oz, dx, dy, dz, tmax_ref,
            slot_out, t_out, stack):
    """One ray block vs the whole (VMEM-resident) BVH."""
    from vrenderer_pathtracer_tpu.accel.pallas_common import root_exit_clamp

    slot_out[:] = jnp.full(slot_out.shape, -1, jnp.int32)
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    # Node arrays arrive FLATTENED in SMEM (1-D, exact-size: 2-D SMEM
    # windows pad every row to 128 lanes and overflow the ~1MB budget).
    node_f = lambda n, k: nodes_f[n * 12 + k]
    node_i = lambda n, k: nodes_i[n * 4 + k]
    # Miss-lane fix (round-1 collapse): a lane that will never hit anything
    # must not keep t=1e6 and drag the block's any-hit vote through the
    # whole tree.  No triangle lies beyond the root-box exit, so every
    # lane's search bound is clamped to it (0 for lanes missing the root
    # box entirely — they then fail every slab test and go silent).
    t_out[:] = root_exit_clamp(o, d, tmax_ref[:], node_f)
    packet_traverse(
        o, d,
        t_out, slot_out, stack,
        node_f=node_f,
        node_i=node_i,
        tri=lambda s: (
            (tri_v0[s, 0], tri_v0[s, 1], tri_v0[s, 2]),
            (tri_e1[s, 0], tri_e1[s, 1], tri_e1[s, 2]),
            (tri_e2[s, 0], tri_e2[s, 1], tri_e2[s, 2]),
        ),
        slot_base=0,
        n_nodes=nodes_i.shape[0],
    )
    # Report the caller's t_max on miss lanes (contract of traverse()).
    t_out[:] = jnp.where(slot_out[:] >= 0, t_out[:], tmax_ref[:])


# Win-time attribute capture: field -> component count (forward-only; the
# values agree with shade_mesh_hit's differentiable recompute up to fp
# association, so the renderer's forward step can skip the per-bounce
# wide-row attribute gather entirely — ~10ms per 4M-lane bounce).
CAPTURE_WIDTHS = {"normal": 3, "uv": 2, "tangent": 3, "smooth": 3}


def pack_node_words(nodes8_i, nodes8_ax):
    """ONE int32 word per wide child (the paged record format,
    accel/paged.py): ref in bits 0-19, count+1 in bits 20-23, word 0 adds
    the sort axis in bits 24-25.  Returns flat [N*8] int32.

    Round-5 finding (docs/PERF.md): the dense single-level "VMEM" ceiling
    was actually the RECORDS SMEM WINDOW — nodes8_i[N,16]+ax cost 68 B per
    wide node against the ~1 MB SMEM cap.  Packing halves that (32 B/node)
    and also halves the scalar record reads per visit (8 instead of 17,
    the same trade the paged kernel measured as a win).  Build-time guard:
    refs must fit 20 bits (pack_from_bvh checks).
    """
    n8i = nodes8_i.reshape(-1, 16)
    refs = n8i[:, 0::2].astype(jnp.int32)
    cnts = n8i[:, 1::2].astype(jnp.int32)
    words = (refs & 0xFFFFF) | ((cnts + 1) << 20)
    ax = nodes8_ax.reshape(-1).astype(jnp.int32)
    words = words.at[:, 0].set(words[:, 0] | (ax << 24))
    return words.reshape(-1)


def _kernel_wide(nodes8_f, nodes8_p, tri_pack, *rest,
                 dual=False, leaf_test="mt", capture=()):
    """One ray block vs the whole 8-wide BVH (accel/wide.py layout)."""
    rest = list(rest)
    aux = rest.pop(0) if "tangent" in capture else None
    nrm = rest.pop(0) if "smooth" in capture else None
    ox, oy, oz, dx, dy, dz, tmax_ref = rest[:7]
    outs = rest[7:]
    slot_out, t_out = outs[0], outs[1]
    cap_outs = outs[2:-1]
    stack = outs[-1]

    slot_out[:] = jnp.full(slot_out.shape, -1, jnp.int32)
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    t_out[:] = root_exit_clamp_wide(o, d, tmax_ref[:], nodes8_f[0:8, :])

    on_win = None
    if capture:
        co = {}
        i = 0
        for f in capture:
            w = CAPTURE_WIDTHS[f]
            co[f] = cap_outs[i:i + w]
            i += w
        for r in cap_outs:
            r[:] = jnp.zeros(r.shape, jnp.float32)
        aux_blk = make_leaf_blk_fn(aux) if aux is not None else None
        nrm_blk = make_leaf_blk_fn(nrm) if nrm is not None else None

        def on_win(g, ref, win, select, blk, bu, bv):
            shape = (8, slot_out.shape[1])
            row = slice(g, g + 1)
            bw = 1.0 - bu - bv

            def bary3(b, base):
                return tuple(
                    select(bw * b[:, base + k:base + k + 1]
                           + bu * b[:, base + 3 + k:base + 4 + k]
                           + bv * b[:, base + 6 + k:base + 7 + k])
                    for k in range(3))

            def write3(refs3, xyz):
                x, y, z = xyz
                inv = lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-40))
                for r, v in zip(refs3, (x * inv, y * inv, z * inv)):
                    r[row, :] = jnp.where(win, v, r[row, :])

            if "normal" in co:
                fx = blk[:, 4:5] * blk[:, 8:9] - blk[:, 5:6] * blk[:, 7:8]
                fy = blk[:, 5:6] * blk[:, 6:7] - blk[:, 3:4] * blk[:, 8:9]
                fz = blk[:, 3:4] * blk[:, 7:8] - blk[:, 4:5] * blk[:, 6:7]
                write3(co["normal"],
                       tuple(select(jnp.broadcast_to(c, shape))
                             for c in (fx, fy, fz)))
            if "uv" in co:
                iu = select(bw * blk[:, 10:11] + bu * blk[:, 12:13]
                            + bv * blk[:, 14:15])
                iv = select(bw * blk[:, 11:12] + bu * blk[:, 13:14]
                            + bv * blk[:, 15:16])
                co["uv"][0][row, :] = jnp.where(win, iu, co["uv"][0][row, :])
                co["uv"][1][row, :] = jnp.where(win, iv, co["uv"][1][row, :])
            if "tangent" in co:
                write3(co["tangent"], bary3(aux_blk(ref), 0))
            if "smooth" in co:
                write3(co["smooth"], bary3(nrm_blk(ref), 0))

    def node_meta(n):
        words = [nodes8_p[n * 8 + c] for c in range(8)]
        refs = [w & 0xFFFFF for w in words]
        cnts = [((w >> 20) & 0xF) - 1 for w in words]
        return refs, cnts, (words[0] >> 24) & 3, 0

    wide_packet_traverse(
        o, d,
        t_out, slot_out, stack,
        node_boxes=make_node_boxes_fn(nodes8_f),
        node_meta=node_meta,
        leaf_blk=make_leaf_blk_fn(tri_pack),
        n_nodes=nodes8_p.shape[0] // 8,
        nodes_per_visit=2 if dual else 1,
        leaf_test=leaf_test,
        on_win=on_win,
    )
    t_out[:] = jnp.where(slot_out[:] >= 0, t_out[:], tmax_ref[:])


TILE = 32  # pixel tile edge for the coherence remap


def _tile_remap(x, h: int, w: int, inverse: bool = False):
    """Raster order <-> 32x32-pixel-tile order for [B,...] ray arrays.

    Blocks of 1024 consecutive rays then cover compact image tiles instead
    of full raster rows, so silhouette mixing is confined to the tiles that
    actually straddle an edge (6x fewer node visits on the bench view).
    Implemented as reshape+transpose — a fast XLA copy, NOT a gather
    (a 524k-row gather costs more than the traversal it feeds).
    """
    rest = x.shape[1:]
    if inverse:
        x = x.reshape((-1, h // TILE, w // TILE, TILE, TILE) + rest)
        x = x.transpose((0, 1, 3, 2, 4) + tuple(range(5, 5 + len(rest))))
    else:
        x = x.reshape((-1, h // TILE, TILE, w // TILE, TILE) + rest)
        x = x.transpose((0, 1, 3, 2, 4) + tuple(range(5, 5 + len(rest))))
    return x.reshape((-1,) + rest)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "image_shape", "block_rows",
                                    "dual", "leaf_test", "capture"))
def traverse_packets(mesh: MeshData, ray_o, ray_d, t_max, interpret=False,
                     image_shape=None, block_rows=LANE_ROWS, dual=True,
                     leaf_test="mt", capture=()):
    """Pallas packet traversal over [B] rays (B padded to a block multiple).

    Returns ``(slot [B] int32, t [B] f32)`` matching accel.traverse.traverse.
    ``image_shape=(h, w)``: rays are raster-ordered frames (B a multiple of
    h*w); ray blocks are remapped to compact 32x32 pixel tiles, which keeps
    hit/miss mixing — and with it the block-vote overtraversal — local to
    true silhouette tiles.

    ``block_rows``: sublane rows per ray block (block = 128*rows rays).
    Coherent packets measure flat in block size, but INCOHERENT waves are
    saturated-vote-bound — every block's any-hit union reaches most of the
    tree regardless of ray count, so a bigger block amortizes the per-visit
    scalar chain over more rays (docs/PERF.md round 3).
    """
    b = ray_o.shape[0]
    block = block_rows * LANE_COLS
    tiled = (image_shape is not None
             and b % (image_shape[0] * image_shape[1]) == 0
             and image_shape[0] % TILE == 0 and image_shape[1] % TILE == 0)
    if tiled:
        h, w = image_shape
        ray_o = _tile_remap(ray_o, h, w)
        ray_d = _tile_remap(ray_d, h, w)
        t_max = _tile_remap(t_max, h, w)
    pad = (-b) % block
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    nb = ray_o.shape[0] // block

    def comp(x):  # [B] -> [nb*rows, 128] tiles
        return x.reshape(nb * block_rows, LANE_COLS)

    ray_spec = pl.BlockSpec(
        (block_rows, LANE_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    scene_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    # Node arrays live in SMEM: traversal reads them one SCALAR at a time
    # (per-node box/child fetches), and scalar loads from SMEM are native
    # scalar-core ops, where the same loads from VMEM cost ~50ns each and
    # dominate the per-visit budget.  Triangle arrays stay in VMEM.
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Node arrays are FLATTENED to 1-D: SMEM windows pad 2-D rows to 128
    # lanes (a [M,12] window would balloon ~10x past the ~1MB SMEM budget).
    wide = mesh.nodes8_f is not None
    n_cap = sum(CAPTURE_WIDTHS[f] for f in capture)
    if wide:
        kernel = functools.partial(_kernel_wide, dual=dual,
                                   leaf_test=leaf_test, capture=capture)
        scene_args = [mesh.nodes8_f,
                      pack_node_words(mesh.nodes8_i, mesh.nodes8_ax),
                      mesh.tri_pack]
        # Boxes [N*8,8] and triangle leaf blocks [T8,16] in VMEM (both
        # fetched as aligned vector blocks per visit); packed child
        # records (one word per child incl. axis) scalar-resident in SMEM.
        scene_specs = [scene_spec, smem_spec, scene_spec]
        if "tangent" in capture:
            scene_args.append(mesh.tri_aux_pack)
            scene_specs.append(scene_spec)
        if "smooth" in capture:
            scene_args.append(mesh.tri_nrm_pack)
            scene_specs.append(scene_spec)
        stack_depth = WIDE_STACK_DEPTH
    else:
        assert not capture, "attr capture needs the wide kernel"
        kernel = _kernel
        scene_args = [mesh.nodes_f.reshape(-1), mesh.nodes_i.reshape(-1),
                      mesh.tri_v0, mesh.tri_e1, mesh.tri_e2]
        scene_specs = [smem_spec] * 2 + [scene_spec] * 3
        stack_depth = STACK_DEPTH

    tile_f32 = jax.ShapeDtypeStruct((nb * block_rows, LANE_COLS), jnp.float32)
    slot, t, *caps = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=scene_specs + [ray_spec] * 7,
        name=f"traverse_{'wide' if wide else 'bin'}",
        out_specs=(ray_spec, ray_spec) + (ray_spec,) * n_cap,
        out_shape=(
            jax.ShapeDtypeStruct((nb * block_rows, LANE_COLS), jnp.int32),
            tile_f32,
        ) + (tile_f32,) * n_cap,
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32)],
        # Headroom beyond the 16MB default so the kernel still fits when the
        # surrounding render-step program pins buffers in VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *scene_args,
        comp(ray_o[:, 0]), comp(ray_o[:, 1]), comp(ray_o[:, 2]),
        comp(ray_d[:, 0]), comp(ray_d[:, 1]), comp(ray_d[:, 2]),
        comp(t_max),
    )

    def unmap1(x):
        x = x.reshape(-1)[:b]
        return _tile_remap(x, h, w, inverse=True) if tiled else x

    slot = unmap1(slot)
    t = unmap1(t)
    if not capture:
        return slot, t
    extras = {}
    i = 0
    for f in capture:
        w_ = CAPTURE_WIDTHS[f]
        extras[f] = jnp.stack([unmap1(c) for c in caps[i:i + w_]], axis=-1)
        i += w_
    return slot, t, extras
