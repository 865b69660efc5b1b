"""Mesh packing: host SBVH output -> device-resident SoA arrays.

TPU-native re-design of the reference's BVH flattener / GPU packer
(``src/vRendererCuda.cpp:201-318``).  The reference packs Aila/Laine float4
quads with bit-cast child indices and per-leaf triangle triplet streams
terminated by a ``0x80000000`` sentinel; on TPU we keep the same *content*
(duplicated per-leaf triangles, preorder nodes) but in plain SoA arrays with
integer child records — gather-friendly, no bit tricks, static shapes.

Triangles are stored per leaf slot in Möller–Trumbore form (v0, e1, e2)
plus per-corner normals/tangents/uvs for barycentric interpolation
(``cuda/src/PathTracer.cu:385-455``).  Arrays are padded with degenerate
triangles (zero edges -> zero determinant -> never hit) so leaf gathers of
``MAX_LEAF`` slots never read out of bounds.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vrenderer_pathtracer_tpu.native import FlatBVH, HostMesh, build_sbvh
from vrenderer_pathtracer_tpu.scene.scene import MeshData

# Leaf capacity: the builder (csrc/sbvh.cc kMaxLeaf) forces splits above this,
# giving the traversal loop a static triangle-test bound.
MAX_LEAF = 8
# Traversal stack depth.  The builder switches to index-balanced median
# splits at depth 48 (kSahDepthLimit), bounding total depth by
# 48 + ceil(log2(T)) < 80 for any T < 2^31 — so 96 slots can never
# overflow.  The builder reports its actual max depth and
# ``_check_stack_bound`` hard-errors if the invariant is ever violated,
# making the kernels' defensive clamp provably dead code.
STACK_DEPTH = 96


def _check_stack_bound(max_depth: int):
    if max_depth + 2 > STACK_DEPTH:
        raise ValueError(
            f"SBVH depth {max_depth} would overflow the traversal stack "
            f"(STACK_DEPTH={STACK_DEPTH}); rebuild with a shallower tree"
        )


def pack_mesh(mesh: HostMesh, pad_to: int = 128, paged: bool | None = None) -> MeshData:
    """Build the SBVH and gather triangle data into leaf-slot order.

    ``paged=None`` (auto) switches to the two-level paged layout
    (accel/paged.py) when the single-level arrays would overflow VMEM for
    the Pallas packet kernel; True/False force the choice.
    """
    if paged is None:
        from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
            VMEM_BUDGET_BYTES, fits_vmem)

        # Rough single-level footprint with the LANE-DENSE layout (the
        # worst-case-accepted layout): leaf pack 64B/tri (x~1.3
        # spatial-split duplication) + boxes ~20B/tri.
        # This pre-estimate only avoids building a doomed giant SBVH; the
        # BINDING decision uses fits_vmem on the ACTUAL packed mesh, the
        # same predicate settings_for_scene applies later — an optimistic
        # estimate here used to let mid-size meshes pack single-level only
        # to be bounced to the ~300x slower XLA lockstep traversal at
        # scene-resolution time instead of going paged.
        est = int(1.3 * len(mesh.tris)) * (64 + 20)
        if est < VMEM_BUDGET_BYTES:
            built = pack_from_bvh(mesh, build_sbvh(mesh.verts, mesh.tris),
                                  pad_to)
            if fits_vmem(built):
                return built
        paged = True
    if paged:
        from vrenderer_pathtracer_tpu.accel.paged import pack_mesh_paged

        return pack_mesh_paged(mesh)
    bvh = build_sbvh(mesh.verts, mesh.tris)
    return pack_from_bvh(mesh, bvh, pad_to)


def pack_from_bvh(mesh: HostMesh, bvh: FlatBVH, pad_to: int = 128) -> MeshData:
    _check_stack_bound(bvh.max_depth)
    order = bvh.tri_order  # [R] original tri index per leaf slot
    tri = mesh.tris[order]  # [R,3] vertex ids
    v0 = mesh.verts[tri[:, 0]]
    v1 = mesh.verts[tri[:, 1]]
    v2 = mesh.verts[tri[:, 2]]

    def corners(attr):
        return np.stack([attr[tri[:, 0]], attr[tri[:, 1]], attr[tri[:, 2]]], axis=1)

    r = len(order)
    t_pad = -(-max(r, 1) // pad_to) * pad_to + MAX_LEAF  # slack for leaf gathers

    def pad(a, fill=0.0):
        out = np.full((t_pad,) + a.shape[1:], fill, a.dtype)
        out[:r] = a
        return out

    from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
        SPARSE_PHYS_BUDGET)
    from vrenderer_pathtracer_tpu.accel.wide import (
        build_leaf_packs, collapse_bvh8, lane_dense_boxes, lane_dense_pack16)

    # 8-wide collapse + aligned leaf-block packs for the wide kernel's
    # VECTOR phases (accel/wide.py).  nodes8_i leaf refs index the pack;
    # the original contiguous arrays (and nodes_i) keep the XLA/binary
    # layout, and winners record the original slot.  Layout choice: narrow
    # VMEM arrays pad their lanes to 128 (16x boxes / 8x packs), so small
    # meshes keep the sparse layout (fast direct block loads) and larger
    # ones switch to LANE-DENSE (16 nodes / 8 leaf blocks per (8,128)
    # tile, extracted with dynamic lane rotates — ~+10-20% visit cost for
    # an 8x higher single-level ceiling; accessors dispatch on lane width
    # in pallas_common.make_node_boxes_fn/make_leaf_blk_fn).
    # SAH-DP-optimal wide grouping (round 5, wide.py _sah_wide_forest):
    # -15% node visits and +10% device throughput over the greedy
    # largest-area expansion on BOTH coherence regimes (measured,
    # docs/PERF.md round 5); the level-vectorized DP also builds faster
    # than greedy.  VPT_WIDE_COLLAPSE=greedy keeps the old grouping.
    import os as _os
    n8f, n8i, n8ax, _ = collapse_bvh8(
        bvh.nodes_f, bvh.nodes_i,
        mode=_os.environ.get("VPT_WIDE_COLLAPSE", "sah"))
    n8i, tri_pack, tri_aux_pack, tri_nrm_pack = build_leaf_packs(
        n8i, v0, v1 - v0, v2 - v0,
        corners(mesh.uvs).reshape(-1, 6),
        corners(mesh.tangents).reshape(-1, 9),
        nrms9=corners(mesh.normals).reshape(-1, 9))
    # The kernels pack each child record into ONE int32 word with a 20-bit
    # ref field (pallas_traverse.pack_node_words) — any mesh near that
    # limit is far past every VMEM/SMEM budget anyway.
    if n8i.size and int(n8i[:, 0::2].max()) >= (1 << 20):
        raise ValueError(
            "wide-BVH child refs overflow the 20-bit packed record field; "
            "build this mesh paged (pack_mesh(..., paged=True))")
    # Layout choice counts boxes + tri_pack only (what every traversal
    # loads); the MERL aux / normal packs ride along only for scenes that
    # request them, which the kernels' supports() gates budget separately.
    from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
        SPARSE_BOX_BYTES_PER_EL, SPARSE_PACK_BYTES_PER_EL)

    sparse_phys = (n8f.size * SPARSE_BOX_BYTES_PER_EL
                   + tri_pack.size * SPARSE_PACK_BYTES_PER_EL)
    if sparse_phys > SPARSE_PHYS_BUDGET:
        n8f = lane_dense_boxes(n8f)
        tri_pack = lane_dense_pack16(tri_pack)
        tri_aux_pack = lane_dense_pack16(tri_aux_pack)
        tri_nrm_pack = lane_dense_pack16(tri_nrm_pack)

    return MeshData(
        nodes_f=jnp.asarray(bvh.nodes_f),
        nodes_i=jnp.asarray(bvh.nodes_i),
        nodes8_f=jnp.asarray(n8f),
        nodes8_i=jnp.asarray(n8i),
        nodes8_ax=jnp.asarray(n8ax)[:, None],  # 2-D: Mosaic scalar loads
        tri_pack=jnp.asarray(tri_pack),
        tri_aux_pack=jnp.asarray(tri_aux_pack),
        tri_nrm_pack=jnp.asarray(tri_nrm_pack),
        tri_v0=jnp.asarray(pad(v0)),
        tri_e1=jnp.asarray(pad(v1 - v0)),
        tri_e2=jnp.asarray(pad(v2 - v0)),
        tri_n=jnp.asarray(pad(corners(mesh.normals))),
        tri_t=jnp.asarray(pad(corners(mesh.tangents))),
        tri_uv=jnp.asarray(pad(corners(mesh.uvs))),
        tri_count=jnp.int32(r),
    )
