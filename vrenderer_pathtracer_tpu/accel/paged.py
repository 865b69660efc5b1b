"""Paged mesh packing: two-level acceleration for VMEM-exceeding meshes.

The single-level packet kernel (pallas_traverse.py) needs the whole scene in
VMEM (~16MB/core), capping meshes around 300k leaf triangles.  For larger
scenes (BASELINE config 5: ~500k tris) the mesh is split into spatial
**pages**: triangles are Morton-sorted by centroid, chunked into fixed-size
pages, each page SBVH-leaf-ordered (native builder) and packed into the
DENSE 8-wide layout (accel/wide.py build_dense_page, native csrc/dense.cc).
The Pallas paged kernel (pallas_paged.py) then streams each ray block's
reachable pages HBM -> VMEM with double-buffered manual DMAs.

The reference has no counterpart (its GPU held the whole scene, and its max
tested scenes were far smaller); this is the TPU-native answer to "scene
bigger than fast memory", the same shape as its host->device re-upload
strategy taken one level down the hierarchy.

Shading-side triangle attributes stay in one flat global array (slots are
``page * page_tris + local``), so the differentiable hit recompute
(traverse.shade_mesh_hit) is unchanged.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vrenderer_pathtracer_tpu.accel.mesh import _check_stack_bound
from vrenderer_pathtracer_tpu.native import HostMesh, build_sbvh
from vrenderer_pathtracer_tpu.scene.scene import MeshData, PagedNodes

PAGE_TRIS = 4096  # triangles per page (leaf-ordered, padded with degenerates)


def _morton3(x: np.ndarray) -> np.ndarray:
    """30-bit Morton codes from [N,3] coordinates normalized to [0,1)."""
    q = np.clip((x * 1024.0).astype(np.uint64), 0, 1023)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def pack_mesh_paged(mesh: HostMesh, page_tris: int = PAGE_TRIS) -> MeshData:
    """Build a paged MeshData (flat page-blocked attribute arrays + paged
    node arrays).  Per-page BVHs use object splits only, so page ref counts
    never exceed the fixed slot budget."""
    tris = mesh.tris
    centroids = mesh.verts[tris].mean(axis=1)
    lo = centroids.min(axis=0)
    span = np.maximum(centroids.max(axis=0) - lo, 1e-12)
    order = np.argsort(_morton3((centroids - lo) / span), kind="stable")

    from vrenderer_pathtracer_tpu.accel.wide import build_dense_page

    n_pages = -(-len(tris) // page_tris)
    bboxes = []
    pages_8f, pages_8i, pages_pack = [], [], []
    slot_v0 = np.zeros((n_pages * page_tris, 3), np.float32)
    slot_e1 = np.zeros_like(slot_v0)
    slot_e2 = np.zeros_like(slot_v0)
    slot_n = np.zeros((n_pages * page_tris, 3, 3), np.float32)
    slot_t = np.zeros_like(slot_n)
    slot_uv = np.zeros((n_pages * page_tris, 3, 2), np.float32)

    total_refs = 0
    for p in range(n_pages):
        sel = order[p * page_tris: (p + 1) * page_tris]
        page_tri = tris[sel]
        bvh = build_sbvh(mesh.verts, page_tri, allow_spatial=False)
        _check_stack_bound(bvh.max_depth)
        ref = page_tri[bvh.tri_order]  # [R,3] vertex ids, page-local order
        r = len(ref)
        assert r == len(page_tri), "object-only BVH must not duplicate refs"
        base = p * page_tris
        v0 = mesh.verts[ref[:, 0]]
        e1 = mesh.verts[ref[:, 1]] - v0
        e2 = mesh.verts[ref[:, 2]] - v0
        slot_v0[base: base + r] = v0
        slot_e1[base: base + r] = e1
        slot_e2[base: base + r] = e2
        for k in range(3):
            slot_n[base: base + r, k] = mesh.normals[ref[:, k]]
            slot_t[base: base + r, k] = mesh.tangents[ref[:, k]]
            slot_uv[base: base + r, k] = mesh.uvs[ref[:, k]]
        total_refs += r
        pv = mesh.verts[page_tri.reshape(-1)]
        bb = np.concatenate([pv.min(axis=0), pv.max(axis=0), [0.0, 0.0]])
        bboxes.append(bb.astype(np.float32))
        # Per-page dense 8-wide layout (accel/wide.py build_dense_page):
        # 8-tri sub-blocks under leaf-parent nodes, global slots baked in.
        n8i, n8f, pack, _ = build_dense_page(
            v0, e1, e2,
            slot_uv[base: base + r].reshape(r, 6), slot_base=base)
        pages_8f.append(n8f)
        pages_8i.append(n8i)
        pages_pack.append(pack)

    # Wide arrays padded to the page maxima (empty nodes / zero rows) AND
    # to 128 lanes in the minor dim: the paged kernel's manual
    # ``make_async_copy`` DMAs slice whole pages, and Mosaic requires HBM
    # slice minor dims tile-aligned.  Child records + sort axis share one
    # int array: row n = 8 x (ref, count), axis at col 16.
    #
    # Node boxes are LANE-DENSE: 16 nodes share one (8, 128) f32 tile —
    # node n's child c box lives at row (n//16)*8 + c, lanes
    # [8*(n%16), 8*(n%16)+8) as (lo3, hi3, pad2).  The round-2 layout kept
    # one tile per node (8 of 128 lanes used), which made boxes ~half of
    # every page DMA; the kernel now extracts a node's (8,8) block with a
    # dynamic sublane slice + ``pltpu.roll`` on the lane dim (dense lane
    # packing is impossible with plain slicing — Mosaic has no dynamic
    # lane offsets — but a dynamic lane ROTATE is a native vector op).
    # Child records are lane-dense AND word-packed: ONE int32 per child —
    # bits 0-19 ref, bits 20-23 count+1 (0 = empty, 1 = inner, 2-9 = leaf
    # of 1-8), word 0 also bits 24-25 = sort axis, bit 26 = leaf-parent —
    # so 16 nodes share one 128-lane row (node n at lanes [8*(n%16),
    # 8*(n%16)+8)).  The round-2 layout spent two words per child (8 nodes
    # per row); packing halves both the record DMA and, more importantly,
    # the per-visit scalar VMEM reads, which measure ~19ns each and were
    # ~21% of the paged kernel (docs/PERF.md round 3).
    npp16 = -(-max(i8.shape[0] for i8 in pages_8i) // 16) * 16
    np16 = npp16 // 16
    nir16 = -(-np16 // 8) * 8             # record rows, 8-sublane aligned
    rp8 = max(pk.shape[0] for pk in pages_pack)
    n8f_all = np.zeros((n_pages, np16 * 8, 128), np.float32)
    n8f_view = n8f_all.reshape(n_pages, np16, 8, 16, 8)  # [p,tile,c,m,k]
    n8f_view[..., 0:3] = 3e38   # empty boxes: inverted (cosmetic; count gates exclude them)
    n8f_view[..., 3:6] = -3e38
    n8i_all = np.zeros((n_pages, nir16, 128), np.int32)
    pack_all = np.zeros((n_pages, rp8, 128), np.float32)
    for p in range(n_pages):
        m = pages_8i[p].shape[0]
        src = np.full((np16 * 16, 8, 8), 0.0, np.float32)
        src[:, :, 0:3] = 3e38
        src[:, :, 3:6] = -3e38
        src[:m, :, :] = pages_8f[p].reshape(m, 8, 8)
        # [node, c, k] -> [tile, c, m, k] with node = tile*16 + m.
        n8f_view[p] = src.reshape(np16, 16, 8, 8).transpose(0, 2, 1, 3)
        rec = pages_8i[p]
        refs, cnts = rec[:, 0:16:2], rec[:, 1:16:2]
        assert (refs >= 0).all() and refs.max() < 1 << 20
        assert cnts.min() >= -1 and cnts.max() <= 8
        words = np.zeros((nir16 * 16, 8), np.int32)
        words[:m] = refs | ((cnts + 1) << 20)
        words[:m, 0] |= (rec[:, 16] << 24) | (rec[:, 17] << 26)
        # [node, j] -> row n//16, lanes 8*(n%16)+j.
        n8i_all[p] = words.reshape(nir16, 128)
        pack_all[p, :pages_pack[p].shape[0]] = pages_pack[p]

    return MeshData(
        nodes_f=jnp.zeros((1, 12), jnp.float32),   # unused in paged mode
        nodes_i=jnp.zeros((1, 4), jnp.int32),
        tri_v0=jnp.asarray(slot_v0),
        tri_e1=jnp.asarray(slot_e1),
        tri_e2=jnp.asarray(slot_e2),
        tri_n=jnp.asarray(slot_n),
        tri_t=jnp.asarray(slot_t),
        tri_uv=jnp.asarray(slot_uv),
        tri_count=jnp.int32(total_refs),
        paged=PagedNodes(
            bbox=jnp.asarray(np.stack(bboxes)),
            nodes8_f=jnp.asarray(n8f_all),
            nodes8_i=jnp.asarray(n8i_all),
            tri_pack=jnp.asarray(pack_all),
        ),
    )
