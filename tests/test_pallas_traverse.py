"""Pallas packet-traversal kernel vs the XLA traversal oracle.

SURVEY §4.3: every Pallas kernel is tested against its jax.numpy reference
in interpret mode on CPU — the TPU analog of the reference's CUDA/OpenCL
dual-backend cross-check.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_mesh_traversal import _aimed_rays, _rays, _soup
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
    BLOCK,
    fits_vmem,
    traverse_packets,
)
from vrenderer_pathtracer_tpu.accel.traverse import traverse


@pytest.mark.parametrize("seed", [0, 1])
def test_packets_match_xla(seed):
    host = _soup(200, seed=seed)
    mesh = pack_mesh(host)
    assert fits_vmem(mesh)
    o1, d1 = _rays(512, seed=seed + 10)
    o2, d2 = _aimed_rays(host, 512, seed=seed + 20)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((1024,), 1e6, jnp.float32)

    slot_a, t_a = traverse(mesh, o, d, t_max)
    slot_b, t_b = traverse_packets(mesh, o, d, t_max, interpret=True)

    np.testing.assert_array_equal(np.asarray(slot_a), np.asarray(slot_b))
    hit = np.asarray(slot_a) >= 0
    # Winning slots must agree exactly; t only to fp-association tolerance
    # (the scalar-broadcast M-T evaluates in a different order — and the
    # integrator recomputes t differentiably from the slot anyway).
    np.testing.assert_allclose(
        np.asarray(t_a)[hit], np.asarray(t_b)[hit], rtol=1e-4
    )


def test_packets_padding():
    """Ray counts that don't divide the 1024-lane block size."""
    host = _soup(60, seed=5)
    mesh = pack_mesh(host)
    o, d = _aimed_rays(host, 100, seed=6)
    t_max = jnp.full((100,), 1e6, jnp.float32)
    slot_a, t_a = traverse(mesh, o, d, t_max)
    slot_b, t_b = traverse_packets(mesh, o, d, t_max, interpret=True)
    assert slot_b.shape == (100,)
    np.testing.assert_array_equal(np.asarray(slot_a), np.asarray(slot_b))


def test_packets_binary_fallback_matches():
    """Meshes without the 8-wide arrays run the original binary kernel."""
    host = _soup(120, seed=3)
    mesh = pack_mesh(host)
    o, d = _aimed_rays(host, BLOCK, seed=4)
    t_max = jnp.full((BLOCK,), 1e6, jnp.float32)
    slot_w, _ = traverse_packets(mesh, o, d, t_max, interpret=True)
    bin_mesh = mesh._replace(nodes8_f=None, nodes8_i=None, nodes8_ax=None)
    slot_b, _ = traverse_packets(bin_mesh, o, d, t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(slot_w), np.asarray(slot_b))


def test_tile_remap_preserves_results():
    """image_shape remapping is a pure permutation: outputs identical."""
    host = _soup(200, seed=9)
    mesh = pack_mesh(host)
    h, w = 32, 64
    o, d = _aimed_rays(host, h * w, seed=11)
    t_max = jnp.full((h * w,), 1e6, jnp.float32)
    slot_a, t_a = traverse_packets(mesh, o, d, t_max, interpret=True)
    slot_b, t_b = traverse_packets(
        mesh, o, d, t_max, interpret=True, image_shape=(h, w))
    np.testing.assert_array_equal(np.asarray(slot_a), np.asarray(slot_b))
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))


def test_bvh8_collapse_invariants():
    """The 8-wide tree reaches exactly the binary tree's leaves, once each,
    with children sorted along the stored axis."""
    host = _soup(150, seed=12)
    mesh = pack_mesh(host)
    n8f = np.asarray(mesh.nodes8_f)
    n8i = np.asarray(mesh.nodes8_i)
    n8ax = np.asarray(mesh.nodes8_ax)
    nbin = np.asarray(mesh.nodes_i)
    pack = np.asarray(mesh.tri_pack)
    bin_leaves = []
    for n in range(nbin.shape[0]):
        c0, n0, c1, n1 = nbin[n]
        if n0 > 0:
            bin_leaves.append((c0, n0))
        if n1 > 0:
            bin_leaves.append((c1, n1))
    wide_leaves, seen, stack = [], set(), [0]
    while stack:
        wnode = stack.pop()
        assert wnode not in seen  # tree, not DAG
        seen.add(wnode)
        ax = int(n8ax[wnode, 0])
        keys = []
        for c in range(8):
            ref, cnt = n8i[wnode, 2 * c], n8i[wnode, 2 * c + 1]
            if cnt > 0:
                # Leaf refs index the sparse 8-aligned pack row space in
                # EITHER layout; in the lane-dense one block l = ref//8
                # lives at rows (l//8)*8..+8, lanes 16*(l%8)..+16
                # (accel/wide.py lane_dense_pack16).  Each row stores its
                # original contiguous slot at column 9; the leaf's rows
                # must be the run [start, start+cnt), padding degenerate.
                assert ref % 8 == 0
                if pack.shape[-1] == 128:  # lane-dense
                    l = ref // 8
                    blk = pack[(l // 8) * 8:(l // 8) * 8 + 8,
                               16 * (l % 8):16 * (l % 8) + 16]
                else:
                    blk = pack[ref:ref + 8, :]
                start = int(blk[0, 9])
                for j in range(cnt):
                    assert int(blk[j, 9]) == start + j
                assert not np.any(blk[cnt:8, 0:9])
                wide_leaves.append((start, cnt))
            elif cnt == 0:
                stack.append(ref)
            if cnt >= 0:
                if n8f.shape[-1] == 128:  # lane-dense boxes
                    box = n8f[(wnode // 16) * 8 + c,
                              8 * (wnode % 16):8 * (wnode % 16) + 8]
                else:
                    box = n8f[wnode * 8 + c, :]
                keys.append(box[ax] + box[3 + ax])
        assert all(keys[i] <= keys[i + 1] + 1e-5 for i in range(len(keys) - 1))
    assert sorted(bin_leaves) == sorted(wide_leaves)


def test_dense_layout_matches_sparse(monkeypatch):
    """Forcing the lane-dense layout (as large meshes get) must be
    bitwise-identical to the sparse layout on the same rays."""
    import vrenderer_pathtracer_tpu.accel.pallas_traverse as pt

    host = _soup(200, seed=5)
    mesh_s = pack_mesh(host)
    monkeypatch.setattr(pt, "SPARSE_PHYS_BUDGET", 0)
    mesh_d = pack_mesh(host)
    assert mesh_s.nodes8_f.shape[-1] == 8, "small mesh should pack sparse"
    assert mesh_d.nodes8_f.shape[-1] == 128, "forced dense"
    o1, d1 = _rays(512, seed=31)
    o2, d2 = _aimed_rays(host, 512, seed=32)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((1024,), 1e6, jnp.float32)
    slot_s, t_s = traverse_packets(mesh_s, o, d, t_max, interpret=True)
    slot_d, t_d = traverse_packets(mesh_d, o, d, t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(slot_s), np.asarray(slot_d))
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_d))


def test_woop_leaf_test_matches_mt():
    """traverse_packets(leaf_test="woop") on a Woop-layout pack finds the
    same hits as Möller–Trumbore (BASELINE.json experiment; unit-triangle
    affine form vs the reference's M-T).  Slot agreement is bounded, not
    exact: the two tests round edge-grazing hits differently."""
    from vrenderer_pathtracer_tpu.accel.wide import (
        lane_dense_pack16, lane_undense_pack16, woop_pack_from_mt)

    host = _soup(200, seed=3)
    mesh = pack_mesh(host)
    pack = np.asarray(mesh.tri_pack)
    if pack.shape[-1] == 128:  # lane-dense: undense, convert, re-dense
        woop = lane_dense_pack16(woop_pack_from_mt(lane_undense_pack16(pack)))
    else:
        woop = woop_pack_from_mt(pack)
    mesh_w = mesh._replace(tri_pack=jnp.asarray(woop))
    o1, d1 = _rays(512, seed=21)
    o2, d2 = _aimed_rays(host, 512, seed=22)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((1024,), 1e6, jnp.float32)
    slot_m, t_m = traverse_packets(mesh, o, d, t_max, interpret=True)
    slot_w, t_w = traverse_packets(mesh_w, o, d, t_max, interpret=True,
                                   leaf_test="woop")
    agree = np.asarray(slot_m) == np.asarray(slot_w)
    assert agree.mean() > 0.99, f"{(~agree).sum()} slot disagreements"
    both = agree & (np.asarray(slot_m) >= 0)
    np.testing.assert_allclose(np.asarray(t_w)[both], np.asarray(t_m)[both],
                               rtol=2e-3, atol=2e-4)


def test_capture_attrs_match_recompute(tmp_path):
    """Win-time captured attributes (normal/uv/tangent/smooth) match a
    straight recompute from the contiguous arrays at the winning slot —
    the contract the forward-only captured_attrs shading path relies on
    (accel/traverse.py shade_mesh_hit_captured)."""
    from tests.test_mesh_render import write_uv_sphere
    from vrenderer_pathtracer_tpu.native import load_obj

    p = tmp_path / "cap.obj"
    write_uv_sphere(p, radius=12.0, n_theta=10, n_phi=14)
    mesh = pack_mesh(load_obj(str(p)))
    rng = np.random.default_rng(4)
    o = jnp.asarray(
        rng.uniform(-3, 3, (1024, 3)).astype(np.float32)
        + np.array([0, 0, 30], np.float32))
    d = jnp.asarray(np.tile(np.array([[0, 0, -1]], np.float32), (1024, 1)))
    t_max = jnp.full((1024,), 1e6, jnp.float32)
    slot, t, extras = traverse_packets(
        mesh, o, d, t_max, interpret=True,
        capture=("normal", "uv", "tangent", "smooth"))
    s = np.asarray(slot)
    hit = s >= 0
    assert hit.sum() > 200
    si = s[hit]
    v0 = np.asarray(mesh.tri_v0)[si]
    e1 = np.asarray(mesh.tri_e1)[si]
    e2 = np.asarray(mesh.tri_e2)[si]
    on, dn = np.asarray(o)[hit], np.asarray(d)[hit]
    # Möller–Trumbore recompute of (u, v) at the winning slot.
    pv = np.cross(dn, e2)
    det = np.einsum("ij,ij->i", e1, pv)
    tv = on - v0
    u = np.einsum("ij,ij->i", tv, pv) / det
    qv = np.cross(tv, e1)
    v = np.einsum("ij,ij->i", dn, qv) / det
    w = 1.0 - u - v

    def norm(x):
        return x / np.maximum(
            np.linalg.norm(x, axis=-1, keepdims=True), 1e-20)

    def bary(corners):  # [n,3,k]
        return (w[:, None] * corners[:, 0] + u[:, None] * corners[:, 1]
                + v[:, None] * corners[:, 2])

    np.testing.assert_allclose(
        np.asarray(extras["normal"])[hit], norm(np.cross(e1, e2)),
        rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(extras["uv"])[hit], bary(np.asarray(mesh.tri_uv)[si]),
        rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(extras["tangent"])[hit],
        norm(bary(np.asarray(mesh.tri_t)[si])), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(extras["smooth"])[hit],
        norm(bary(np.asarray(mesh.tri_n)[si])), rtol=2e-3, atol=2e-3)


def test_packets_respect_t_max():
    """Hits beyond t_max (e.g. an earlier sphere hit) must be rejected."""
    host = _soup(60, seed=7)
    mesh = pack_mesh(host)
    o, d = _aimed_rays(host, BLOCK, seed=8)
    wide = jnp.full((BLOCK,), 1e6, jnp.float32)
    slot_w, t_w = traverse_packets(mesh, o, d, wide, interpret=True)
    hit = np.asarray(slot_w) >= 0
    assert hit.sum() > 10
    # Cap t_max below each found hit: every one must disappear.
    tight = jnp.where(slot_w >= 0, t_w * 0.5, wide)
    slot_t, _ = traverse_packets(mesh, o, d, tight, interpret=True)
    assert (np.asarray(slot_t)[hit] == -1).all()


def test_packet_block_rows_equivalent():
    """block_rows (rays per packet block) never changes results — only the
    vote granularity and the scalar-chain amortization (docs/PERF.md)."""
    from tests.test_mesh_traversal import _aimed_rays, _rays, _soup
    from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh

    host = _soup(900, seed=3, extent=40.0)
    mesh = pack_mesh(host)
    o1, d1 = _rays(512, seed=4)
    o2, d2 = _aimed_rays(host, 512, seed=5)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((1024,), 1e6, jnp.float32)
    s0, t0 = traverse_packets(mesh, o, d, t_max, interpret=True)
    s1, t1 = traverse_packets(mesh, o, d, t_max, interpret=True,
                              block_rows=16)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-5)
