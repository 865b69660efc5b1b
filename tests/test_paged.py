"""Paged (two-level) mesh acceleration tests.

Interpret-mode paged-kernel equivalence vs the all-triangles oracle, page
structure invariants, and the renderer end-to-end with a forced-paged mesh
(exercising the pallas_paged_interpret dispatch on CPU).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_mesh_traversal import _aimed_rays, _rays, _soup
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.accel.paged import pack_mesh_paged
from vrenderer_pathtracer_tpu.accel.pallas_paged import traverse_paged
from vrenderer_pathtracer_tpu.accel.traverse import brute_force


@pytest.mark.parametrize("page_tris", [256, 512])
def test_paged_matches_brute_force(page_tris):
    host = _soup(900, seed=3, extent=40.0)
    mesh = pack_mesh_paged(host, page_tris=page_tris)
    assert mesh.paged.nodes8_f.shape[0] == -(-900 // page_tris)
    o1, d1 = _rays(1024, seed=4)
    o2, d2 = _aimed_rays(host, 1024, seed=5)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((2048,), 1e6, jnp.float32)

    slot_b, t_b = brute_force(mesh, o, d, t_max)
    slot_p, t_p = traverse_paged(mesh, o, d, t_max, interpret=True)

    hit = np.asarray(slot_b) >= 0
    assert hit.sum() > 300
    np.testing.assert_array_equal(hit, np.asarray(slot_p) >= 0)
    np.testing.assert_array_equal(np.asarray(slot_b)[hit], np.asarray(slot_p)[hit])
    np.testing.assert_allclose(
        np.asarray(t_b)[hit], np.asarray(t_p)[hit], rtol=1e-4
    )


def test_page_schedule_packs_valid_16bit_pairs():
    """The flat packed page schedule (two 16-bit ids per int32 word, 1-D)
    unpacks to valid page ids for every block's first `count` entries,
    with the near-to-far entry order the kernel's occlusion skip relies
    on (a far page can never come before a reachable nearer one)."""
    from vrenderer_pathtracer_tpu.accel.pallas_paged import (
        COLS, _page_schedule_c)

    host = _soup(900, seed=6, extent=40.0)
    mesh = pack_mesh_paged(host, page_tris=128)
    n_pages = mesh.paged.nodes8_f.shape[0]
    o1, d1 = _rays(1024, seed=7)
    o2, d2 = _aimed_rays(host, 1024, seed=8)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((2048,), 1e6, jnp.float32)
    block = 8 * COLS
    nb = 2048 // block
    o_c = [o[:, k] for k in range(3)]
    d_c = [d[:, k] for k in range(3)]
    count, packed = _page_schedule_c(mesh.paged, o_c, d_c, t_max, nb, block)
    count = np.asarray(count)
    packed = np.asarray(packed)
    wpb = packed.size // nb
    assert packed.ndim == 1 and wpb * nb == packed.size
    for b in range(nb):
        words = packed[b * wpb:(b + 1) * wpb]
        ids = np.empty(2 * wpb, np.int64)
        ids[0::2] = (words >> 16) & 0xFFFF
        ids[1::2] = words & 0xFFFF
        c = int(count[b])
        assert 0 <= c <= n_pages
        used = ids[:max(c, 1)]
        assert (used >= 0).all() and (used < n_pages).all()
        assert len(np.unique(ids[:c])) == c  # reachable pages are distinct


def test_page_structure():
    """Every triangle lands in exactly one page slot; bboxes cover pages."""
    host = _soup(700, seed=9, extent=25.0)
    mesh = pack_mesh_paged(host, page_tris=256)
    pg = mesh.paged
    n_pages = pg.nodes8_f.shape[0]
    page_tris = mesh.tri_v0.shape[0] // n_pages
    v0 = np.asarray(mesh.tri_v0)
    e1 = np.asarray(mesh.tri_e1)
    e2 = np.asarray(mesh.tri_e2)
    real = np.abs(np.cross(e1, e2)).sum(axis=-1) > 0  # non-degenerate slots
    assert real.sum() == 700
    for p in range(n_pages):
        sl = slice(p * page_tris, (p + 1) * page_tris)
        pts = np.concatenate([
            v0[sl][real[sl]], (v0 + e1)[sl][real[sl]], (v0 + e2)[sl][real[sl]]
        ])
        if len(pts) == 0:
            continue
        lo, hi = np.asarray(pg.bbox[p, :3]), np.asarray(pg.bbox[p, 3:6])
        assert (pts.min(0) >= lo - 1e-4).all() and (pts.max(0) <= hi + 1e-4).all()


def test_pack_mesh_auto_pages_large():
    """pack_mesh(auto) chooses the paged layout for VMEM-exceeding meshes."""
    host = _soup(400, seed=1)
    small = pack_mesh(host)
    assert small.paged is None
    forced = pack_mesh(host, paged=True)
    assert forced.paged is not None


def test_renderer_with_paged_mesh():
    from vrenderer_pathtracer_tpu import Renderer, RenderSettings
    from tests.test_mesh_render import write_uv_sphere
    import tempfile, os

    from vrenderer_pathtracer_tpu.native import load_obj

    p = os.path.join(tempfile.mkdtemp(), "s.obj")
    write_uv_sphere(p, radius=12.0, n_theta=10, n_phi=12)
    r = Renderer(32, 32, settings=RenderSettings(
        use_cornell_box=True, has_hdr=False, samples_per_pass=2, bounces=2))
    r.init_mesh(pack_mesh(load_obj(p), paged=True))
    assert r.settings.traversal == "pallas_paged_interpret"
    img, depth = r.render_frames(2)
    assert np.isfinite(img).all()
    # Mesh visible: center closer than corners.
    assert depth[14:18, 14:18].mean() < depth[:4, :4].mean()


def test_sorted_traverse_preserves_results():
    """Coherence sorting must not change any result (order restored)."""
    from vrenderer_pathtracer_tpu.accel.sorting import sorted_traverse
    from vrenderer_pathtracer_tpu.accel.traverse import traverse

    host = _soup(300, seed=11)
    mesh = pack_mesh(host)
    o1, d1 = _rays(512, seed=12)
    o2, d2 = _aimed_rays(host, 512, seed=13)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((1024,), 1e6, jnp.float32)
    slot_a, t_a = traverse(mesh, o, d, t_max)
    slot_b, t_b = sorted_traverse(traverse, mesh, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(slot_a), np.asarray(slot_b))
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))


def test_paged_tile_remap_matches_unmapped():
    """image_shape tiling is a pure permutation: identical results to the
    unmapped call, in original ray order (the fast path used for raster
    camera passes)."""
    from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays

    host = _soup(900, seed=3, extent=40.0)
    mesh = pack_mesh_paged(host, page_tris=256)
    h, w = 32, 64  # multiples of TILE=32
    o, d = generate_rays(
        Camera.default()._replace(origin=jnp.asarray([0.0, 0.0, 60.0])),
        w, h)
    t_max = jnp.full((h * w,), 1e6, jnp.float32)
    s0, t0 = traverse_paged(mesh, o, d, t_max, interpret=True)
    s1, t1 = traverse_paged(mesh, o, d, t_max, interpret=True,
                            image_shape=(h, w))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_paged_block_rows_equivalent():
    """block_rows is a pure scheduling knob: results identical at any block
    size, including when the SMEM budget forces an internal escalation
    (the 1080p config-5 schedule is ~2MB at 8 rows and must not refuse to
    compile — it doubles block_rows until ``perm`` fits)."""
    import vrenderer_pathtracer_tpu.accel.pallas_paged as pp

    host = _soup(900, seed=3, extent=40.0)
    mesh = pack_mesh_paged(host, page_tris=256)
    o1, d1 = _rays(512, seed=4)
    o2, d2 = _aimed_rays(host, 512, seed=5)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((1024,), 1e6, jnp.float32)
    s0, t0 = traverse_paged(mesh, o, d, t_max, interpret=True)
    s1, t1 = traverse_paged(mesh, o, d, t_max, interpret=True, block_rows=16)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-5)
    # Force the auto-escalation path: one block's schedule row over budget.
    old = pp.SMEM_SCHEDULE_BUDGET
    pp.SMEM_SCHEDULE_BUDGET = 20
    try:
        s2, t2 = traverse_paged(mesh, o, d, t_max, interpret=True,
                                block_rows=4)
    finally:
        pp.SMEM_SCHEDULE_BUDGET = old
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t2), rtol=1e-5)


def test_paged_unpacked_schedule_fallback():
    """Meshes beyond PACK16_MAX_PAGES pages fall back to an unpacked
    32-bit flat schedule instead of asserting (ADVICE round 4): forcing
    the threshold below the page count must produce identical results
    through the packed16=False kernel path."""
    import vrenderer_pathtracer_tpu.accel.pallas_paged as pp

    host = _soup(900, seed=3, extent=40.0)
    mesh = pack_mesh_paged(host, page_tris=128)
    assert mesh.paged.nodes8_f.shape[0] > 2
    o1, d1 = _rays(512, seed=14)
    o2, d2 = _aimed_rays(host, 512, seed=15)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((1024,), 1e6, jnp.float32)
    s0, t0 = traverse_paged(mesh, o, d, t_max, interpret=True)
    old = pp.PACK16_MAX_PAGES
    pp.PACK16_MAX_PAGES = 2      # force the fallback
    try:
        s1, t1 = traverse_paged(mesh, o, d, t_max, interpret=True)
    finally:
        pp.PACK16_MAX_PAGES = old
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-5)
