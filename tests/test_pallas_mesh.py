"""Fused mesh-scene megakernel vs the XLA wavefront (interpret mode).

Kernel-vs-oracle equivalence (the repo's dual-backend discipline) for each
scene class the kernel claims: mesh-in-Cornell, textured mesh under HDRI,
and the config-4 shape (example sphere + MERL + HDRI).  Comparisons are
outlier-tolerant: the two compilations legitimately flip discrete branches
on a small fraction of pixels (see test_golden_cornell.py docstring).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays, pixel_ids
from vrenderer_pathtracer_tpu.native import load_obj
from vrenderer_pathtracer_tpu.ops.brdf import TABLE_SIZE
from vrenderer_pathtracer_tpu.render.integrator import render_pass
from vrenderer_pathtracer_tpu.render.pallas_mesh import (
    render_pass_mesh_pallas, supports)
from vrenderer_pathtracer_tpu.scene.scene import Scene
from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set
from tests.test_mesh_render import write_uv_sphere

W, H = 32, 32  # 1024 pixels = one kernel block


@pytest.fixture(scope="module")
def mesh(tmp_path_factory):
    p = tmp_path_factory.mktemp("mesh") / "sphere.obj"
    write_uv_sphere(p, radius=12.0, n_theta=8, n_phi=12)
    return pack_mesh(load_obj(str(p)))


def _compare(scene, settings, frame=1, seed=0, outlier_frac=0.02):
    cam = Camera.default()
    ray_o, ray_d = generate_rays(cam, settings.width, settings.height)
    ids = pixel_ids(settings.width, settings.height)
    rgb_x, depth_x = render_pass(
        scene, settings, ray_o, ray_d, ids, jnp.uint32(frame),
        jnp.float32(0.1), jnp.float32(3.0), seed)
    rgb_p, depth_p = render_pass_mesh_pallas(
        scene, settings, cam, jnp.uint32(frame), jnp.float32(0.1),
        jnp.float32(3.0), seed, interpret=True)
    diff = np.abs(np.asarray(rgb_x - rgb_p)).max(axis=-1)
    assert (diff > 1e-3).mean() <= outlier_frac, (
        f"{(diff > 1e-3).mean():.3%} pixels diverge, max {diff.max()}")
    good = diff <= 1e-3
    assert diff[good].mean() <= 1e-4
    ddiff = np.abs(np.asarray(depth_x - depth_p))
    assert (ddiff > 1e-3).mean() <= outlier_frac
    return np.asarray(rgb_p)


def test_mesh_in_cornell_parity(mesh):
    settings = RenderSettings(
        width=W, height=H, samples_per_pass=2, bounces=3,
        use_cornell_box=True, has_hdr=False, has_mesh=True, traversal="xla")
    scene = Scene(spheres=build_sphere_set(True), mesh=mesh)
    assert supports(scene, settings)
    rgb = _compare(scene, settings)
    assert rgb.mean() > 0.01  # lit


def test_textured_mesh_under_hdri_parity(mesh):
    rng = np.random.default_rng(3)
    hdr = jnp.asarray(rng.uniform(0, 1.5, (8, 16, 3)).astype(np.float32))
    tex = jnp.asarray(rng.uniform(0.1, 1.0, (16, 16, 3)).astype(np.float32))
    settings = RenderSettings(
        width=W, height=H, samples_per_pass=2, bounces=3,
        use_cornell_box=False, has_hdr=True, has_mesh=True,
        has_diffuse_map=True, traversal="xla")
    scene = Scene(spheres=build_sphere_set(False), mesh=mesh, hdr=hdr,
                  diffuse_map=tex)
    assert supports(scene, settings)
    rgb = _compare(scene, settings)
    assert rgb.mean() > 0.01


def test_example_sphere_merl_hdri_parity():
    rng = np.random.default_rng(5)
    hdr = jnp.asarray(rng.uniform(0, 1.5, (8, 16, 3)).astype(np.float32))
    table = jnp.asarray(
        rng.uniform(0.0, 300.0, (3, TABLE_SIZE)).astype(np.float32))
    settings = RenderSettings(
        width=W, height=H, samples_per_pass=2, bounces=3,
        use_cornell_box=False, has_hdr=True, use_example_sphere=True,
        use_brdf=True, has_brdf=True)
    scene = Scene(spheres=build_sphere_set(False), hdr=hdr, brdf=table)
    assert supports(scene, settings)
    # MERL bin boundaries amplify index fp-noise into value jumps; allow a
    # slightly larger outlier fraction than the pure-geometry cases.
    rgb = _compare(scene, settings, outlier_frac=0.04)
    assert rgb.mean() > 0.01


def test_tiled_block_remap_parity(mesh):
    """Multi-tile image (w=64 -> 2x2 tiles of 32x32): the kernel's 32x32
    pixel-tile block mapping + host inverse remap must reproduce the
    raster-order wavefront exactly (at 32x32 the remap is the identity, so
    only this shape catches an ordering bug)."""
    settings = RenderSettings(
        width=64, height=64, samples_per_pass=1, bounces=2,
        use_cornell_box=True, has_hdr=False, has_mesh=True, traversal="xla")
    scene = Scene(spheres=build_sphere_set(True), mesh=mesh)
    assert supports(scene, settings)
    rgb = _compare(scene, settings)
    assert rgb.mean() > 0.01


def test_supports_scope(mesh):
    base = RenderSettings(width=W, height=H, use_cornell_box=True,
                          has_hdr=False, has_mesh=True)
    scene = Scene(spheres=build_sphere_set(True), mesh=mesh)
    assert supports(scene, base)
    assert not supports(scene, base.replace(has_normal_map=True))
    assert not supports(scene, base.replace(has_specular_map=True))
    assert not supports(scene, base.replace(use_brdf=True))  # no table
    # Non-block-multiple pixel counts are in scope (auto-padded).
    assert supports(scene, base.replace(width=100))


def test_autopad_partial_region_bitwise(mesh):
    """Auto-padded partial region (n_local_pixels=600, not a block
    multiple) == the same pixels of the full frame BITWISE.  The pad lanes
    join the block any-hit vote and the block composition changes (raster
    vs 32x32 tiles), but a vote can only ADD node visits (a skipped node
    contains no lane's hit), so per-lane results are
    vote-composition-independent; RNG identity depends only on pixel id."""
    settings = RenderSettings(
        width=W, height=H, samples_per_pass=2, bounces=3,
        use_cornell_box=True, has_hdr=False, has_mesh=True, traversal="xla")
    scene = Scene(spheres=build_sphere_set(True), mesh=mesh)
    assert supports(scene, settings)
    cam = Camera.default()
    args = (jnp.uint32(1), jnp.float32(0.1), jnp.float32(3.0))
    rgb_t, dep_t = render_pass_mesh_pallas(
        scene, settings, cam, *args, interpret=True)
    rgb_o, dep_o = render_pass_mesh_pallas(
        scene, settings, cam, *args, interpret=True,
        pixel_offset=0, n_local_pixels=600)
    assert rgb_o.shape[0] == 600
    np.testing.assert_array_equal(np.asarray(rgb_o), np.asarray(rgb_t)[:600])
    np.testing.assert_array_equal(np.asarray(dep_o), np.asarray(dep_t)[:600])


def test_deferred_table_grads_match_xla(mesh):
    """Gradients w.r.t. the DEFERRED tables (env map, diffuse texture, MERL
    table) flow through the XLA epilogue alone — the Pallas forward needs no
    AD rule — and must match the differentiable XLA wavefront's gradients
    (render/pallas_mesh.py docstring; parallel/sharding.py
    sharded_deferred_opt_step builds on this)."""
    import jax

    rng = np.random.default_rng(7)
    hdr = jnp.asarray(rng.uniform(0.1, 1.5, (8, 16, 3)).astype(np.float32))
    tex = jnp.asarray(rng.uniform(0.1, 1.0, (16, 16, 3)).astype(np.float32))
    settings = RenderSettings(
        width=W, height=H, samples_per_pass=2, bounces=3,
        use_cornell_box=False, has_hdr=True, has_mesh=True,
        has_diffuse_map=True, traversal="xla")
    scene = Scene(spheres=build_sphere_set(False), mesh=mesh, hdr=hdr,
                  diffuse_map=tex)
    assert supports(scene, settings)
    cam = Camera.default()

    def loss_pallas(h, t):
        s = scene._replace(hdr=h, diffuse_map=t)
        rgb, _ = render_pass_mesh_pallas(
            s, settings, cam, jnp.uint32(1), jnp.float32(0.1),
            jnp.float32(3.0), 0, interpret=True)
        return jnp.mean(rgb ** 2)

    def loss_xla(h, t):
        s = scene._replace(hdr=h, diffuse_map=t)
        ray_o, ray_d = generate_rays(cam, W, H)
        rgb, _ = render_pass(
            s, settings, ray_o, ray_d, pixel_ids(W, H), jnp.uint32(1),
            jnp.float32(0.1), jnp.float32(3.0), 0)
        return jnp.mean(rgb ** 2)

    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1))(hdr, tex)
    vx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1))(hdr, tex)
    # Forward parity is outlier-tolerant (discrete branch flips); gradient
    # entries inherit the same rare flips, so compare with a small outlier
    # budget relative to the gradient scale.
    assert abs(float(vp) - float(vx)) < 1e-3 * max(abs(float(vx)), 1e-6)
    for a, b in zip(gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(b).max() > 0  # gradient actually flows
        scale = np.abs(b).max()
        frac = (np.abs(a - b) > 1e-3 * scale).mean()
        assert frac <= 0.02, f"{frac:.3%} grad entries diverge"


def test_out_of_range_uv_parity(tmp_path):
    """Assets legitimately carry uv outside [0,1) (tiled/offset layouts);
    the kernel must fetch them through the SAME wrap semantics as the XLA
    wavefront rather than treating negative u as its old in-band
    'no texture' sentinel."""
    p = tmp_path / "sphere.obj"
    write_uv_sphere(p, radius=12.0, n_theta=8, n_phi=12)
    host = load_obj(str(p))
    host = host._replace(uvs=(host.uvs * 2.0 - 0.7).astype(host.uvs.dtype))
    shifted = pack_mesh(host)

    rng = np.random.default_rng(11)
    hdr = jnp.asarray(rng.uniform(0, 1.5, (8, 16, 3)).astype(np.float32))
    tex = jnp.asarray(rng.uniform(0.1, 1.0, (16, 16, 3)).astype(np.float32))
    settings = RenderSettings(
        width=W, height=H, samples_per_pass=2, bounces=3,
        use_cornell_box=False, has_hdr=True, has_mesh=True,
        has_diffuse_map=True, traversal="xla")
    scene = Scene(spheres=build_sphere_set(False), mesh=shifted, hdr=hdr,
                  diffuse_map=tex)
    assert supports(scene, settings)
    rgb = _compare(scene, settings)
    assert rgb.mean() > 0.01


def test_supports_rejects_out_of_scope_spheres(mesh):
    """BRDF-typed or non-gray-specular custom spheres are outside the
    kernel's shading scope and must fall back to the XLA wavefront."""
    from vrenderer_pathtracer_tpu.scene.spheres import BRDF

    base = RenderSettings(width=W, height=H, use_cornell_box=True,
                          has_hdr=False, has_mesh=True)
    spheres = build_sphere_set(True)
    assert supports(Scene(spheres=spheres, mesh=mesh), base)
    brdf_spheres = spheres._replace(
        refl=spheres.refl.at[0].set(BRDF))
    assert not supports(Scene(spheres=brdf_spheres, mesh=mesh), base)
    tinted = spheres._replace(
        spec_color=spheres.spec_color.at[0].set(jnp.asarray([1.0, 0.5, 0.2])))
    assert not supports(Scene(spheres=tinted, mesh=mesh), base)


def test_example_sphere_merl_mis_parity():
    """brdf_importance_sampling composes with the fused kernel (round 5,
    VERDICT r4 #7): the lobe-MIS draw runs in-kernel (90-step CDF scans,
    analytic bin edges) with the SAME RNG streams as the XLA wavefront's
    ops/brdf_sampling.py path, so images agree up to the usual discrete
    outliers (bin/branch flips between the two compilations)."""
    rng = np.random.default_rng(7)
    hdr = jnp.asarray(rng.uniform(0, 1.5, (8, 16, 3)).astype(np.float32))
    # A glossy-ish synthetic table: sharp theta_h falloff exercises the
    # lobe strategy (uniform tables degenerate toward cosine).
    th = np.linspace(0, 1, 90) ** 0.5
    lobe = (np.exp(-th * 12.0)[None, :, None, None]
            * np.ones((3, 90, 90, 180)))
    table = jnp.asarray((3000.0 * lobe).reshape(3, TABLE_SIZE)
                        .astype(np.float32))
    settings = RenderSettings(
        width=W, height=H, samples_per_pass=2, bounces=3,
        use_cornell_box=False, has_hdr=True, use_example_sphere=True,
        use_brdf=True, has_brdf=True, brdf_importance_sampling=True)
    scene = Scene(spheres=build_sphere_set(False), hdr=hdr, brdf=table)
    assert supports(scene, settings)
    rgb = _compare(scene, settings, outlier_frac=0.05)
    assert rgb.mean() > 0.01


def test_mesh_merl_mis_parity(mesh):
    settings = RenderSettings(
        width=W, height=H, samples_per_pass=2, bounces=3,
        use_cornell_box=False, has_hdr=True, has_mesh=True,
        use_brdf=True, has_brdf=True, brdf_importance_sampling=True,
        traversal="xla")
    rng = np.random.default_rng(8)
    hdr = jnp.asarray(rng.uniform(0, 1.5, (8, 16, 3)).astype(np.float32))
    table = jnp.asarray(
        rng.uniform(0.0, 300.0, (3, TABLE_SIZE)).astype(np.float32))
    scene = Scene(spheres=build_sphere_set(False), mesh=mesh, hdr=hdr,
                  brdf=table)
    assert supports(scene, settings)
    rgb = _compare(scene, settings, outlier_frac=0.05)
    assert rgb.mean() > 0.01
