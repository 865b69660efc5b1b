"""Multi-device sharding tests on an 8-way virtual CPU mesh (SURVEY §4.4).

Validates the SPMD invariant that makes the sharding design sound: the
counter-based RNG (core/rng.py) makes the radiance estimate a pure function
of (pixel, sample) identity, so any tile/sample sharding must reproduce the
single-device image bit-for-bit (up to fp reduction order on the sample mean).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays, pixel_ids
from vrenderer_pathtracer_tpu.parallel.sharding import (
    TrainParams,
    make_render_mesh,
    replicate,
    shard_pixels,
    sharded_render_step,
    sharded_train_step,
)
from vrenderer_pathtracer_tpu.render.integrator import render_pass
from vrenderer_pathtracer_tpu.scene.scene import Scene

from tests.conftest import cpu_devices


SETTINGS = RenderSettings(
    width=32, height=16, samples_per_pass=4, bounces=2,
    use_cornell_box=True, has_hdr=False,
)


def _single_device_pass(settings):
    scene = Scene.analytic(settings)
    cam = Camera.default()
    ray_o, ray_d = generate_rays(cam, settings.width, settings.height)
    ids = pixel_ids(settings.width, settings.height)
    rgb, depth = render_pass(
        scene, settings, ray_o, ray_d, ids, jnp.uint32(1),
        jnp.float32(0.1), jnp.float32(3.0),
    )
    return np.asarray(rgb), np.asarray(depth)


def _sharded_pass(settings, n_tiles, n_samples):
    mesh = make_render_mesh(
        n_tiles=n_tiles, n_samples=n_samples,
        devices=cpu_devices()[: n_tiles * n_samples],
    )
    scene = replicate(mesh, Scene.analytic(settings))
    cam = replicate(mesh, Camera.default())
    accum = shard_pixels(mesh, jnp.zeros((settings.n_pixels, 3), jnp.float32))
    step = sharded_render_step(mesh, settings)
    accum, img, depth = step(
        scene, cam, accum, jnp.uint32(1), jnp.float32(0.1), jnp.float32(3.0)
    )
    return np.asarray(accum), np.asarray(depth)


def test_eight_cpu_devices_available():
    assert len(cpu_devices()) >= 8


def test_sharded_invariant_to_mesh_shape():
    """Resharding must not change the image.

    Tile sharding is communication-free → bitwise identical.  Sample sharding
    changes only the order of the sample-mean reduction → ULP-level close.
    """
    base_rgb, base_depth = _sharded_pass(SETTINGS, 1, 1)
    for n_tiles, n_samples in [(8, 1), (4, 2), (2, 4)]:
        rgb, depth = _sharded_pass(SETTINGS, n_tiles, n_samples)
        if n_samples == 1:
            np.testing.assert_array_equal(rgb, base_rgb)
        else:
            np.testing.assert_allclose(rgb, base_rgb, atol=1e-6)
        np.testing.assert_allclose(depth, base_depth, atol=1e-6)


def test_sharded_matches_single_device():
    """shard_map body vs the plain program: same estimator, but the two
    XLA programs fuse differently, so ULP-level fp drift may flip discrete
    branches (argmin hit selection, Fresnel RNG compare) on isolated pixels.
    Assert agreement everywhere except a <1% discontinuity set, and bounded
    deviation on that set."""
    ref_rgb, ref_depth = _single_device_pass(SETTINGS)
    rgb, depth = _sharded_pass(SETTINGS, 8, 1)
    diff = np.abs(rgb - ref_rgb)
    frac_mismatch = (diff > 1e-5).mean()
    assert frac_mismatch < 0.01, f"{frac_mismatch:.3%} of elements mismatch"
    assert diff.max() < 0.05, f"max deviation {diff.max()}"
    np.testing.assert_allclose(depth, ref_depth, atol=5e-4)


def test_train_step_gradient_matches_single_device():
    """psum'd sharded grads == jax.grad on one device."""
    settings = SETTINGS
    scene = Scene.analytic(settings)
    cam = Camera.default()

    # Single-device reference gradient of the same loss.
    ray_o, ray_d = generate_rays(cam, settings.width, settings.height)
    ids = pixel_ids(settings.width, settings.height)
    target = jnp.zeros((settings.n_pixels, 3), jnp.float32)
    inv_n = 1.0 / (settings.n_pixels * 3)

    def loss_fn(p):
        s2 = scene._replace(
            spheres=scene.spheres._replace(color=p.color, emission=p.emission)
        )
        rgb, _ = render_pass(
            s2, settings, ray_o, ray_d, ids, jnp.uint32(1),
            p.fresnel_coef, p.fresnel_pow,
        )
        return jnp.sum((rgb - target) ** 2) * inv_n

    params0 = TrainParams.from_scene(scene)
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params0)

    lr = 0.05
    results = {}
    for n_tiles, n_samples in [(8, 1), (4, 2)]:
        mesh = make_render_mesh(
            n_tiles=n_tiles, n_samples=n_samples,
            devices=cpu_devices()[: n_tiles * n_samples],
        )
        step = sharded_train_step(mesh, settings, lr=lr)
        p_new, loss = step(
            replicate(mesh, params0),
            replicate(mesh, scene),
            replicate(mesh, cam),
            shard_pixels(mesh, target),
            jnp.uint32(1),
        )
        # vs the differently-compiled single-device program: loose (branch
        # flips on discontinuity pixels perturb the Monte-Carlo estimate).
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-3)
        rec = jax.tree.map(lambda a, b: (a - b) / lr, params0, p_new)
        for g_ref, g in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(rec)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(g_ref), rtol=2e-2, atol=2e-3
            )
        results[(n_tiles, n_samples)] = (float(loss), jax.tree.leaves(rec))

    # Across mesh shapes the estimator is identical: tight agreement.
    (l1, g1), (l2, g2) = results[(8, 1)], results[(4, 2)]
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)


def test_dryrun_multichip_entrypoint():
    """The driver's dry-run contract must work on the virtual CPU mesh."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    accum, img, depth = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(img)).all()


def test_renderer_with_device_mesh():
    """The Renderer facade runs its progressive loop through shard_map and
    matches the single-device renderer (tile sharding is bitwise)."""
    from vrenderer_pathtracer_tpu import Renderer

    mesh = make_render_mesh(n_tiles=4, n_samples=2, devices=cpu_devices()[:8])
    r_sharded = Renderer(32, 16, settings=SETTINGS, device_mesh=mesh)
    r_plain = Renderer(32, 16, settings=SETTINGS)
    for _ in range(2):
        img_s, depth_s = r_sharded.render()
        img_p, depth_p = r_plain.render()
    # Same estimator; cross-compilation fp drift allowed on outlier pixels.
    d = np.abs(np.asarray(img_s) - np.asarray(img_p))
    assert (d > 1e-5).mean() < 0.01 and d.max() < 0.05
    assert r_sharded.get_frame_count() == r_plain.get_frame_count()


def test_sample_chunking_identical():
    """samples_per_chunk shapes memory only — same estimator; only the
    sample-sum association changes (ULP-level)."""
    full = _single_device_pass(SETTINGS)
    chunked = _single_device_pass(SETTINGS.replace(samples_per_chunk=2))
    np.testing.assert_allclose(chunked[0], full[0], atol=2e-6)
    np.testing.assert_array_equal(chunked[1], full[1])


def test_train_step_with_camera_and_env_params():
    """Extended TrainParams (camera + env map) flow through the sharded
    step: psum'd grads equal single-device jax.grad."""
    settings = SETTINGS.replace(use_cornell_box=False, has_hdr=True)
    rng = np.random.default_rng(5)
    hdr = jnp.asarray(rng.uniform(0.2, 1.0, (8, 16, 3)).astype(np.float32))
    scene = Scene.analytic(settings, hdr=hdr)
    cam = Camera.default()
    target = jnp.zeros((settings.n_pixels, 3), jnp.float32)
    inv_n = 1.0 / (settings.n_pixels * 3)

    params0 = TrainParams.from_scene(scene, camera=cam, optimize_hdr=True)

    def loss_fn(p):
        s2 = scene._replace(
            spheres=scene.spheres._replace(color=p.color, emission=p.emission),
            hdr=p.hdr,
        )
        ray_o, ray_d = generate_rays(p.camera, settings.width, settings.height)
        ids = pixel_ids(settings.width, settings.height)
        rgb, _ = render_pass(
            s2, settings, ray_o, ray_d, ids, jnp.uint32(1),
            p.fresnel_coef, p.fresnel_pow,
        )
        return jnp.sum((rgb - target) ** 2) * inv_n

    ref_loss, ref_g = jax.value_and_grad(loss_fn)(params0)
    assert float(jnp.abs(ref_g.hdr).sum()) > 0
    assert float(jnp.abs(ref_g.camera.yaw)) >= 0

    mesh = make_render_mesh(n_tiles=4, n_samples=2, devices=cpu_devices()[:8])
    lr = 0.05
    step = sharded_train_step(mesh, settings, lr=lr)
    p_new, loss = step(
        replicate(mesh, params0), replicate(mesh, scene),
        replicate(mesh, cam), shard_pixels(mesh, target), jnp.uint32(1),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-3)
    rec = jax.tree.map(lambda a, b: (a - b) / lr, params0, p_new)
    np.testing.assert_allclose(
        np.asarray(rec.hdr), np.asarray(ref_g.hdr), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(
        float(rec.camera.yaw), float(ref_g.camera.yaw), rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(
        float(rec.camera.fov_deg), float(ref_g.camera.fov_deg),
        rtol=2e-2, atol=1e-4)


def test_train_step_with_metrics():
    """with_metrics=True returns a replicated structured dict whose loss
    matches the plain step and whose norms are finite (SURVEY §5.5)."""
    settings = RenderSettings(
        width=32, height=32, samples_per_pass=2, bounces=2,
        use_cornell_box=True, has_hdr=False,
    )
    scene = Scene.analytic(settings)
    cam = Camera.default()
    target = jnp.zeros((settings.n_pixels, 3), jnp.float32)
    params0 = TrainParams.from_scene(scene)
    mesh = make_render_mesh(n_tiles=4, n_samples=1, devices=cpu_devices()[:4])
    args = (replicate(mesh, params0), replicate(mesh, scene),
            replicate(mesh, cam), shard_pixels(mesh, target), jnp.uint32(1))
    _, loss = sharded_train_step(mesh, settings)(*args)
    p2, metrics = sharded_train_step(mesh, settings, with_metrics=True)(*args)
    assert set(metrics) == {"loss", "grad_global_norm", "update_norm"}
    np.testing.assert_allclose(float(metrics["loss"]), float(loss), rtol=1e-6)
    assert np.isfinite(float(metrics["grad_global_norm"]))
    assert float(metrics["grad_global_norm"]) > 0


def test_sharded_opt_step_adam():
    """Optax step: loss decreases over a few adam iterations; metrics dict
    replicated and finite."""
    import optax

    from vrenderer_pathtracer_tpu.parallel.sharding import sharded_opt_step

    settings = RenderSettings(
        width=32, height=32, samples_per_pass=2, bounces=2,
        use_cornell_box=True, has_hdr=False,
    )
    scene = Scene.analytic(settings)
    cam = Camera.default()
    mesh = make_render_mesh(n_tiles=4, n_samples=1, devices=cpu_devices()[:4])

    # Target: render with TRUE params; start perturbed.
    from vrenderer_pathtracer_tpu.core.camera import generate_rays, pixel_ids
    rgb, _ = render_pass(
        scene, settings.replace(radiance_kernel="xla"),
        *generate_rays(cam, 32, 32), pixel_ids(32, 32), jnp.uint32(1),
        jnp.float32(0.1), jnp.float32(3.0))
    target = shard_pixels(mesh, rgb)

    p0 = TrainParams.from_scene(scene)
    p0 = p0._replace(color=jnp.clip(p0.color + 0.2, 0, 1))
    opt = optax.adam(0.05)
    opt_state = jax.device_get(opt.init(jax.device_get(p0)))
    step = sharded_opt_step(mesh, settings, opt)
    params = replicate(mesh, p0)
    opt_state = replicate(mesh, opt_state)
    losses = []
    for i in range(6):
        params, opt_state, metrics = step(
            params, opt_state, replicate(mesh, scene), replicate(mesh, cam),
            target, jnp.uint32(5 + i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] * 0.7


def test_sharded_deferred_opt_step_env_map():
    """Deferred-table training (parallel/sharding.py DeferredParams): env-map
    gradients flow through the epilogue only; the sharded step's gradient
    matches the single-device jax.grad, and adam recovers a perturbed map."""
    import optax

    from vrenderer_pathtracer_tpu.parallel.sharding import (
        DeferredParams, sharded_deferred_opt_step)

    rng = np.random.default_rng(11)
    hdr_true = jnp.asarray(rng.uniform(0.2, 1.5, (8, 16, 3)).astype(np.float32))
    settings = RenderSettings(
        width=32, height=32, samples_per_pass=2, bounces=2,
        use_cornell_box=False, has_hdr=True,
    )
    from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set

    scene = Scene(spheres=build_sphere_set(False), hdr=hdr_true)
    cam = Camera.default()
    mesh = make_render_mesh(n_tiles=4, n_samples=1, devices=cpu_devices()[:4])

    rgb, _ = render_pass(
        scene, settings.replace(radiance_kernel="xla"),
        *generate_rays(cam, 32, 32), pixel_ids(32, 32), jnp.uint32(1),
        jnp.float32(0.1), jnp.float32(3.0))
    target = shard_pixels(mesh, rgb)

    p0 = DeferredParams(hdr=jnp.clip(hdr_true + 0.3, 0, None))
    opt = optax.adam(0.3)
    opt_state = jax.device_get(opt.init(jax.device_get(p0)))
    step = sharded_deferred_opt_step(mesh, settings, opt, scene=scene)
    params = replicate(mesh, p0)
    opt_state = replicate(mesh, opt_state)
    losses = []
    for i in range(6):
        params, opt_state, metrics = step(
            params, opt_state, replicate(mesh, scene), replicate(mesh, cam),
            target, jnp.uint32(5 + i), jnp.float32(0.1), jnp.float32(3.0))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] * 0.7

    # Sharded gradient == single-device gradient (same frame/streams).
    def loss_single(h):
        s = scene._replace(hdr=h)
        out, _ = render_pass(
            s, settings.replace(radiance_kernel="xla"),
            *generate_rays(cam, 32, 32), pixel_ids(32, 32), jnp.uint32(5),
            jnp.float32(0.1), jnp.float32(3.0))
        return jnp.sum((out - rgb) ** 2) / (settings.n_pixels * 3)

    g_single = jax.grad(loss_single)(p0.hdr)
    sgd = optax.sgd(1.0)
    st = sharded_deferred_opt_step(mesh, settings, sgd, scene=scene)
    p1, _, _ = st(replicate(mesh, p0),
                  replicate(mesh, jax.device_get(sgd.init(jax.device_get(p0)))),
                  replicate(mesh, scene), replicate(mesh, cam), target,
                  jnp.uint32(5), jnp.float32(0.1), jnp.float32(3.0))
    g_sharded = np.asarray(p0.hdr - p1.hdr)  # sgd(1.0): update == -grad
    np.testing.assert_allclose(g_sharded, np.asarray(g_single),
                               rtol=1e-4, atol=1e-6)


def test_sharded_compact_waves_matches_single_device():
    """Compact bounce waves compose with shard_map: the nonzero/cond/
    gather-scatter machinery inside each shard must reproduce the
    unsharded compact render (guards the config-5 sharded path)."""
    from tests.test_mesh_render import write_uv_sphere
    from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
    from vrenderer_pathtracer_tpu.native import load_obj
    from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set
    import tempfile
    import os

    p = os.path.join(tempfile.mkdtemp(), "s.obj")
    write_uv_sphere(p, radius=10.0, n_theta=12, n_phi=12)
    scene = Scene(spheres=build_sphere_set(False),
                  mesh=pack_mesh(load_obj(p)),
                  hdr=jnp.full((8, 16, 3), 0.4, jnp.float32))
    settings = RenderSettings(
        width=32, height=16, samples_per_pass=4, bounces=2,
        use_cornell_box=False, has_mesh=True, radiance_kernel="xla",
        compact_waves=True)

    cam = Camera.default()
    ray_o, ray_d = generate_rays(cam, settings.width, settings.height)
    ids = pixel_ids(settings.width, settings.height)
    rgb0, _ = render_pass(scene, settings, ray_o, ray_d, ids, jnp.uint32(1),
                          jnp.float32(0.1), jnp.float32(3.0))

    mesh = make_render_mesh(n_tiles=2, n_samples=2, devices=cpu_devices()[:4])
    scene_r = replicate(mesh, scene)
    accum = shard_pixels(mesh, jnp.zeros((settings.n_pixels, 3), jnp.float32))
    step = sharded_render_step(mesh, settings)
    accum1, img1, _ = step(scene_r, replicate(mesh, cam), accum,
                           jnp.uint32(1), jnp.float32(0.1), jnp.float32(3.0))
    np.testing.assert_allclose(np.asarray(rgb0), np.asarray(accum1),
                               rtol=2e-5, atol=2e-5)
