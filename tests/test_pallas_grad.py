"""Backward megakernel: hand-derived gradients vs jax.value_and_grad."""

import numpy as np
import jax
import jax.numpy as jnp

from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays, pixel_ids
from vrenderer_pathtracer_tpu.parallel.sharding import TrainParams
from vrenderer_pathtracer_tpu.render.integrator import render_pass
from vrenderer_pathtracer_tpu.render.pallas_grad import cornell_loss_grads
from vrenderer_pathtracer_tpu.render.pallas_radiance import render_pass_pallas
from vrenderer_pathtracer_tpu.scene.scene import Scene

SETTINGS = RenderSettings(
    width=64, height=32, samples_per_pass=2, bounces=4,
    use_cornell_box=True, has_hdr=False,
)


def _benign_scene() -> Scene:
    """A Cornell-like sphere scene with NORMAL radii.

    The real Cornell box (r=1e5 shells, r=160 light) computes
    ``det = b^2 - |op|^2 + r^2`` with ~1e3 absolute float32 noise, so
    silhouette pixels flip hit/miss between any two compilations —
    *independently of the RNG*, because primary rays are deterministic.
    Gradient parity needs a bitwise-agreeing sample set, so the adjoint is
    validated on a scene whose intersections are well-conditioned; the real
    Cornell constants are covered by the (flip-tolerant) golden-image and
    descent tests."""
    from vrenderer_pathtracer_tpu.scene.spheres import SphereSet, SPEC, DIFF

    rows = [
        # (radius, pos, emission, color, refl, spec_color)
        (20.0, (0.0, 45.0, 0.0), (4.0, 3.6, 3.2), (0, 0, 0), DIFF, (0, 0, 0)),
        (60.0, (95.0, 0.0, 0.0), (0.075, 0.025, 0.025), (0.75, 0.25, 0.25), DIFF, (0, 0, 0)),
        (60.0, (-95.0, 0.0, 0.0), (0.025, 0.075, 0.025), (0.25, 0.75, 0.25), DIFF, (0, 0, 0)),
        (60.0, (0.0, 0.0, -120.0), (0, 0, 0), (1, 1, 1), DIFF, (0, 0, 0)),
        (60.0, (0.0, -95.0, 0.0), (0, 0, 0), (0.9, 0.9, 0.9), DIFF, (0, 0, 0)),
        (12.0, (18.0, -5.0, 20.0), (0, 0, 0), (0, 0, 0), SPEC, (1, 1, 1)),
        (12.0, (-18.0, -5.0, 20.0), (0, 0, 0), (1, 1, 1), DIFF, (1, 1, 1)),
    ]
    pos = jnp.asarray(np.array([r[1] for r in rows], np.float32))
    return Scene(spheres=SphereSet(
        pos=pos,
        radius=jnp.asarray(np.array([r[0] for r in rows], np.float32)),
        emission=jnp.asarray(np.array([r[2] for r in rows], np.float32)),
        color=jnp.asarray(np.array([r[3] for r in rows], np.float32)),
        refl=jnp.asarray(np.array([r[4] for r in rows], np.int32)),
        spec_color=jnp.asarray(np.array([r[5] for r in rows], np.float32)),
    ))


def _reference(scene, target, fc, fp, frame):
    cam = Camera.default()
    ray_o, ray_d = generate_rays(cam, SETTINGS.width, SETTINGS.height)
    ids = pixel_ids(SETTINGS.width, SETTINGS.height)
    inv_n = 1.0 / (SETTINGS.n_pixels * 3)

    def loss_fn(p):
        s2 = scene._replace(
            spheres=scene.spheres._replace(color=p.color, emission=p.emission)
        )
        rgb, _ = render_pass(
            s2, SETTINGS, ray_o, ray_d, ids, frame,
            p.fresnel_coef, p.fresnel_pow,
        )
        return jnp.sum((rgb - target) ** 2) * inv_n

    p0 = TrainParams.from_scene(scene, fresnel_coef=fc, fresnel_pow=fp)
    return jax.value_and_grad(loss_fn)(p0)


def _zero_flip_frame(scene, max_frames=24, settings=SETTINGS):
    """First frame whose XLA and Pallas forwards agree on every pixel.

    Even on the benign scene a bounce ray can land within fp noise of a
    silhouette; a flipped path shifts loss/grad sums by its whole
    contribution, so gradient parity is only bit-meaningful on a flip-free
    sample set.  Flips depend only on the RNG draws (not on fresnel
    params), so one frame serves all configs below."""
    cam = Camera.default()
    ray_o, ray_d = generate_rays(cam, settings.width, settings.height)
    ids = pixel_ids(settings.width, settings.height)
    for frame in range(1, max_frames + 1):
        f = jnp.uint32(frame)
        rgb_x, _ = render_pass(
            scene, settings, ray_o, ray_d, ids, f,
            jnp.float32(0.1), jnp.float32(3.0))
        rgb_p, _ = render_pass_pallas(
            scene, settings, cam, f, jnp.float32(0.1), jnp.float32(3.0),
            interpret=True)
        if not np.any(np.abs(np.asarray(rgb_x - rgb_p)) > 1e-5):
            return f
    raise AssertionError(
        f"no flip-free frame in 1..{max_frames}: branch-flip rate between "
        "the XLA and Pallas compilations is anomalously high")


def test_grads_match_jax_value_and_grad():
    """The hand-derived adjoint vs jax.value_and_grad of the XLA loss,
    compared on a well-conditioned scene at a flip-free frame."""
    scene = _benign_scene()
    rng = np.random.default_rng(0)
    target = jnp.asarray(
        rng.uniform(0, 0.5, (SETTINGS.n_pixels, 3)).astype(np.float32))
    frame = _zero_flip_frame(scene)

    for fc, fp in [(0.1, 3.0), (0.4, 1.5)]:
        ref_loss, ref_g = _reference(scene, target, fc, fp, frame)
        loss, dcol, dem, dfc, dfp = cornell_loss_grads(
            scene, SETTINGS, Camera.default(), target, frame,
            jnp.float32(fc), jnp.float32(fp), interpret=True,
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(dcol), np.asarray(ref_g.color), rtol=1e-2, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(dem), np.asarray(ref_g.emission), rtol=1e-2, atol=2e-4)
        np.testing.assert_allclose(
            float(dfc), float(ref_g.fresnel_coef), rtol=1e-2, atol=1e-6)
        np.testing.assert_allclose(
            float(dfp), float(ref_g.fresnel_pow), rtol=1e-2, atol=1e-6)


def test_odd_size_grads_match_jax_value_and_grad():
    """Auto-padded backward megakernel: pad lanes are masked out of the
    loss, so grads at a non-block-multiple size match jax.value_and_grad
    of the XLA loss at the SAME size."""
    odd = SETTINGS.replace(height=25)  # 64*25 = 1600 px: 448 pad lanes
    scene = _benign_scene()
    rng = np.random.default_rng(3)
    target = jnp.asarray(
        rng.uniform(0, 0.5, (odd.n_pixels, 3)).astype(np.float32))
    frame = _zero_flip_frame(scene, settings=odd)

    cam = Camera.default()
    ray_o, ray_d = generate_rays(cam, odd.width, odd.height)
    ids = pixel_ids(odd.width, odd.height)
    inv_n = 1.0 / (odd.n_pixels * 3)

    def loss_fn(p):
        s2 = scene._replace(spheres=scene.spheres._replace(
            color=p.color, emission=p.emission))
        rgb, _ = render_pass(s2, odd, ray_o, ray_d, ids, frame,
                             p.fresnel_coef, p.fresnel_pow)
        return jnp.sum((rgb - target) ** 2) * inv_n

    p0 = TrainParams.from_scene(scene, fresnel_coef=0.1, fresnel_pow=3.0)
    ref_loss, ref_g = jax.value_and_grad(loss_fn)(p0)

    loss, dcol, dem, dfc, dfp = cornell_loss_grads(
        scene, odd, cam, target, frame,
        jnp.float32(0.1), jnp.float32(3.0), interpret=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dcol), np.asarray(ref_g.color), rtol=1e-2, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(dem), np.asarray(ref_g.emission), rtol=1e-2, atol=2e-4)
    np.testing.assert_allclose(
        float(dfc), float(ref_g.fresnel_coef), rtol=1e-2, atol=1e-6)
    np.testing.assert_allclose(
        float(dfp), float(ref_g.fresnel_pow), rtol=1e-2, atol=1e-6)


def test_camera_grads_match_jax_value_and_grad():
    """The in-kernel geometric adjoint (origin/yaw/pitch/fov) vs
    jax.value_and_grad of the XLA loss w.r.t. the Camera pytree."""
    # Interpret-mode execution of the geometric adjoint is expensive; a
    # single 1024-pixel block with 3 bounces exercises every term.
    small = RenderSettings(width=32, height=32, samples_per_pass=2, bounces=3,
                           use_cornell_box=True, has_hdr=False)
    scene = _benign_scene()
    rng = np.random.default_rng(1)
    target = jnp.asarray(
        rng.uniform(0, 0.5, (small.n_pixels, 3)).astype(np.float32))
    frame = _zero_flip_frame(scene, settings=small)
    cam = Camera.default()
    ids = pixel_ids(small.width, small.height)
    inv_n = 1.0 / (small.n_pixels * 3)
    fc, fp = jnp.float32(0.1), jnp.float32(3.0)

    def loss_fn(c):
        ray_o, ray_d = generate_rays(c, small.width, small.height)
        rgb, _ = render_pass(scene, small, ray_o, ray_d, ids, frame, fc, fp)
        return jnp.sum((rgb - target) ** 2) * inv_n

    ref_loss, ref_g = jax.value_and_grad(loss_fn)(cam)

    out = cornell_loss_grads(scene, small, cam, target, frame, fc, fp,
                             interpret=True, with_camera=True)
    loss, dcol, dem, dfc, dfp, dcam = out
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dcam.origin), np.asarray(ref_g.origin),
        rtol=2e-2, atol=2e-6)
    np.testing.assert_allclose(
        float(dcam.yaw), float(ref_g.yaw), rtol=2e-2, atol=1e-5)
    np.testing.assert_allclose(
        float(dcam.pitch), float(ref_g.pitch), rtol=2e-2, atol=1e-5)
    np.testing.assert_allclose(
        float(dcam.fov_deg), float(ref_g.fov_deg), rtol=2e-2, atol=1e-6)
    # The material/fresnel grads must be unchanged by the camera extension.
    base = cornell_loss_grads(scene, small, cam, target, frame, fc, fp,
                              interpret=True)
    for a, b in zip((dcol, dem, dfc, dfp), base[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_sgd_with_pallas_grads_descends():
    """A few steps with megakernel grads reduce the loss."""
    scene = Scene.analytic(SETTINGS)
    bright = scene.spheres.emission.at[0].mul(1.5)
    target_scene = scene._replace(
        spheres=scene.spheres._replace(emission=bright))
    cam = Camera.default()
    ray_o, ray_d = generate_rays(cam, SETTINGS.width, SETTINGS.height)
    ids = pixel_ids(SETTINGS.width, SETTINGS.height)
    target, _ = render_pass(
        target_scene, SETTINGS, ray_o, ray_d, ids, jnp.uint32(1),
        jnp.float32(0.1), jnp.float32(3.0))

    import optax

    emission = scene.spheres.emission
    opt = optax.adam(0.1)
    state = opt.init(emission)
    losses = []
    for _ in range(12):
        s2 = scene._replace(spheres=scene.spheres._replace(emission=emission))
        loss, dcol, dem, dfc, dfp = cornell_loss_grads(
            s2, SETTINGS, cam, target, jnp.uint32(1),
            jnp.float32(0.1), jnp.float32(3.0), interpret=True,
        )
        losses.append(float(loss))
        updates, state = opt.update(dem, state)
        emission = optax.apply_updates(emission, updates)
    assert losses[-1] < 0.5 * losses[0], losses
