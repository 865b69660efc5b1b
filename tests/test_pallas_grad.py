"""Backward megakernel: hand-derived gradients vs jax.value_and_grad."""

import numpy as np
import jax
import jax.numpy as jnp

from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays, pixel_ids
from vrenderer_pathtracer_tpu.parallel.sharding import TrainParams
from vrenderer_pathtracer_tpu.render.integrator import render_pass
from vrenderer_pathtracer_tpu.render.pallas_grad import cornell_loss_grads
from vrenderer_pathtracer_tpu.scene.scene import Scene

SETTINGS = RenderSettings(
    width=64, height=32, samples_per_pass=2, bounces=4,
    use_cornell_box=True, has_hdr=False,
)


def _reference(scene, target, fc, fp):
    cam = Camera.default()
    ray_o, ray_d = generate_rays(cam, SETTINGS.width, SETTINGS.height)
    ids = pixel_ids(SETTINGS.width, SETTINGS.height)
    inv_n = 1.0 / (SETTINGS.n_pixels * 3)

    def loss_fn(p):
        s2 = scene._replace(
            spheres=scene.spheres._replace(color=p.color, emission=p.emission)
        )
        rgb, _ = render_pass(
            s2, SETTINGS, ray_o, ray_d, ids, jnp.uint32(1),
            p.fresnel_coef, p.fresnel_pow,
        )
        return jnp.sum((rgb - target) ** 2) * inv_n

    p0 = TrainParams.from_scene(scene, fresnel_coef=fc, fresnel_pow=fp)
    return jax.value_and_grad(loss_fn)(p0)


def test_grads_match_jax_value_and_grad():
    scene = Scene.analytic(SETTINGS)
    rng = np.random.default_rng(0)
    target = jnp.asarray(
        rng.uniform(0, 0.5, (SETTINGS.n_pixels, 3)).astype(np.float32))

    for fc, fp in [(0.1, 3.0), (0.4, 1.5)]:
        ref_loss, ref_g = _reference(scene, target, fc, fp)
        loss, dcol, dem, dfc, dfp = cornell_loss_grads(
            scene, SETTINGS, Camera.default(), target, jnp.uint32(1),
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
