"""Inverse rendering demo: recover scene parameters from a target image.

The capability the reference renderer cannot offer (it is forward-only
CUDA/OpenCL): render a Cornell box with known materials, then start from
perturbed sphere albedos / emission / Fresnel parameters and recover them
by gradient descent on the pixel L2 loss — every step differentiates the
full path tracer (detached-hit convention for discrete events, ratio-trick
score gradients through the Fresnel branch; see README "Differentiable
end-to-end").

Runs on one chip or a device mesh (tiles x samples `shard_map`); each SGD
step renders a fresh sample batch (frame id advances), so the optimizer
sees unbiased gradient estimates rather than one fixed noise realisation.

    python examples/inverse_rendering.py --steps 60 --out recovered.png
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=4, help="samples per step")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.6)
    ap.add_argument("--out", default=None, help="PNG of the recovered render")
    ap.add_argument("--metrics", default=None, help="JSONL metrics log")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vrenderer_pathtracer_tpu.config import RenderSettings
    from vrenderer_pathtracer_tpu.core.camera import Camera
    from vrenderer_pathtracer_tpu.parallel.sharding import (
        TrainParams, make_render_mesh, replicate, shard_pixels,
        sharded_render_step, sharded_train_step,
    )
    from vrenderer_pathtracer_tpu.scene.scene import Scene
    from vrenderer_pathtracer_tpu.utils.metrics import MetricsLogger

    settings = RenderSettings(
        width=args.size, height=args.size, samples_per_pass=args.spp,
        bounces=4, use_cornell_box=True, has_hdr=False,
    )
    mesh = make_render_mesh(n_tiles=len(jax.devices()), n_samples=1)
    scene_true = replicate(mesh, Scene.analytic(settings))
    camera = replicate(mesh, Camera.default())
    render = sharded_render_step(mesh, settings, scene=scene_true)
    accum0 = shard_pixels(
        mesh, jnp.zeros((settings.n_pixels, 3), jnp.float32))

    # ---- ground-truth target: a converged render with the TRUE params ----
    fc_true, fp_true = jnp.float32(0.1), jnp.float32(3.0)
    accum = accum0
    for i in range(8):
        accum, target, _ = render(
            scene_true, camera, accum, jnp.uint32(1 + i), fc_true, fp_true)
    target = shard_pixels(mesh, target.reshape(-1, 3))

    # ---- perturbed start ----
    true_params = TrainParams.from_scene(jax.device_get(scene_true))
    rng = np.random.default_rng(0)

    def perturb(x):
        x = np.asarray(x, np.float32)
        return jnp.asarray(
            np.clip(x + rng.uniform(-0.25, 0.25, x.shape), 0.0, None))

    params = true_params._replace(
        color=perturb(true_params.color),
        emission=perturb(true_params.emission),
        fresnel_coef=jnp.float32(0.4),
        fresnel_pow=jnp.float32(1.5),
    )
    params = replicate(mesh, params)

    step = sharded_train_step(mesh, settings, lr=args.lr, with_metrics=True)
    log = MetricsLogger(args.metrics) if args.metrics else None

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, metrics = step(
            params, scene_true, camera, target, jnp.uint32(100 + i))
        if i % 10 == 0 or i == args.steps - 1:
            loss = float(metrics["loss"])
            gn = float(metrics["grad_global_norm"])
            print(f"step {i:3d}  loss {loss:.6f}  |g| {gn:.4f}", file=sys.stderr)
            if log:
                log.log("train_step", step=i, loss=loss, grad_norm=gn)
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({dt / args.steps * 1e3:.0f} ms/step)", file=sys.stderr)

    got = jax.device_get(params)
    want = jax.device_get(replicate(mesh, true_params))
    err_color = float(np.abs(got.color - want.color).max())
    err_fc = float(np.abs(got.fresnel_coef - want.fresnel_coef))
    print(f"max |color error| {err_color:.4f}   |fresnel_coef error| "
          f"{err_fc:.4f}", file=sys.stderr)

    if args.out:
        from vrenderer_pathtracer_tpu.io import save_png
        from vrenderer_pathtracer_tpu.parallel.sharding import _apply_params

        accum = accum0
        # Render with the recovered parameters for a visual check.
        scene_rec = _apply_params(scene_true, params)
        rset = sharded_render_step(mesh, settings, scene=scene_rec)
        for i in range(8):
            accum, img, _ = rset(
                scene_rec, camera, accum, jnp.uint32(1 + i),
                got.fresnel_coef, got.fresnel_pow)
        save_png(args.out, np.asarray(img))
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
