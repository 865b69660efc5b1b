"""Headline benchmark: Mrays/s/chip, forward+backward, Cornell 1024², 4 bounces.

The reference publishes no numbers (BASELINE.md) — this establishes ours.
Rays are counted as pixels × spp × bounces for the forward pass, doubled for
forward+backward (one grad step w.r.t. material/fresnel params).  Prints ONE
JSON line; ``vs_baseline`` compares against the previous recorded round
(``BENCH_r*.json``) when present, else 1.0.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time

import jax
import jax.numpy as jnp


def _prev_value() -> float | None:
    best = None
    for path in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
            v = float(rec.get("value", 0.0))
        except Exception:
            continue
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), v)
    return best[1] if best else None


def main():
    from vrenderer_pathtracer_tpu.config import RenderSettings
    from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays, pixel_ids
    from vrenderer_pathtracer_tpu.parallel.sharding import (
        TrainParams, make_render_mesh, replicate, shard_pixels,
        sharded_render_step, sharded_train_step,
    )
    from vrenderer_pathtracer_tpu.scene.scene import Scene

    settings = RenderSettings(
        width=1024, height=1024, samples_per_pass=2, bounces=4,
        use_cornell_box=True, has_hdr=False,
    )
    mesh = make_render_mesh(n_tiles=len(jax.devices()), n_samples=1)
    scene = replicate(mesh, Scene.analytic(settings))
    camera = replicate(mesh, Camera.default())
    accum = shard_pixels(mesh, jnp.zeros((settings.n_pixels, 3), jnp.float32))

    render = sharded_render_step(mesh, settings)
    train = sharded_train_step(mesh, settings)
    params = replicate(mesh, TrainParams.from_scene(jax.device_get(scene)))

    fc, fp = jnp.float32(0.1), jnp.float32(3.0)

    # --- forward-only warmup + timing -------------------------------------
    accum, img, depth = render(scene, camera, accum, jnp.uint32(1), fc, fp)
    jax.block_until_ready(img)
    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        accum, img, depth = render(scene, camera, accum, jnp.uint32(2 + i), fc, fp)
    jax.block_until_ready(img)
    fwd_s = (time.perf_counter() - t0) / n_iters

    # --- forward+backward (training step) ---------------------------------
    target = shard_pixels(mesh, jnp.zeros_like(img))
    params, loss = train(params, scene, camera, target, jnp.uint32(1))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(n_iters):
        params, loss = train(params, scene, camera, target, jnp.uint32(2 + i))
    jax.block_until_ready(loss)
    fwdbwd_s = (time.perf_counter() - t0) / n_iters

    rays = settings.n_pixels * settings.samples_per_pass * settings.bounces
    mrays_fwd = rays / fwd_s / 1e6
    mrays_fwdbwd = 2 * rays / fwdbwd_s / 1e6  # fwd+bwd counted as 2x ray work

    prev = _prev_value()
    record = {
        "metric": "mrays_per_s_per_chip_fwdbwd_cornell1024_4bounce",
        "value": round(mrays_fwdbwd, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_fwdbwd / prev, 4) if prev else 1.0,
        "extra": {
            "mrays_per_s_forward": round(mrays_fwd, 3),
            "fwd_ms": round(fwd_s * 1e3, 3),
            "fwdbwd_ms": round(fwdbwd_s * 1e3, 3),
            "n_devices": len(jax.devices()),
            "platform": jax.devices()[0].platform,
            "loss": float(loss),
        },
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
