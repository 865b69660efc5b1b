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

# Persistent compilation cache: compiles through the remote hop are volatile
# (tens of seconds to minutes); cached executables make repeat bench runs
# start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _prev_value() -> float | None:
    best = None
    for path in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
            # The driver wraps the bench line: {"n":.., "parsed": {...}}.
            if "parsed" in rec and isinstance(rec["parsed"], dict):
                rec = rec["parsed"]
            v = float(rec.get("value", 0.0))
        except Exception:
            continue
        if v and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), v)
    return best[1] if best else None


_T_START = time.perf_counter()


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

    # Resolve "auto" backends from the concrete scene (round-1 bug: the raw
    # "auto" string reached _shard_pass, which dispatches on the resolved
    # value only, so the forward bench silently measured the XLA wavefront).
    render = sharded_render_step(mesh, settings, scene=scene)
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
    mrays_fwdbwd_xla = 2 * rays / fwdbwd_s / 1e6

    # --- headline: fwd+bwd through the Pallas radiance megakernels --------
    # (render/pallas_grad.py: forward replay + hand-derived reverse sweep in
    # VMEM; same loss/grads as the XLA train step, ~7x faster)
    #
    # Median-of-groups: tunnel run-to-run variance was +-20% round over round
    # (2450-3084 Mrays/s) which swamped real 10-20% wins.  We time G
    # independent groups of K varied-input calls each and report the MEDIAN
    # group time, with the min/max group spread recorded for dispersion.
    pallas_fwdbwd_s = None
    pallas_group_spread = None
    try:
        from vrenderer_pathtracer_tpu.core.camera import Camera
        from vrenderer_pathtracer_tpu.render.pallas_grad import cornell_loss_grads
        from vrenderer_pathtracer_tpu.scene.scene import Scene as _Scene

        local_scene = _Scene.analytic(settings)
        cam = Camera.default()
        tgt = jnp.zeros((settings.n_pixels, 3), jnp.float32)
        out = cornell_loss_grads(local_scene, settings, cam, tgt, jnp.uint32(1),
                                 fc, fp)
        jax.block_until_ready(out)
        n_groups, k = 5, 8
        group_s = []
        frame = 2
        for _ in range(n_groups):
            t0 = time.perf_counter()
            outs = []
            for _ in range(k):
                outs.append(cornell_loss_grads(
                    local_scene, settings, cam, tgt, jnp.uint32(frame), fc, fp))
                frame += 1
            jax.block_until_ready(outs)
            group_s.append((time.perf_counter() - t0) / k)
        group_s.sort()
        pallas_fwdbwd_s = group_s[len(group_s) // 2]
        pallas_group_spread = (round(group_s[0] * 1e3, 3),
                               round(group_s[-1] * 1e3, 3))
        # Device-time cross-check (round-5 addition): wall groups through
        # the tunnel carry ~±10% relay dispatch variance — round 3 vs 4
        # "regressed" 3077→2885 Mrays/s on wall while the compiled kernel
        # was bit-identical (same executable fingerprint) and its device
        # time matched to the microsecond.  Profiler device events are
        # dispatch-immune; record them alongside the wall number.
        try:
            import collections
            import glob as _glob
            import gzip
            import tempfile

            d = tempfile.mkdtemp()
            with jax.profiler.trace(d):
                outs = []
                for _ in range(8):
                    outs.append(cornell_loss_grads(
                        local_scene, settings, cam, tgt, jnp.uint32(frame),
                        fc, fp))
                    frame += 1
                jax.block_until_ready(outs)
            path = sorted(_glob.glob(
                f"{d}/plugins/profile/*/*.trace.json.gz"))[-1]
            with gzip.open(path) as f:
                tr = json.load(f)
            agg = collections.defaultdict(float)
            for e in tr["traceEvents"]:
                if e.get("ph") == "X":
                    agg[e["name"]] += e.get("dur", 0)
            dev_us = max(
                (v for k, v in agg.items() if "cornell_loss_grads" in k
                 and not k.startswith(("jit_", "Pjit", "$"))),
                default=0.0)
            if dev_us:
                pallas_device_ms = round(dev_us / 8 / 1e3, 3)
            else:
                pallas_device_ms = None
        except Exception:
            pallas_device_ms = None
    except Exception:
        pallas_device_ms = None

    if pallas_fwdbwd_s is not None:
        mrays_fwdbwd = 2 * rays / pallas_fwdbwd_s / 1e6
    else:
        mrays_fwdbwd = mrays_fwdbwd_xla

    # Optional extras are skipped if compile volatility already burned the
    # budget (remote compiles occasionally take minutes) — the headline
    # number must always make it out.
    elapsed = time.perf_counter() - _T_START
    if elapsed < 400:
        mesh_stats = _mesh_bench()
    else:
        mesh_stats = {"mesh_bench": f"skipped (elapsed {elapsed:.0f}s)"}
    elapsed = time.perf_counter() - _T_START
    if elapsed < 450:
        mega_stats = _megakernel_bench(settings)
    else:
        mega_stats = {"megakernel": f"skipped (elapsed {elapsed:.0f}s)"}
    elapsed = time.perf_counter() - _T_START
    if elapsed < 480:
        paged_stats = _paged_bench()
    else:
        paged_stats = {"paged_bench": f"skipped (elapsed {elapsed:.0f}s)"}
    elapsed = time.perf_counter() - _T_START
    if elapsed < 540:
        mesh_mega_stats = _mesh_megakernel_bench()
    else:
        mesh_mega_stats = {"mesh_megakernel": f"skipped (elapsed {elapsed:.0f}s)"}
    elapsed = time.perf_counter() - _T_START
    if elapsed < 720:
        nm_stats = _nm_wavefront_bench()
    else:
        nm_stats = {"nm_wavefront": f"skipped (elapsed {elapsed:.0f}s)"}
    elapsed = time.perf_counter() - _T_START
    if elapsed < 600:
        c5_stats = _config5_bench()
    else:
        c5_stats = {"c5_spec": f"skipped (elapsed {elapsed:.0f}s)"}

    prev = _prev_value()
    record = {
        "metric": "mrays_per_s_per_chip_fwdbwd_cornell1024_4bounce",
        "value": round(mrays_fwdbwd, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_fwdbwd / prev, 4) if prev else 1.0,
        "extra": {
            "mrays_per_s_forward": round(mrays_fwd, 3),
            "fwd_ms": round(fwd_s * 1e3, 3),
            "fwdbwd_xla_ms": round(fwdbwd_s * 1e3, 3),
            "mrays_per_s_fwdbwd_xla": round(mrays_fwdbwd_xla, 3),
            "fwdbwd_pallas_ms": (
                round(pallas_fwdbwd_s * 1e3, 3) if pallas_fwdbwd_s else None),
            "fwdbwd_pallas_ms_group_minmax": pallas_group_spread,
            "fwdbwd_pallas_device_ms": pallas_device_ms,
            "n_devices": len(jax.devices()),
            "platform": jax.devices()[0].platform,
            "loss": float(loss),
            **mesh_stats,
            **mega_stats,
            **paged_stats,
            **mesh_mega_stats,
            **nm_stats,
            **c5_stats,
        },
    }
    print(json.dumps(record))


def _config5_bench() -> dict:
    """Flagship metric: config-5 AT SPEC steady-state pass (1920x1080,
    2 spp, 4 bounces, ~500k-tri paged mesh, HDRI + MERL + FXAA) through
    the real Renderer — exercises paged traversal, compact bounce waves
    and the measured static specialization end-to-end (round 5:
    0.83 -> ~0.35 s/pass)."""
    import tempfile

    try:
        from examples.config5 import synth_assets
        from vrenderer_pathtracer_tpu import Renderer, RenderSettings

        tmp = tempfile.mkdtemp()
        obj, hdr, brdf = synth_assets(tmp)
        r = Renderer(1920, 1080, settings=RenderSettings(
            samples_per_pass=2, bounces=4, use_fxaa=True, use_brdf=True,
            remat_bounces=True))
        r.load_hdr(hdr)
        r.load_brdf(brdf)
        r.load_mesh(obj)
        # Two warm passes: the first compiles; the second carries the
        # renderer's measured compact-mode recompile.
        r.render()
        jax.block_until_ready(r._accum)
        r.render()
        jax.block_until_ready(r._accum)
        n_pass = 3
        t0 = time.perf_counter()
        for _ in range(n_pass):
            r.render()
        jax.block_until_ready(r._accum)
        dt = (time.perf_counter() - t0) / n_pass
        rays = 1920 * 1080 * 2 * 4
        return {
            "c5_spec_pass_ms": round(dt * 1e3, 1),
            "c5_spec_mrays_per_s": round(rays / dt / 1e6, 1),
            "c5_compact_mode": r.settings.compact_mode,
        }
    except Exception as e:  # never let an auxiliary metric kill the bench
        return {"c5_spec_error": f"{type(e).__name__}: {e}"}


def _nm_wavefront_bench() -> dict:
    """Quinary metric: the XLA wavefront with Pallas traversal on the
    config-3 scene PLUS normal+specular maps — the scene class the fused
    megakernel excludes (VERDICT round-3 #2; hoisted tile permutation +
    combined-map fetch are its round-4 levers)."""
    import tempfile

    import numpy as np

    try:
        from tests.test_mesh_render import write_uv_sphere
        from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
        from vrenderer_pathtracer_tpu.config import RenderSettings
        from vrenderer_pathtracer_tpu.core.camera import (
            Camera, generate_rays, pixel_ids)
        from vrenderer_pathtracer_tpu.native import load_obj
        from vrenderer_pathtracer_tpu.render.integrator import render_pass
        from vrenderer_pathtracer_tpu.scene.scene import (
            Scene, settings_for_scene)
        from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set

        p = os.path.join(tempfile.mkdtemp(), "bench_sphere_nm.obj")
        write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
        mesh = pack_mesh(load_obj(p))
        rng = np.random.default_rng(0)
        hdr = jnp.asarray(rng.uniform(0, 1.5, (64, 128, 3)).astype(np.float32))
        tex = jnp.asarray(rng.uniform(0.1, 1, (256, 256, 3)).astype(np.float32))
        nmap = jnp.asarray((rng.uniform(0, 1, (256, 256, 3)) * 0.2
                            + (0.4, 0.4, 0.8)).astype(np.float32))
        smap = jnp.asarray(rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))
        scene = Scene(spheres=build_sphere_set(False), mesh=mesh, hdr=hdr,
                      diffuse_map=tex, normal_map=nmap, specular_map=smap)
        settings = settings_for_scene(scene, RenderSettings(
            width=1024, height=1024, samples_per_pass=2, bounces=4,
            use_cornell_box=False)).replace(radiance_kernel="xla")
        if settings.traversal != "pallas":
            return {"nm_wavefront": f"traversal={settings.traversal}"}
        cams = [Camera.default()._replace(
            origin=jnp.asarray([1e-4 * i, 0.0, 40.0], jnp.float32))
            for i in range(11)]

        @jax.jit
        def run(cam, frame):
            ro, rd = generate_rays(cam, settings.width, settings.height)
            ids = pixel_ids(settings.width, settings.height)
            return render_pass(scene, settings, ro, rd, ids,
                               jnp.uint32(frame), jnp.float32(0.1),
                               jnp.float32(3.0))

        jax.block_until_ready(run(cams[-1], 1))
        t0 = time.perf_counter()
        outs = [run(cams[i], 2 + i) for i in range(10)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 10
        rays = settings.n_pixels * settings.samples_per_pass * settings.bounces
        return {
            "nm_wavefront_mrays_per_s": round(rays / dt / 1e6, 1),
            "nm_wavefront_pass_ms": round(dt * 1e3, 3),
        }
    except Exception as e:  # never let an auxiliary metric kill the bench
        return {"nm_wavefront_error": f"{type(e).__name__}: {e}"}


def _megakernel_bench(settings) -> dict:
    """Forward progressive pass through the Pallas radiance megakernel."""
    try:
        from vrenderer_pathtracer_tpu import Renderer

        r = Renderer(settings.width, settings.height, settings=settings)
        if r.settings.radiance_kernel != "pallas":
            return {"megakernel": "unavailable"}
        r.render()
        jax.block_until_ready(r._accum)
        n_iters = 20
        t0 = time.perf_counter()
        for _ in range(n_iters):
            r.render()
        jax.block_until_ready(r._accum)
        dt = (time.perf_counter() - t0) / n_iters
        rays = settings.n_pixels * settings.samples_per_pass * settings.bounces
        return {
            "megakernel_fwd_mrays_per_s": round(rays / dt / 1e6, 1),
            "megakernel_pass_ms": round(dt * 1e3, 3),
        }
    except Exception as e:
        return {"megakernel_error": f"{type(e).__name__}: {e}"}


def _paged_bench() -> dict:
    """Tertiary metric: dense paged kernel, 180k-tri mesh forced paged."""
    import tempfile

    import numpy as np

    try:
        from tests.test_mesh_render import write_uv_sphere
        from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
        from vrenderer_pathtracer_tpu.accel.pallas_paged import traverse_paged
        from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays
        from vrenderer_pathtracer_tpu.native import load_obj

        p = os.path.join(tempfile.mkdtemp(), "bench_sphere_big.obj")
        write_uv_sphere(p, radius=12.0, n_theta=300, n_phi=300)
        mesh = pack_mesh(load_obj(p), paged=True)
        n_it = 10
        rays = []
        for i in range(n_it + 1):
            cam = Camera.default()._replace(
                origin=jnp.asarray([1e-4 * i, 0.0, 28.0], jnp.float32))
            rays.append(generate_rays(cam, 1024, 512))
        b = rays[0][0].shape[0]
        tmax = jnp.full((b,), 1e6, jnp.float32)

        def run(o, d):
            return traverse_paged(mesh, o, d, tmax, image_shape=(512, 1024))

        slot, t = run(*rays[n_it])
        jax.block_until_ready((slot, t))
        t0 = time.perf_counter()
        outs = [run(o, d) for o, d in rays[:n_it]]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n_it
        return {
            "paged_traversal_mrays_per_s": round(b / dt / 1e6, 1),
            "paged_tris": int(np.asarray(mesh.tri_count)),
            "paged_pages": int(mesh.paged.nodes8_f.shape[0]),
        }
    except Exception as e:  # never let a tertiary metric kill the bench
        return {"paged_bench_error": f"{type(e).__name__}: {e}"}


def _mesh_megakernel_bench() -> dict:
    """Quaternary metric: the fused mesh-scene radiance megakernel
    (render/pallas_mesh.py) on a config-3-like scene — 28.5k-tri textured
    mesh under an HDRI, full bounce loop + deferred-table epilogue."""
    import tempfile

    import numpy as np

    try:
        from tests.test_mesh_render import write_uv_sphere
        from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
        from vrenderer_pathtracer_tpu.config import RenderSettings
        from vrenderer_pathtracer_tpu.core.camera import Camera
        from vrenderer_pathtracer_tpu.native import load_obj
        from vrenderer_pathtracer_tpu.render.pallas_mesh import (
            render_pass_mesh_pallas, supports)
        from vrenderer_pathtracer_tpu.scene.scene import Scene
        from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set

        p = os.path.join(tempfile.mkdtemp(), "bench_sphere.obj")
        write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
        mesh = pack_mesh(load_obj(p))
        rng = np.random.default_rng(0)
        hdr = jnp.asarray(rng.uniform(0, 1.5, (64, 128, 3)).astype(np.float32))
        tex = jnp.asarray(rng.uniform(0.1, 1, (256, 256, 3)).astype(np.float32))
        settings = RenderSettings(
            width=1024, height=1024, samples_per_pass=2, bounces=4,
            use_cornell_box=False, has_hdr=True, has_mesh=True,
            has_diffuse_map=True)
        scene = Scene(spheres=build_sphere_set(False), mesh=mesh, hdr=hdr,
                      diffuse_map=tex)
        if not supports(scene, settings):
            return {"mesh_megakernel": "unsupported scene"}
        n_it = 20
        cams = [Camera.default()._replace(
            origin=jnp.asarray([1e-4 * i, 0.0, 40.0], jnp.float32))
            for i in range(n_it + 1)]

        def run(cam, frame):
            return render_pass_mesh_pallas(
                scene, settings, cam, jnp.uint32(frame), jnp.float32(0.1),
                jnp.float32(3.0))

        jax.block_until_ready(run(cams[n_it], 1))
        t0 = time.perf_counter()
        outs = [run(cams[i], 2 + i) for i in range(n_it)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n_it
        rays = settings.n_pixels * settings.samples_per_pass * settings.bounces
        return {
            "mesh_megakernel_fwd_mrays_per_s": round(rays / dt / 1e6, 1),
            "mesh_megakernel_pass_ms": round(dt * 1e3, 3),
        }
    except Exception as e:  # never let a tertiary metric kill the bench
        return {"mesh_megakernel_error": f"{type(e).__name__}: {e}"}


def _mesh_bench() -> dict:
    """Secondary metric: Pallas packet traversal on a 28.5k-tri mesh."""
    import tempfile

    import numpy as np

    try:
        from tests.test_mesh_render import write_uv_sphere
        from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
        from vrenderer_pathtracer_tpu.accel.pallas_traverse import traverse_packets
        from vrenderer_pathtracer_tpu.core.camera import Camera
        from vrenderer_pathtracer_tpu.core.camera import generate_rays
        from vrenderer_pathtracer_tpu.native import load_obj

        p = os.path.join(tempfile.mkdtemp(), "bench_sphere.obj")
        write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
        mesh = pack_mesh(load_obj(p))
        # Vary inputs across iterations (sub-pixel camera jitter): repeating
        # a call with IDENTICAL arrays reports impossibly fast times over
        # the tunnel (see CLAUDE.md) — we measured a false 2900 Mrays/s once.
        # 20 timing iterations: short pipelined bursts right after warmup
        # have reported relay-artifact times (a false 7526 Mrays/s at 5
        # iterations vs the honest ~80 at 20, cross-checked against an
        # in-jit device-side loop — see BASELINE.md).
        n_it = 20
        rays = []
        for i in range(n_it + 1):
            cam = Camera.default()._replace(
                origin=jnp.asarray([1e-4 * i, 0.0, 28.0], jnp.float32))
            rays.append(generate_rays(cam, 1024, 512))
        b = rays[0][0].shape[0]
        tmax = jnp.full((b,), 1e6, jnp.float32)
        slot, t = traverse_packets(mesh, rays[n_it][0], rays[n_it][1], tmax,
                                   image_shape=(512, 1024))
        jax.block_until_ready((slot, t))
        t0 = time.perf_counter()
        outs = [traverse_packets(mesh, o, d, tmax, image_shape=(512, 1024))
                for o, d in rays[:n_it]]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n_it
        return {
            "mesh_traversal_mrays_per_s": round(b / dt / 1e6, 1),
            "mesh_tris": int(np.asarray(mesh.tri_count)),
            "mesh_hitrate": round(float((slot >= 0).mean()), 3),
        }
    except Exception as e:  # never let the secondary metric kill the bench
        return {"mesh_bench_error": f"{type(e).__name__}: {e}"}


if __name__ == "__main__":
    main()
