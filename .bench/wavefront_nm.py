"""Wavefront cost breakdown on config-3-like scenes (VERDICT round-3 #2).

Measures the XLA wavefront (render_pass) on the bench mesh scene at
1024x1024 x 2spp x 4 bounces, in three configs:
  plain  — diffuse texture + HDRI (megakernel-eligible, for the gap)
  nm     — + normal map + specular map (the scenes the megakernel excludes)
  nm_notex — normal+specular but no diffuse map
Prints wall ms/pass, Mrays/s, and the top device events (gather/fetch
attribution) for the `nm` config.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import tempfile

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

    sys.path.insert(0, os.path.dirname(__file__))
    from devtime import device_events, measure  # noqa: F401

    p = os.path.join(tempfile.mkdtemp(), "bench_sphere.obj")
    write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
    mesh = pack_mesh(load_obj(p))
    rng = np.random.default_rng(0)
    hdr = jnp.asarray(rng.uniform(0, 1.5, (64, 128, 3)).astype(np.float32))
    tex = jnp.asarray(rng.uniform(0.1, 1, (256, 256, 3)).astype(np.float32))
    nmap = jnp.asarray(
        (rng.uniform(0, 1, (256, 256, 3)) * 0.2 + (0.4, 0.4, 0.8))
        .astype(np.float32))
    smap = jnp.asarray(rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))

    base = RenderSettings(
        width=1024, height=1024, samples_per_pass=2, bounces=4,
        use_cornell_box=False)

    cams = [Camera.default()._replace(
        origin=jnp.asarray([1e-4 * i, 0.0, 40.0], jnp.float32))
        for i in range(25)]

    def bench(name, scene, verbose_events=False, captured=False):
        settings = settings_for_scene(scene, base)
        settings = settings.replace(radiance_kernel="xla",
                                    captured_attrs=captured)

        def run(cam, frame):
            ro, rd = generate_rays(cam, settings.width, settings.height)
            ids = pixel_ids(settings.width, settings.height)
            return render_pass(scene, settings, ro, rd, ids,
                               jnp.uint32(frame), jnp.float32(0.1),
                               jnp.float32(3.0))

        run = jax.jit(run, static_argnames=())
        jax.block_until_ready(run(cams[-1], 1))
        n_it = 10
        t0 = time.perf_counter()
        outs = [run(cams[i], 2 + i) for i in range(n_it)]
        jax.block_until_ready(outs)
        wall_ms = (time.perf_counter() - t0) / n_it * 1e3
        rays = settings.n_pixels * settings.samples_per_pass * settings.bounces

        # In-jit device loop (CLAUDE.md cross-check): 8 passes inside ONE
        # program, so per-call relay overhead is paid once.
        @jax.jit
        def loop(cam):
            def body(i, acc):
                rgb, _ = run.__wrapped__(cam, 2 + i)
                return acc + jnp.sum(rgb[:16])

            return jax.lax.fori_loop(0, 8, body, jnp.zeros(3))

        jax.block_until_ready(loop(cams[0]))
        t0 = time.perf_counter()
        jax.block_until_ready([loop(cams[1])])
        loop_ms = (time.perf_counter() - t0) / 8 * 1e3
        print(f"RESULT cfg={name} wall_ms={wall_ms:.2f} "
              f"mrays={rays / wall_ms / 1e3:.2f} "
              f"inloop_ms={loop_ms:.2f} mrays_inloop={rays / loop_ms / 1e3:.2f} "
              f"traversal={settings.traversal}")
        if verbose_events:
            import tempfile as tf

            from vrenderer_pathtracer_tpu.utils.profiling import profiler_trace
            d = tf.mkdtemp()
            with profiler_trace(d):
                outs = [run(cams[i], 12 + i) for i in range(4)]
                jax.block_until_ready(outs)
            agg = device_events(d)
            top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:18]
            for nme, (cnt, dur) in top:
                print(f"  {dur / 1e3 / 4:9.3f} ms x{cnt:4d}  {nme[:100]}")

    bench("plain", Scene(spheres=build_sphere_set(False), mesh=mesh,
                         hdr=hdr, diffuse_map=tex))
    bench("nm", Scene(spheres=build_sphere_set(False), mesh=mesh, hdr=hdr,
                      diffuse_map=tex, normal_map=nmap, specular_map=smap),
          verbose_events=True)
    bench("nm_notex", Scene(spheres=build_sphere_set(False), mesh=mesh,
                            hdr=hdr, normal_map=nmap, specular_map=smap))
    bench("plain_capt", Scene(spheres=build_sphere_set(False), mesh=mesh,
                              hdr=hdr, diffuse_map=tex), captured=True)
    bench("nm_capt", Scene(spheres=build_sphere_set(False), mesh=mesh,
                           hdr=hdr, diffuse_map=tex, normal_map=nmap,
                           specular_map=smap), captured=True)


main()
