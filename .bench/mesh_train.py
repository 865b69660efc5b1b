"""Mesh-scene train-step cost vs the forward megakernel (VERDICT r3 #5).

Measures jax.value_and_grad of the wavefront L2 loss w.r.t. camera +
fresnel + albedo on the config-3 bench scene (1024^2, 2 spp, 4 bounces,
Pallas traversal detached) and compares against the fused forward pass.
Criterion: train step <= 3x the forward megakernel pass.
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
    from vrenderer_pathtracer_tpu.parallel.sharding import (
        TrainParams, _apply_params)
    from vrenderer_pathtracer_tpu.render.integrator import render_pass
    from vrenderer_pathtracer_tpu.render.pallas_mesh import (
        render_pass_mesh_pallas, supports)
    from vrenderer_pathtracer_tpu.scene.scene import Scene, settings_for_scene
    from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set

    p = os.path.join(tempfile.mkdtemp(), "bench_sphere.obj")
    write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
    mesh = pack_mesh(load_obj(p))
    rng = np.random.default_rng(0)
    hdr = jnp.asarray(rng.uniform(0, 1.5, (64, 128, 3)).astype(np.float32))
    tex = jnp.asarray(rng.uniform(0.1, 1, (256, 256, 3)).astype(np.float32))
    base = RenderSettings(
        width=1024, height=1024, samples_per_pass=2, bounces=4,
        use_cornell_box=False)
    scene = Scene(spheres=build_sphere_set(False), mesh=mesh, hdr=hdr,
                  diffuse_map=tex)
    settings = settings_for_scene(scene, base)
    assert supports(scene, settings)
    xs = settings.replace(radiance_kernel="xla")
    inv_n = 1.0 / (settings.n_pixels * 3)
    target = jnp.asarray(
        rng.uniform(0, 1, (settings.n_pixels, 3)).astype(np.float32))

    cams = [Camera.default()._replace(
        origin=jnp.asarray([1e-4 * i, 0.0, 40.0], jnp.float32))
        for i in range(25)]

    # Forward megakernel reference.
    def fwd(cam, frame):
        return render_pass_mesh_pallas(
            scene, settings, cam, jnp.uint32(frame), jnp.float32(0.1),
            jnp.float32(3.0))

    jax.block_until_ready(fwd(cams[-1], 1))
    t0 = time.perf_counter()
    outs = [fwd(cams[i], 2 + i) for i in range(10)]
    jax.block_until_ready(outs)
    fwd_ms = (time.perf_counter() - t0) / 10 * 1e3

    # Train step: value_and_grad through the wavefront (detached traversal).
    @jax.jit
    def train(params, cam, frame):
        def loss_fn(pr):
            c = pr.camera if pr.camera is not None else cam
            ro, rd = generate_rays(c, xs.width, xs.height)
            ids = pixel_ids(xs.width, xs.height)
            rgb, _ = render_pass(_apply_params(scene, pr), xs, ro, rd, ids,
                                 frame, pr.fresnel_coef, pr.fresnel_pow)
            return jnp.sum((rgb - target) ** 2) * inv_n

        return jax.value_and_grad(loss_fn)(params)

    p0 = TrainParams.from_scene(scene, camera=cams[-1])
    loss, g = train(p0, cams[-1], jnp.uint32(1))
    jax.block_until_ready((loss, g))
    t0 = time.perf_counter()
    outs = []
    for i in range(10):
        pi = TrainParams.from_scene(scene, camera=cams[i])
        outs.append(train(pi, cams[i], jnp.uint32(2 + i)))
    jax.block_until_ready(outs)
    train_ms = (time.perf_counter() - t0) / 10 * 1e3
    gnorm = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)))
    print(f"RESULT fwd_megakernel_ms={fwd_ms:.2f} train_ms={train_ms:.2f} "
          f"ratio={train_ms / fwd_ms:.2f} loss={float(loss):.5f} "
          f"gnorm={gnorm:.4g}")


main()
