"""Phase breakdown of the fused mesh megakernel (VERDICT round-3 #9).

Usage: python .bench/mesh_phase.py [base|single|dup_sphere|dup_rng|dup_scatter]

Each probe duplicates one phase of the bounce loop (render/pallas_mesh.py
VPT_MESH_EXP); the wall/device delta vs `base` is that phase's cost.
`single` runs the traversal with nodes_per_visit=1 (the pre-dual body).
Run ONE at a time (one TPU job rule); a shell loop over variants works.
"""
import os
import sys
import time

exp = sys.argv[1] if len(sys.argv) > 1 else "base"
if exp.startswith("dup_"):
    os.environ["VPT_MESH_EXP"] = exp

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import tempfile

    from tests.test_mesh_render import write_uv_sphere
    from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
    from vrenderer_pathtracer_tpu.config import RenderSettings
    from vrenderer_pathtracer_tpu.core.camera import Camera
    from vrenderer_pathtracer_tpu.native import load_obj
    from vrenderer_pathtracer_tpu.render.pallas_mesh import (
        render_pass_mesh_pallas, supports)
    from vrenderer_pathtracer_tpu.scene.scene import Scene
    from vrenderer_pathtracer_tpu.scene.spheres import build_sphere_set

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from devtime import measure

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
    assert supports(scene, settings)
    dual = exp != "single"

    def run(cam, frame):
        return render_pass_mesh_pallas(
            scene, settings, cam, jnp.uint32(frame), jnp.float32(0.1),
            jnp.float32(3.0), dual=dual)

    n_it = 10
    cams = [Camera.default()._replace(
        origin=jnp.asarray([1e-4 * i, 0.0, 40.0], jnp.float32))
        for i in range(n_it + 1)]
    jax.block_until_ready(run(cams[n_it], 1))
    t0 = time.perf_counter()
    outs = [run(cams[i], 2 + i) for i in range(n_it)]
    jax.block_until_ready(outs)
    wall_ms = (time.perf_counter() - t0) / n_it * 1e3

    dev_us = measure(lambda cam, f: run(cam, f),
                     [(cams[i], 2 + i) for i in range(6)],
                     "mesh_pallas", verbose=True)
    rays = settings.n_pixels * settings.samples_per_pass * settings.bounces
    print(f"RESULT exp={exp} wall_ms={wall_ms:.2f} dev_ms={dev_us/1e3:.2f} "
          f"mrays_wall={rays / wall_ms / 1e3:.1f}")


main()
