"""Re-measure the headline fwd+bwd Cornell number in isolation (VERDICT r4 #3).

Round 3 recorded 3077 Mrays/s (group minmax 5.505-5.656 ms); round 4
recorded 2885 (5.737-5.961) — disjoint dispersion intervals.  This script
times ONLY cornell_loss_grads with the bench.py median-of-groups
methodology, several times over, to decide tunnel-variance vs real
regression before any bisect.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core.camera import Camera
from vrenderer_pathtracer_tpu.render.pallas_grad import cornell_loss_grads
from vrenderer_pathtracer_tpu.scene.scene import Scene

settings = RenderSettings(width=1024, height=1024, samples_per_pass=2,
                          bounces=4, use_cornell_box=True, has_hdr=False)
scene = Scene.analytic(settings)
cam = Camera.default()
tgt = jnp.zeros((settings.n_pixels, 3), jnp.float32)
fc, fp = jnp.float32(0.1), jnp.float32(3.0)

out = cornell_loss_grads(scene, settings, cam, tgt, jnp.uint32(1), fc, fp)
jax.block_until_ready(out)
rays = settings.n_pixels * settings.samples_per_pass * settings.bounces

for rep in range(3):
    n_groups, k = 5, 8
    group_s = []
    frame = 2
    for _ in range(n_groups):
        t0 = time.perf_counter()
        outs = []
        for _ in range(k):
            outs.append(cornell_loss_grads(
                scene, settings, cam, tgt, jnp.uint32(frame), fc, fp))
            frame += 1
        jax.block_until_ready(outs)
        group_s.append((time.perf_counter() - t0) / k)
    group_s.sort()
    med = group_s[len(group_s) // 2]
    print(f"rep {rep}: median {med*1e3:.3f} ms  "
          f"minmax [{group_s[0]*1e3:.3f}, {group_s[-1]*1e3:.3f}]  "
          f"{2*rays/med/1e6:.0f} Mrays/s", flush=True)
