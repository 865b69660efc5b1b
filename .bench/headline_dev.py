"""Device-time headline check: cornell_loss_grads under jax.profiler."""
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core.camera import Camera
from vrenderer_pathtracer_tpu.render.pallas_grad import cornell_loss_grads
from vrenderer_pathtracer_tpu.scene.scene import Scene
sys.path.insert(0, "/root/repo/.bench")
from devtime import measure

settings = RenderSettings(width=1024, height=1024, samples_per_pass=2,
                          bounces=4, use_cornell_box=True, has_hdr=False)
scene = Scene.analytic(settings)
cam = Camera.default()
tgt = jnp.zeros((settings.n_pixels, 3), jnp.float32)
fc, fp = jnp.float32(0.1), jnp.float32(3.0)

inputs = [(scene, settings, cam, tgt, jnp.uint32(i + 1), fc, fp)
          for i in range(13)]
us = measure(lambda *a: cornell_loss_grads(*a), inputs, "", verbose=True)
rays = settings.n_pixels * settings.samples_per_pass * settings.bounces
print(f"total device us/call: {us:.1f}")
