"""Per-sample cost vs samples_per_pass on the config-5 workload.

More samples per wave = more lanes per paged-traversal launch: fewer
(block x page) DMA streams per sample and better amortization of the
page schedule.  Reference parity fixes 2 spp per FRAME; this measures
whether batching passes is worth a knob.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from examples.config5 import synth_assets
    from vrenderer_pathtracer_tpu import Renderer, RenderSettings

    tmp = tempfile.mkdtemp()
    obj, hdr, brdf = synth_assets(tmp)
    for spp in (2, 4, 8):
        r = Renderer(1920, 1080, settings=RenderSettings(
            samples_per_pass=spp, bounces=4, use_fxaa=True, use_brdf=True,
            remat_bounces=True))
        r.load_hdr(hdr)
        r.load_brdf(brdf)
        r.load_mesh(obj)
        r.render()  # compile + first pass
        t0 = time.perf_counter()
        for _ in range(3):
            img, _ = r.render()
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / 3
        print(f"RESULT spp_per_pass={spp} pass_s={dt:.3f} "
              f"s_per_2spp={dt * 2 / spp:.3f}")


main()
