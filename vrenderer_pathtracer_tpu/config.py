"""Static render configuration.

The reference splits configuration across three tiers (compile-time backend
defines, compile-time kernel constants like ``kSamps=2`` / 4 bounces /
``kInvGamma=1/2.2`` at ``cuda/src/PathTracer.cu:38-42,624``, and runtime
``__constant__`` flags set via ``cudaMemcpyToSymbol`` at
``cuda/src/PathTracer.cu:894-1001``).  Here the same split is expressed the
XLA way: everything in :class:`RenderSettings` is a *static* (hashable) jit
argument — changing it recompiles, exactly like the reference re-uploading
constant symbols forces divergent kernel paths — while continuously-varying
quantities (camera, fresnel sliders) travel as traced arrays.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Hashable static settings for a jitted render step.

    Mirrors the reference's constant symbols / kernel constants:

    * ``width/height``     — framebuffer size (reference: GL texture size)
    * ``samples_per_pass`` — ``kSamps`` (reference default 2)
    * ``bounces``          — fixed bounce budget (reference: literal 4)
    * ``use_cornell_box``  — ``kUseCornellBox``
    * ``use_example_sphere`` — ``kUseExampleSphere``
    * ``use_brdf``         — ``kViewBRDF`` (shade mesh/example sphere with the
                              measured BRDF instead of diffuse)
    * ``has_*_map`` / ``has_brdf`` / ``has_mesh`` — ``kHas*`` / ``kMeshInitialised``
    * ``gamma``            — display gamma (reference ``kInvGamma = 1/2.2``)
    * ``depth_scale``      — depth normalisation (reference: ``dist/150`` at
                              ``cuda/src/PathTracer.cu:660``)
    """

    width: int = 512
    height: int = 512
    samples_per_pass: int = 2
    bounces: int = 4
    use_cornell_box: bool = False
    use_example_sphere: bool = False
    use_brdf: bool = False
    has_diffuse_map: bool = False
    has_normal_map: bool = False
    has_specular_map: bool = False
    has_brdf: bool = False
    has_mesh: bool = False
    has_hdr: bool = True
    use_fxaa: bool = False
    # BVH traversal backend: "auto" resolves to "pallas" (packet kernel,
    # VMEM-resident scene) on TPU-resident meshes that fit, else "xla"
    # (lockstep while_loop).  Resolved in scene.settings_for_scene.
    traversal: str = "auto"
    # Rematerialize each bounce in the backward pass (jax.checkpoint):
    # trades recompute FLOPs for per-bounce activation memory — needed for
    # high-res/high-spp gradient renders (config 5).
    remat_bounces: bool = False
    # Sort rays by (direction octant, origin Morton) before packet traversal
    # to restore block coherence for bounce rays (accel/sorting.py).
    sort_rays: bool = False
    # Ray-block sublane rows (block = 128*rows rays) for BOUNCE-wave packet
    # traversal (bounce >= 1).  0 = kernel default (8 for the single-level
    # packet kernel, 16 for the paged kernel — the measured optima,
    # .bench/rows_sweep.py; bigger blocks LOSE even on shuffled waves: the
    # any-hit union grows with ray count rather than saturating).
    bounce_block_rows: int = 0
    # FORWARD-ONLY experiment (measured SLOWER, left opt-in for the
    # record): take the winning triangle's shading attributes (face/smooth
    # normal, uv, tangent) from the packet kernel's win-time capture
    # instead of the per-bounce wide-row gather + recompute.  The capture
    # hook runs per leaf VISIT (mostly non-winning lanes), which costs
    # more than the once-per-bounce gather it saves: config-3 wavefront
    # 188->240 ms, +normal/spec 198->338 ms (docs/PERF.md round 4).
    # Values agree up to fp association; gradients do NOT flow through
    # captured attrs.  Single-level Pallas traversal only.
    captured_attrs: bool = False
    # INTERNAL (set by render_pass, not by users): rays already arrive in
    # 32x32-pixel-tile order, so the Pallas traversal kernels skip their
    # per-call raster<->tile remap.  The wavefront used to pay the remap
    # reshape/transpose copies PER BOUNCE (2 arrays in + 2 out per
    # traversal at ~2.3ms per 4M-lane copy); hoisting the permutation to
    # once per pass is bitwise-identical (block composition is unchanged
    # and everything between traversals is per-lane elementwise).
    pre_tiled: bool = False
    # Forward radiance backend: "auto" resolves (scene/scene.py) to
    # "pallas" (analytic-Cornell megakernel, render/pallas_radiance.py) or
    # "pallas_mesh" (general-scene fused kernel with deferred asset
    # fetches, render/pallas_mesh.py) for TPU-resident scenes in scope,
    # else "xla" (differentiable wavefront).  Gradient paths always use
    # the XLA integrator.
    radiance_kernel: str = "auto"
    # Importance-sample measured BRDFs: one-sample MIS between a tabulated
    # half-angle lobe CDF and the cosine strategy (ops/brdf_sampling.py).
    # Same limit image as the reference's cosine estimator, lower variance
    # on glossy MERL tables.  XLA wavefront only (kernels keep cosine).
    brdf_importance_sampling: bool = False
    # Compact bounce waves (round 5): after the primary bounce, gather the
    # live lanes (bounce rays that actually hit something) into a dense
    # array of capacity compact_capacity_frac * B and run the remaining
    # bounces — shading AND traversal — at that width, scattering radiance /
    # env contributions back per bounce.  A lax.cond falls back to the
    # full-width tail when the live count exceeds capacity, so results are
    # always exact.  Measured motivation: at config-5 spec ~95-98% of
    # bounce-wave lanes are dead, yet the XLA fusions (72 ms/bounce) and
    # the paged traversal pay full width (docs/PERF.md round 5).
    # Resolved from the scene by settings_for_scene (mesh scenes on the
    # XLA wavefront); "auto" here means off until resolution.
    compact_waves: bool = False
    compact_capacity_frac: float = 0.125
    # "cond": runtime lax.cond picks compact vs full per pass (always
    # exact; costs ~60 ms/pass of branch-operand copies at config-5
    # scale).  "forced": the compact chain is hard-wired — set by the
    # Renderer once a pass has MEASURED that the camera's primary hit
    # count fits capacity (the hit set is constant across progressive
    # passes: same camera, fixed 0.25 sub-pixel jitter), reverted on any
    # camera/scene change.
    compact_mode: str = "cond"
    # Texture/env fetch mode: "nearest" is reference parity (integer texel
    # fetch); "bilinear" makes d(pixel)/d(texel) piecewise-linear and the
    # image smooth in uv/direction — use when optimizing textures/env maps.
    texture_filter: str = "nearest"
    gamma: float = 2.2
    depth_scale: float = 150.0
    # Number of rays traced per integrator call; the sample loop is chunked so
    # that one chunk is width*height*samples_per_chunk rays (memory control).
    samples_per_chunk: int = 0  # 0 => all samples in one chunk

    def replace(self, **kw) -> "RenderSettings":
        return dataclasses.replace(self, **kw)

    @property
    def n_pixels(self) -> int:
        return self.width * self.height
