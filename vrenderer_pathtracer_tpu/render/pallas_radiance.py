"""Pallas radiance megakernel for analytic (Cornell) scenes.

The XLA wavefront integrator streams ~120MB of per-lane carry state through
HBM between every bounce; at 2M lanes that HBM traffic — not compute — is
the forward-pass floor (~25ms measured).  This kernel runs the ENTIRE
radiance estimate for a block of pixels in VMEM/registers: ray generation,
the unrolled running-min sphere intersection, Fresnel/diffuse/mirror
scattering, the counter-based threefry RNG, the sample loop and the
accumulation all live inside one Pallas program — per-pixel state never
touches HBM until the final accumulation write.

Ironically this is the reference's *megakernel* shape
(``cuda/src/PathTracer.cu:791-868``) reborn: wavefront-over-HBM is the right
TPU design when per-bounce state exceeds on-chip memory (meshes, textures,
env maps — those paths keep the XLA integrator), but for the analytic
Cornell workload the whole working set fits VMEM and fusing the bounce loop
is strictly better.  Scope: Cornell/sphere-list scenes, no env map, no
textures, no mesh (gathers don't vectorize in Mosaic) — exactly BASELINE
configs 1-2 and the headline benchmark.

RNG parity: the kernel implements the identical threefry-2x32 stream spec
as core/rng.py (keyed by pixel, salted by (frame, sample, bounce, slot)), so
images match the XLA integrator up to cross-compilation fp-association on
discrete-branch pixels (the usual <1% outlier contract).  Forward-only: the
progressive renderer uses it for passes; gradient paths keep the
differentiable XLA integrator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core import rng as rng_mod
from vrenderer_pathtracer_tpu.ops.intersect import INF, SPHERE_EPS
from vrenderer_pathtracer_tpu.ops.shading import ORIGIN_OFFSET
from vrenderer_pathtracer_tpu.scene.scene import Scene
from vrenderer_pathtracer_tpu.scene.spheres import SPEC

ROWS = 8
COLS = 128
BLOCK = ROWS * COLS

_ROTATIONS = rng_mod._ROTATIONS
_PARITY = rng_mod._PARITY


def _threefry2x32_tile(k0, k1, x0, x1):
    """Threefry-2x32 on (ROWS, COLS) uint32 tiles — bit-identical to
    core/rng.py (same 20-round schedule)."""
    ks0, ks1 = k0, k1
    ks2 = jnp.uint32(_PARITY) ^ k0 ^ k1
    x0 = x0 + ks0
    x1 = x1 + ks1

    def four(x0, x1, rots):
        for r in rots:
            x0 = x0 + x1
            x1 = (x1 << jnp.uint32(r)) | (x1 >> jnp.uint32(32 - r))
            x1 = x0 ^ x1
        return x0, x1

    x0, x1 = four(x0, x1, _ROTATIONS[0])
    x0, x1 = x0 + ks1, x1 + ks2 + jnp.uint32(1)
    x0, x1 = four(x0, x1, _ROTATIONS[1])
    x0, x1 = x0 + ks2, x1 + ks0 + jnp.uint32(2)
    x0, x1 = four(x0, x1, _ROTATIONS[0])
    x0, x1 = x0 + ks0, x1 + ks1 + jnp.uint32(3)
    x0, x1 = four(x0, x1, _ROTATIONS[1])
    x0, x1 = x0 + ks1, x1 + ks2 + jnp.uint32(4)
    x0, x1 = four(x0, x1, _ROTATIONS[0])
    x0, x1 = x0 + ks2, x1 + ks0 + jnp.uint32(5)
    return x0, x1


def _to_unit(bits):
    # Mosaic lacks a direct uint32->f32 cast; the top-24-bit value fits in
    # int32, so bitcast (free) then int32->f32 (supported) is exact.
    top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(2.0 ** -24)


def sphere_running_min(spheres, n_spheres, o, d, zero):
    """Unrolled running-min intersection of all analytic spheres on one
    (8,128) ray tile — shared verbatim by the Cornell megakernel and the
    mesh megakernel (render/pallas_mesh.py) so the shading math stays in
    provable lockstep (CLAUDE.md).  ``spheres`` rows: pos3, radius, color3,
    emission3, spec_color[0], refl.  Returns
    ``(best_t, n, col, em, spec0, refl_f)`` with 3-tuples for n/col/em.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    best_t = jnp.full(zero.shape, INF, jnp.float32)
    n_x = zero
    n_y = zero
    n_z = zero
    col_r = zero
    col_g = zero
    col_b = zero
    em_r = zero
    em_g = zero
    em_b = zero
    spec0 = zero
    refl_f = jnp.ones(zero.shape, jnp.float32)  # DIFF=1 default
    for i in range(n_spheres):
        sp_x, sp_y, sp_z = spheres[i, 0], spheres[i, 1], spheres[i, 2]
        rad = spheres[i, 3]
        opx = sp_x - ox
        opy = sp_y - oy
        opz = sp_z - oz
        bq = opx * dx + opy * dy + opz * dz
        det = bq * bq - (opx * opx + opy * opy + opz * opz) + rad * rad
        ok = det >= 0.0
        sq = jnp.sqrt(jnp.where(ok, det, 0.0))
        tn = bq - sq
        tf = bq + sq
        t = jnp.where(tn > SPHERE_EPS, tn,
                      jnp.where(tf > SPHERE_EPS, tf, 0.0))
        hit_i = ok & (t > 0.0) & (t < best_t)
        best_t = jnp.where(hit_i, t, best_t)
        hx = ox + dx * t - sp_x
        hy = oy + dy * t - sp_y
        hz = oz + dz * t - sp_z
        inl = lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-40))
        n_x = jnp.where(hit_i, hx * inl, n_x)
        n_y = jnp.where(hit_i, hy * inl, n_y)
        n_z = jnp.where(hit_i, hz * inl, n_z)
        col_r = jnp.where(hit_i, spheres[i, 4], col_r)
        col_g = jnp.where(hit_i, spheres[i, 5], col_g)
        col_b = jnp.where(hit_i, spheres[i, 6], col_b)
        em_r = jnp.where(hit_i, spheres[i, 7], em_r)
        em_g = jnp.where(hit_i, spheres[i, 8], em_g)
        em_b = jnp.where(hit_i, spheres[i, 9], em_b)
        spec0 = jnp.where(hit_i, spheres[i, 10], spec0)
        refl_f = jnp.where(hit_i, spheres[i, 11], refl_f)
    return (best_t, (n_x, n_y, n_z), (col_r, col_g, col_b),
            (em_r, em_g, em_b), spec0, refl_f)


def fresnel_diffuse_scatter(o, d, n, best_t, spec0, col,
                            fresnel_coef, fresnel_pow,
                            u_reflect, u_phi, u_r):
    """Fresnel-reflect / cosine-hemisphere scatter on one ray tile
    (ops/shading.py semantics) — the common core of both megakernels.

    Returns ``(h, rf, rlen, take_reflect, cd, nd, mult)``: hit point,
    unnormalized mirror reflection + its inverse length, the Fresnel
    branch mask, the cosine-sampled direction, and the branch-selected
    new direction / throughput multiplier (callers apply their own
    BRDF/SPEC overrides ON TOP, preserving the override order)."""
    ox, oy, oz = o
    dx, dy, dz = d
    n_x, n_y, n_z = n
    col_r, col_g, col_b = col

    hx = ox + dx * best_t
    hy = oy + dy * best_t
    hz = oz + dz * best_t

    ddn = dx * n_x + dy * n_y + dz * n_z
    rfx = dx - 2.0 * ddn * n_x
    rfy = dy - 2.0 * ddn * n_y
    rfz = dz - 2.0 * ddn * n_z
    rlen = lax.rsqrt(jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz, 1e-40))

    aoi = -(ddn)
    grazing = jnp.power(jnp.maximum(1.0 - aoi, 0.0), fresnel_pow)
    fresnel = (grazing * (1.0 - fresnel_coef) + fresnel_coef) * spec0
    take_reflect = u_reflect < fresnel

    # cosine hemisphere about n (reference frame construction)
    flip = jnp.abs(n_x) > 0.1
    ax = jnp.where(flip, 0.0, 1.0)
    ay = jnp.where(flip, 1.0, 0.0)
    # u = normalize(cross(axis, n))
    ux_ = ay * n_z
    uy_ = -ax * n_z
    uz_ = ax * n_y - ay * n_x
    ul = lax.rsqrt(jnp.maximum(ux_ * ux_ + uy_ * uy_ + uz_ * uz_, 1e-40))
    ux_, uy_, uz_ = ux_ * ul, uy_ * ul, uz_ * ul
    vx_ = n_y * uz_ - n_z * uy_
    vy_ = n_z * ux_ - n_x * uz_
    vz_ = n_x * uy_ - n_y * ux_
    phi = 2.0 * jnp.pi * u_phi
    rr = jnp.sqrt(u_r)
    cp = jnp.cos(phi) * rr
    spn = jnp.sin(phi) * rr
    wz = jnp.sqrt(jnp.maximum(1.0 - u_r, 0.0))
    cdx = ux_ * cp + vx_ * spn + n_x * wz
    cdy = uy_ * cp + vy_ * spn + n_y * wz
    cdz = uz_ * cp + vz_ * spn + n_z * wz
    cl = lax.rsqrt(jnp.maximum(cdx * cdx + cdy * cdy + cdz * cdz, 1e-40))
    cdx, cdy, cdz = cdx * cl, cdy * cl, cdz * cl

    cosw = (cdx * n_x + cdy * n_y + cdz * n_z) * 2.0
    ndx = jnp.where(take_reflect, rfx * rlen, cdx)
    ndy = jnp.where(take_reflect, rfy * rlen, cdy)
    ndz = jnp.where(take_reflect, rfz * rlen, cdz)
    mult_r = jnp.where(take_reflect, spec0, col_r * cosw)
    mult_g = jnp.where(take_reflect, spec0, col_g * cosw)
    mult_b = jnp.where(take_reflect, spec0, col_b * cosw)
    return ((hx, hy, hz), (rfx, rfy, rfz), rlen, take_reflect,
            (cdx, cdy, cdz), (ndx, ndy, ndz), (mult_r, mult_g, mult_b))


def _kernel(cam, spheres, streams, accum_r, accum_g, accum_b, depth_out,
            *, settings: RenderSettings, n_spheres: int, seed: int):
    """One (8,128) pixel tile through the full estimator.

    ``cam[0,14]`` carries a pixel-id base offset so a shard_map shard can
    render its own tile of the global image (pixel identity drives both the
    primary ray and the RNG counter, so offsets keep shards bit-consistent
    with the single-device image).
    """
    w = settings.width
    spp = settings.samples_per_pass
    bounces = settings.bounces

    pid = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0) * COLS + \
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1)
    base = cam[0, 14].astype(jnp.int32)
    pixel = base + pid * BLOCK + lane
    pixel_u = pixel.astype(jnp.uint32)
    px = (pixel % w).astype(jnp.float32)
    py = (pixel // w).astype(jnp.float32)

    # Primary ray (reference quarter-pixel offset; cam holds basis+fov).
    def c(i):
        return cam[0, i]

    u = (0.25 + px) / settings.width - 0.5
    v = (0.25 + py) / settings.height - 0.5
    d0x = c(3) + u * c(6) + v * c(9)
    d0y = c(4) + u * c(7) + v * c(10)
    d0z = c(5) + u * c(8) + v * c(11)
    inv_len = lax.rsqrt(d0x * d0x + d0y * d0y + d0z * d0z)
    d0x, d0y, d0z = d0x * inv_len, d0y * inv_len, d0z * inv_len

    k0 = jnp.uint32(seed & 0xFFFFFFFF)
    k1 = jnp.uint32((seed >> 32) & 0xFFFFFFFF)
    fresnel_coef = c(12)
    fresnel_pow = c(13)

    zero = jnp.zeros((ROWS, COLS), jnp.float32)
    acc_r = zero
    acc_g = zero
    acc_b = zero
    depth = jnp.ones((ROWS, COLS), jnp.float32)

    for s in range(spp):
        ox = jnp.full((ROWS, COLS), c(0))
        oy = jnp.full((ROWS, COLS), c(1))
        oz = jnp.full((ROWS, COLS), c(2))
        dx, dy, dz = d0x, d0y, d0z
        mr = jnp.ones((ROWS, COLS), jnp.float32)
        mg = jnp.ones((ROWS, COLS), jnp.float32)
        mb = jnp.ones((ROWS, COLS), jnp.float32)
        alive = jnp.ones((ROWS, COLS), bool)
        killed = jnp.zeros((ROWS, COLS), bool)
        sr = zero
        sg = zero
        sb = zero

        for b in range(bounces):
            # --- running-min sphere intersection (unrolled, scalar data) --
            best_t, (n_x, n_y, n_z), (col_r, col_g, col_b), \
                (em_r, em_g, em_b), spec0, refl_f = sphere_running_min(
                    spheres, n_spheres, (ox, oy, oz), (dx, dy, dz), zero)

            is_spec = refl_f == float(SPEC)
            hit = best_t < INF
            live = alive & hit
            miss = alive & ~hit
            killed = killed | miss  # cornell mode: miss kills the path

            if b == 0:
                depth = jnp.where(live, best_t / settings.depth_scale, depth)

            sr = sr + jnp.where(live, mr * em_r, 0.0)
            sg = sg + jnp.where(live, mg * em_g, 0.0)
            sb = sb + jnp.where(live, mb * em_b, 0.0)

            # --- RNG draws (identical stream spec to core/rng.py): entries
            # are (counter_salt, key_salt) pairs, key salt carries the
            # sample id (see rng.make_stream). ------------------------------
            base_i = (s * bounces + b) * 4
            st0 = streams[0, base_i]
            sk0 = streams[0, base_i + 1]
            st1 = streams[0, base_i + 2]
            sk1 = streams[0, base_i + 3]
            r0, _ = _threefry2x32_tile(
                k0 ^ sk0, k1, pixel_u, jnp.full((ROWS, COLS), st0, jnp.uint32))
            r2, r3 = _threefry2x32_tile(
                k0 ^ sk1, k1, pixel_u, jnp.full((ROWS, COLS), st1, jnp.uint32))
            u_reflect = _to_unit(r0)
            u_phi = _to_unit(r2)
            u_r = _to_unit(r3)

            # --- scatter (mirror / Fresnel-diffuse; ops/shading.py) -------
            # DIFF branch select: spec_color is (1,1,1) on the two small
            # spheres, (0,0,0) on cornell shells -> scalar spec0 broadcast.
            (hx, hy, hz), (rfx, rfy, rfz), rlen, take_reflect, _, \
                (ndx, ndy, ndz), (mult_r, mult_g, mult_b) = \
                fresnel_diffuse_scatter(
                    (ox, oy, oz), (dx, dy, dz), (n_x, n_y, n_z), best_t,
                    spec0, (col_r, col_g, col_b), fresnel_coef, fresnel_pow,
                    u_reflect, u_phi, u_r)

            # SPEC (mirror) overrides: unnormalized reflect, mask unchanged
            ndx = jnp.where(is_spec, rfx, ndx)
            ndy = jnp.where(is_spec, rfy, ndy)
            ndz = jnp.where(is_spec, rfz, ndz)
            mult_r = jnp.where(is_spec, 1.0, mult_r)
            mult_g = jnp.where(is_spec, 1.0, mult_g)
            mult_b = jnp.where(is_spec, 1.0, mult_b)

            ox = jnp.where(live, hx + ORIGIN_OFFSET * n_x, ox)
            oy = jnp.where(live, hy + ORIGIN_OFFSET * n_y, oy)
            oz = jnp.where(live, hz + ORIGIN_OFFSET * n_z, oz)
            dx = jnp.where(live, ndx, dx)
            dy = jnp.where(live, ndy, dy)
            dz = jnp.where(live, ndz, dz)
            mr = jnp.where(live, mr * mult_r, mr)
            mg = jnp.where(live, mg * mult_g, mg)
            mb = jnp.where(live, mb * mult_b, mb)
            alive = live

        # Cornell kill: a path that escaped contributes nothing.
        sr = jnp.where(killed, 0.0, sr)
        sg = jnp.where(killed, 0.0, sg)
        sb = jnp.where(killed, 0.0, sb)
        depth = jnp.where(killed, 0.0, depth)
        acc_r = acc_r + sr
        acc_g = acc_g + sg
        acc_b = acc_b + sb

    inv_spp = 1.0 / spp
    accum_r[:] = acc_r * inv_spp
    accum_g[:] = acc_g * inv_spp
    accum_b[:] = acc_b * inv_spp
    depth_out[:] = depth


def supports(scene: Scene, settings: RenderSettings) -> bool:
    """Megakernel scope: Cornell/sphere scenes with no gathered assets."""
    return (
        settings.use_cornell_box
        and not settings.use_example_sphere
        and not settings.has_mesh
        and not settings.has_hdr
        and not settings.has_brdf
        and not (settings.has_diffuse_map or settings.has_normal_map
                 or settings.has_specular_map)
    )


@functools.partial(jax.jit,
                   static_argnames=("settings", "seed", "interpret",
                                    "n_local_pixels"))
def render_pass_pallas(scene: Scene, settings: RenderSettings, camera,
                       frame, fresnel_coef, fresnel_pow, seed: int = 0,
                       interpret: bool = False, pixel_offset=None,
                       sample_offset=None, n_local_pixels: int | None = None):
    """Drop-in analog of integrator.render_pass for supported scenes.

    Returns ``(rgb_mean [N,3], depth [N])``.  Under shard_map, pass
    ``pixel_offset`` (this shard's first global pixel id),
    ``sample_offset`` (this shard's first sample id) and
    ``n_local_pixels`` — results then tile together exactly like the
    single-device render (RNG streams are global-identity keyed).
    """
    s = scene.spheres
    n_spheres = s.count
    sph = jnp.concatenate([
        s.pos, s.radius[:, None], s.color, s.emission,
        s.spec_color[:, 0:1], s.refl[:, None].astype(jnp.float32),
    ], axis=1)  # [N, 12]

    origin, view_dir, up, right, fov_scale = camera.basis()
    aspect = settings.width / settings.height
    cx = (fov_scale * aspect) * right
    cy = fov_scale * up
    p_off = (jnp.asarray(pixel_offset, jnp.float32)
             if pixel_offset is not None else jnp.float32(0.0))
    cam = jnp.concatenate([
        origin, view_dir, cx, cy,
        jnp.stack([fresnel_coef, fresnel_pow, p_off]),
        jnp.zeros((1,), jnp.float32),
    ])[None, :]  # [1, 16]

    # Stream salts for every (sample, bounce, slot) draw this frame:
    # interleaved (counter_salt, key_salt) pairs from rng.make_stream.
    spp, bounces = settings.samples_per_pass, settings.bounces
    s_off = (jnp.asarray(sample_offset, jnp.uint32)
             if sample_offset is not None else jnp.uint32(0))
    streams = jnp.stack([
        word
        for si in range(spp) for bi in range(bounces) for slot in (0, 1)
        for word in rng_mod.make_stream(frame, jnp.uint32(si) + s_off, bi, slot)
    ])[None, :]  # [1, spp*bounces*4] uint32

    n = n_local_pixels if n_local_pixels is not None else settings.n_pixels
    # Pixel counts that are not a BLOCK multiple are padded up: the tail
    # lanes compute pixel ids past the region (finite garbage — ray gen,
    # RNG and the bounce loop are all per-lane total functions) and are
    # sliced away below.  This erases the n%1024 kernel cliff: a 1000x700
    # render is bitwise-equal to cropping a taller aligned render, because
    # pixel identity (ray + RNG stream) depends only on the pixel id.
    nb = -(-n // BLOCK)
    tile = pl.BlockSpec((ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    r, g, b, depth = pl.pallas_call(
        functools.partial(_kernel, settings=settings, n_spheres=n_spheres,
                          seed=seed),
        grid=(nb,),
        in_specs=[small, small, small],
        out_specs=(tile, tile, tile, tile),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb * ROWS, COLS), jnp.float32)
            for _ in range(4)
        ),
        interpret=interpret,
    )(cam, sph, streams)
    rgb = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    return rgb[:n], depth.reshape(-1)[:n]
