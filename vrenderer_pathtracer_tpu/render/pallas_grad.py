"""Backward radiance megakernel: train-step loss + gradients in one kernel.

BASELINE's north star asks for "forward and backward Pallas kernels at
speed-of-light per chip".  The XLA train step (parallel/sharding.py) costs
~31ms at 2M lanes because jax.grad's backward streams every bounce's saved
activations through HBM.  This kernel computes the SAME loss and gradients
— L2 image loss, gradients w.r.t. sphere albedo/emission and the Fresnel
sliders — with the forward replay AND the hand-derived reverse sweep both
living in VMEM, emitting only per-block scalar partials.

Gradient semantics exactly match the differentiable XLA integrator:

* detached sampling — hit selection, Fresnel branch and RNG draws are
  constants of the backward pass;
* ratio-trick Fresnel gradients (ops/shading.py): the taken branch's
  throughput carries ``d/dp`` of ``p/sg(p)`` (or ``(1-p)/sg(1-p)``), i.e.
  the score-function estimator, with ``p`` clipped to (1e-6, 1-1e-6);
* Cornell kill: a path that ever escapes contributes nothing (its
  cotangents are zeroed).

Derivation (per sample, per channel): with ``m_b`` the throughput entering
bounce ``b`` and ``mult_b`` the scatter multiplier,

    acc      = sum_b [live_b] m_b * em_b
    r_b      = dL/dm_b = [live_b](g*em_b + mult_b * r_{b+1}) + [!live_b] r_{b+1}
    cm_b     = dL/dmult_b = [live_b] m_b * r_{b+1}
    dem_i   += [hit_b = i, live_b] g * m_b
    dcol_i  += [hit_b = i, live_b, diffuse] cos2_b * cm_b
    dp_b     = sum_ch cm_b * (reflect ? spec0/p : -col*cos2/(1-p))   (DIFF only)
    dfc     += dp_b * (1 - grazing) * spec0        [p unclipped]
    dfp     += dp_b * (1 - fc) * spec0 * grazing * log(1 - aoi)

The unrolled (spp x bounces) loops keep every saved tile in VMEM; outputs
are one SMEM row of partials per block, summed on the host side.
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
from vrenderer_pathtracer_tpu.render.pallas_radiance import (
    ROWS, COLS, BLOCK, _threefry2x32_tile, _to_unit,
)
from vrenderer_pathtracer_tpu.scene.scene import Scene
from vrenderer_pathtracer_tpu.scene.spheres import SPEC

# Output row layout: [0] loss partial, [1 + i*6 + c] = dcol_i[c] (c<3) /
# dem_i[c-3] (c>=3), [1 + n*6] = dfresnel_coef, [2 + n*6] = dfresnel_pow,
# and with with_camera: [3 + n*6 .. 14 + n*6] = d(origin), d(view_dir),
# d(cx), d(cy) — 12 camera-vector cotangents pulled back to
# origin/yaw/pitch/fov on the host through Camera.basis (jax.vjp).
OUT_WIDTH = 128


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _axpy3(alpha, x, y):
    """y + alpha * x on tile-vector triples (alpha a tile or scalar)."""
    return tuple(y[k] + alpha * x[k] for k in range(3))


def _camera_bounce_adjoint(d_, spheres, n_spheres, live, cm, dp,
                           fresnel_coef, fresnel_pow, do_next, dd_next, zero):
    """Reverse one bounce's geometry: cotangents of the ray ENTERING it.

    Hand-derived vjp of the bounce geometry chain — sphere-intersection t,
    hit point, normal, reflect / cosine-hemisphere scatter, and the Fresnel
    probability via the angle of incidence — under the SAME detached-event
    convention as the XLA integrator (ops/shading.py): hit selection, the
    branch choice and the RNG draws are constants of the backward pass,
    while every continuous quantity carries gradients (including the
    score-function ``dp`` path through ``aoi``).  ``(do_next, dd_next)``
    are dL/d(o', d') of the ray LEAVING the bounce; returns dL/d(o, d) of
    the ray entering it.  All contributions are live-masked through the
    cotangent inputs, so dead lanes contribute exactly zero.
    """
    o = d_["o"]
    dv = d_["d"]
    n = d_["n"]
    t = d_["t"]
    dead = 1.0 - live

    # Winner-sphere scalars, re-selected from the saved (detached) index.
    cw = [zero, zero, zero]
    rad = zero
    for i in range(n_spheres):
        seli = jnp.where(d_["idx"] == float(i), 1.0, 0.0)
        for k in range(3):
            cw[k] = cw[k] + seli * spheres[i, k]
        rad = rad + seli * spheres[i, 3]

    # o' = where(live, h + OFFSET*n, o);  d' = where(live, nd, d).
    do_b = tuple(dead * c for c in do_next)
    dd_b = tuple(dead * c for c in dd_next)
    dh = tuple(live * c for c in do_next)
    dn = tuple(ORIGIN_OFFSET * live * c for c in do_next)
    dnd = tuple(live * c for c in dd_next)

    mtr = jnp.where(d_["take_reflect"], 1.0, 0.0)
    mspec = jnp.where(d_["is_spec"], 1.0, 0.0)
    mrefl = mtr * (1.0 - mspec)
    mdiff = (1.0 - mtr) * (1.0 - mspec)

    # Recompute the reflect vector and cosine frame from the saved state
    # (bit-identical ops to the forward replay above).
    ddn = _dot3(dv, n)
    rf = tuple(dv[k] - 2.0 * ddn * n[k] for k in range(3))
    rlen = lax.rsqrt(jnp.maximum(_dot3(rf, rf), 1e-40))
    frd = tuple(rf[k] * rlen for k in range(3))

    flip = jnp.abs(n[0]) > 0.1
    ax = jnp.where(flip, 0.0, 1.0)
    ay = jnp.where(flip, 1.0, 0.0)
    un = (ay * n[2], -ax * n[2], ax * n[1] - ay * n[0])  # cross(axis, n)
    ul = lax.rsqrt(jnp.maximum(_dot3(un, un), 1e-40))
    u_ = tuple(un[k] * ul for k in range(3))
    v_ = (n[1] * u_[2] - n[2] * u_[1],
          n[2] * u_[0] - n[0] * u_[2],
          n[0] * u_[1] - n[1] * u_[0])                   # cross(n, u_)
    cp, spn, wz = d_["cp"], d_["spn"], d_["wz"]
    cdr = tuple(u_[k] * cp + v_[k] * spn + n[k] * wz for k in range(3))
    cl = lax.rsqrt(jnp.maximum(_dot3(cdr, cdr), 1e-40))
    cd = tuple(cdr[k] * cl for k in range(3))

    # --- new-direction branches: nd = spec? rf : reflect? rf*rlen : cd ----
    drf = tuple(mspec * c for c in dnd)
    pr = _dot3(frd, dnd)
    drf = tuple(drf[k] + mrefl * rlen * (dnd[k] - frd[k] * pr)
                for k in range(3))
    dcd = tuple(mdiff * c for c in dnd)

    # cos2 = 2*dot(cd, n) scales the diffuse multiplier col*cos2.
    dcos2 = (cm[0] * d_["col"][0] + cm[1] * d_["col"][1]
             + cm[2] * d_["col"][2]) * mdiff
    dcd = tuple(dcd[k] + 2.0 * dcos2 * n[k] for k in range(3))
    dn = tuple(dn[k] + 2.0 * dcos2 * cd[k] for k in range(3))

    # reverse cd = cdr * cl (normalize), then the frame construction.
    pr2 = _dot3(cd, dcd)
    dcdr = tuple(cl * (dcd[k] - cd[k] * pr2) for k in range(3))
    du = tuple(cp * c for c in dcdr)
    dvv = tuple(spn * c for c in dcdr)
    dn = tuple(dn[k] + wz * dcdr[k] for k in range(3))
    # v_ = cross(n, u_):  dn += u_ x dv_ ;  du_ += dv_ x n
    dn = (dn[0] + u_[1] * dvv[2] - u_[2] * dvv[1],
          dn[1] + u_[2] * dvv[0] - u_[0] * dvv[2],
          dn[2] + u_[0] * dvv[1] - u_[1] * dvv[0])
    du = (du[0] + dvv[1] * n[2] - dvv[2] * n[1],
          du[1] + dvv[2] * n[0] - dvv[0] * n[2],
          du[2] + dvv[0] * n[1] - dvv[1] * n[0])
    # u_ = un * ul (normalize), un = cross(axis, n): dn += dun x axis.
    pr3 = _dot3(u_, du)
    dun = tuple(ul * (du[k] - u_[k] * pr3) for k in range(3))
    dn = (dn[0] - dun[2] * ay,
          dn[1] + dun[2] * ax,
          dn[2] + dun[0] * ay - dun[1] * ax)

    # reverse rf = d - 2*(d.n)*n.
    nd_drf = _dot3(n, drf)
    dd_b = tuple(dd_b[k] + drf[k] - 2.0 * n[k] * nd_drf for k in range(3))
    dn = tuple(dn[k] - 2.0 * (nd_drf * dv[k] + ddn * drf[k])
               for k in range(3))

    # Fresnel probability via aoi = -(d.n): score-function dp chains into
    # geometry with d(fresnel)/d(aoi) = -(1-fc)*spec0*fp*(1-aoi)^(fp-1).
    one_m_aoi = d_["one_m_aoi"]
    dgraz = jnp.where(
        one_m_aoi > 0.0,
        -fresnel_pow * d_["grazing"] / jnp.maximum(one_m_aoi, 1e-30), 0.0)
    daoi = dp * (1.0 - fresnel_coef) * d_["spec0"] * dgraz
    dd_b = tuple(dd_b[k] - n[k] * daoi for k in range(3))
    dn = tuple(dn[k] - dv[k] * daoi for k in range(3))

    # reverse n = hv * inl, hv = o + d*t - c_winner (normalize).
    hv = tuple(o[k] + dv[k] * t - cw[k] for k in range(3))
    inl = lax.rsqrt(jnp.maximum(_dot3(hv, hv), 1e-40))
    nh = tuple(hv[k] * inl for k in range(3))
    pr4 = _dot3(nh, dn)
    dhv = tuple(inl * (dn[k] - nh[k] * pr4) for k in range(3))
    do_b = _axpy3(1.0, dhv, do_b)
    dd_b = tuple(dd_b[k] + t * dhv[k] for k in range(3))
    dt = _dot3(dv, dhv)
    # reverse h = o + d*t (from the origin-offset chain).
    do_b = _axpy3(1.0, dh, do_b)
    dd_b = tuple(dd_b[k] + t * dh[k] for k in range(3))
    dt = dt + _dot3(dv, dh)

    # reverse t through the sphere quadratic: t = bq + sigma*sq,
    # bq = op.d, det = bq^2 - |op|^2 + r^2, op = c - o.
    op = tuple(cw[k] - o[k] for k in range(3))
    bq = _dot3(op, dv)
    det = bq * bq - _dot3(op, op) + rad * rad
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    sigma = jnp.where(bq - sq > SPHERE_EPS, -1.0, 1.0)
    sqc = jnp.maximum(sq, 1e-6)
    dbq = dt * (1.0 + sigma * bq / sqc)
    kk = sigma * dt / sqc
    dd_b = tuple(dd_b[k] + dbq * op[k] for k in range(3))
    dop = tuple(dbq * dv[k] - kk * op[k] for k in range(3))
    do_b = tuple(do_b[k] - dop[k] for k in range(3))
    return do_b, dd_b


def _grad_kernel(cam, spheres, streams, tgt_r, tgt_g, tgt_b, out,
                 *, settings: RenderSettings, n_spheres: int, seed: int,
                 with_camera: bool = False):
    w = settings.width
    spp = settings.samples_per_pass
    bounces = settings.bounces
    inv_n = 1.0 / (settings.n_pixels * 3)

    pid = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0) * COLS + \
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1)
    pixel = pid * BLOCK + lane
    pixel_u = pixel.astype(jnp.uint32)
    px = (pixel % w).astype(jnp.float32)
    py = (pixel // w).astype(jnp.float32)

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

    # ---- forward replay, saving per-(sample,bounce) tiles -----------------
    samples = []  # per sample: dict of saved lists
    acc = [zero, zero, zero]
    for s in range(spp):
        ox = jnp.full((ROWS, COLS), c(0))
        oy = jnp.full((ROWS, COLS), c(1))
        oz = jnp.full((ROWS, COLS), c(2))
        dx, dy, dz = d0x, d0y, d0z
        m = [jnp.ones((ROWS, COLS), jnp.float32) for _ in range(3)]
        alive = jnp.ones((ROWS, COLS), jnp.float32)
        killed = zero
        sacc = [zero, zero, zero]
        saved = []

        for b in range(bounces):
            best_t = jnp.full((ROWS, COLS), INF, jnp.float32)
            n_x = zero
            n_y = zero
            n_z = zero
            col = [zero, zero, zero]
            em = [zero, zero, zero]
            spec0 = zero
            refl_f = jnp.ones((ROWS, COLS), jnp.float32)
            idx_f = jnp.full((ROWS, COLS), -1.0, jnp.float32)
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
                for ch in range(3):
                    col[ch] = jnp.where(hit_i, spheres[i, 4 + ch], col[ch])
                    em[ch] = jnp.where(hit_i, spheres[i, 7 + ch], em[ch])
                spec0 = jnp.where(hit_i, spheres[i, 10], spec0)
                refl_f = jnp.where(hit_i, spheres[i, 11], refl_f)
                idx_f = jnp.where(hit_i, float(i), idx_f)

            is_spec = refl_f == float(SPEC)
            hit = best_t < INF
            live = (alive > 0.5) & hit
            live_f = jnp.where(live, 1.0, 0.0)
            killed = jnp.maximum(killed, jnp.where((alive > 0.5) & ~hit, 1.0, 0.0))

            for ch in range(3):
                sacc[ch] = sacc[ch] + live_f * m[ch] * em[ch]

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

            hx = ox + dx * best_t
            hy = oy + dy * best_t
            hz = oz + dz * best_t
            ddn = dx * n_x + dy * n_y + dz * n_z
            rfx = dx - 2.0 * ddn * n_x
            rfy = dy - 2.0 * ddn * n_y
            rfz = dz - 2.0 * ddn * n_z
            rlen = lax.rsqrt(jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz, 1e-40))

            aoi = -ddn
            one_m_aoi = jnp.maximum(1.0 - aoi, 0.0)
            grazing = jnp.power(one_m_aoi, fresnel_pow)
            fresnel = (grazing * (1.0 - fresnel_coef) + fresnel_coef) * spec0
            take_reflect = u_reflect < fresnel
            p = jnp.clip(fresnel, 1e-6, 1.0 - 1e-6)

            flip = jnp.abs(n_x) > 0.1
            ax = jnp.where(flip, 0.0, 1.0)
            ay = jnp.where(flip, 1.0, 0.0)
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
            cos2 = (cdx * n_x + cdy * n_y + cdz * n_z) * 2.0

            mult = []
            for ch in range(3):
                mm = jnp.where(take_reflect, spec0, col[ch] * cos2)
                mm = jnp.where(is_spec, 1.0, mm)
                mult.append(mm)

            ndx = jnp.where(take_reflect, rfx * rlen, cdx)
            ndy = jnp.where(take_reflect, rfy * rlen, cdy)
            ndz = jnp.where(take_reflect, rfz * rlen, cdz)
            ndx = jnp.where(is_spec, rfx, ndx)
            ndy = jnp.where(is_spec, rfy, ndy)
            ndz = jnp.where(is_spec, rfz, ndz)

            # Sanitize under the live mask: dead lanes carry NaN through the
            # normal (inf * rsqrt(inf)) and everything derived from it, and
            # 0 * NaN = NaN would poison the reverse sweep's masked sums.
            def _z(x, safe=0.0):
                return jnp.where(live, x, safe)

            rec = dict(
                live=live_f, m=list(m), em=em, col=col, spec0=_z(spec0),
                idx=idx_f, cos2=_z(cos2), take_reflect=take_reflect,
                is_spec=is_spec, p=_z(p, 0.5), grazing=_z(grazing),
                one_m_aoi=_z(one_m_aoi, 1.0),
                mult=[_z(mm) for mm in mult], fresnel=_z(fresnel, 0.5),
            )
            if with_camera:
                # Geometric adjoint state: the ray ENTERING this bounce, the
                # winning hit distance and the (sanitized) surface normal.
                # Everything else the reverse sweep recomputes from these +
                # the sphere scalars + an RNG replay.
                rec.update(
                    o=(ox, oy, oz), d=(dx, dy, dz), t=_z(best_t, 1.0),
                    n=(_z(n_x), _z(n_y), _z(n_z, 1.0)),
                    cp=_z(cp), spn=_z(spn), wz=_z(wz, 1.0),
                )
            saved.append(rec)

            ox = jnp.where(live, hx + ORIGIN_OFFSET * n_x, ox)
            oy = jnp.where(live, hy + ORIGIN_OFFSET * n_y, oy)
            oz = jnp.where(live, hz + ORIGIN_OFFSET * n_z, oz)
            dx = jnp.where(live, ndx, dx)
            dy = jnp.where(live, ndy, dy)
            dz = jnp.where(live, ndz, dz)
            for ch in range(3):
                m[ch] = jnp.where(live, m[ch] * mult[ch], m[ch])
            alive = live_f

        not_killed = 1.0 - jnp.minimum(killed, 1.0)
        for ch in range(3):
            acc[ch] = acc[ch] + sacc[ch] * not_killed
        samples.append(dict(saved=saved, not_killed=not_killed))

    inv_spp = 1.0 / spp
    rgb = [a * inv_spp for a in acc]
    tgt = [tgt_r[:], tgt_g[:], tgt_b[:]]
    diff = [rgb[ch] - tgt[ch] for ch in range(3)]
    if settings.n_pixels % BLOCK:
        # Auto-padded tail lanes (pixel id past the frame) must contribute
        # zero to the loss and every gradient; masking diff zeroes the
        # whole reverse sweep for those lanes.
        valid = jnp.where(pixel < settings.n_pixels, 1.0, 0.0)
        diff = [d * valid for d in diff]
    loss_partial = (diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2])
    g = [2.0 * d * inv_n * inv_spp for d in diff]  # d loss / d sample-acc

    # ---- reverse sweep ----------------------------------------------------
    dcol = [[zero, zero, zero] for _ in range(n_spheres)]
    dem = [[zero, zero, zero] for _ in range(n_spheres)]
    dfc = zero
    dfp = zero
    # Camera chain: cotangents of the primary ray, accumulated over samples.
    dorg_acc = (zero, zero, zero)
    dd0_acc = (zero, zero, zero)

    for s in range(spp):
        sv = samples[s]["saved"]
        nk = samples[s]["not_killed"]
        gk = [gc * nk for gc in g]
        r_next = [zero, zero, zero]
        do_next = (zero, zero, zero)
        dd_next = (zero, zero, zero)
        for b in range(bounces - 1, -1, -1):
            d_ = sv[b]
            live = d_["live"]
            cm = [live * d_["m"][ch] * r_next[ch] for ch in range(3)]

            for i in range(n_spheres):
                sel = jnp.where(d_["idx"] == float(i), 1.0, 0.0) * live
                diffuse_sel = sel * jnp.where(
                    d_["take_reflect"] | d_["is_spec"], 0.0, 1.0)
                for ch in range(3):
                    dem[i][ch] = dem[i][ch] + sel * gk[ch] * d_["m"][ch]
                    dcol[i][ch] = dcol[i][ch] + diffuse_sel * d_["cos2"] * cm[ch]

            # Fresnel score gradients (DIFF hits only, p unclipped).
            is_diff = live * jnp.where(d_["is_spec"], 0.0, 1.0)
            unclipped = jnp.where(
                (d_["fresnel"] > 1e-6) & (d_["fresnel"] < 1.0 - 1e-6), 1.0, 0.0)
            dmult_dp = [
                jnp.where(
                    d_["take_reflect"],
                    d_["spec0"] / d_["p"],
                    -d_["col"][ch] * d_["cos2"] / (1.0 - d_["p"]),
                )
                for ch in range(3)
            ]
            dp = (cm[0] * dmult_dp[0] + cm[1] * dmult_dp[1]
                  + cm[2] * dmult_dp[2]) * is_diff * unclipped
            dfc = dfc + dp * (1.0 - d_["grazing"]) * d_["spec0"]
            safe_base = jnp.maximum(d_["one_m_aoi"], 1e-30)
            dlog = jnp.where(d_["one_m_aoi"] > 0.0, jnp.log(safe_base), 0.0)
            dfp = dfp + dp * (1.0 - fresnel_coef) * d_["spec0"] * \
                d_["grazing"] * dlog

            if with_camera:
                do_next, dd_next = _camera_bounce_adjoint(
                    d_, spheres, n_spheres, live, cm, dp, fresnel_coef,
                    fresnel_pow, do_next, dd_next, zero)

            r_b = [
                live * (gk[ch] * d_["em"][ch] + d_["mult"][ch] * r_next[ch])
                + (1.0 - live) * r_next[ch]
                for ch in range(3)
            ]
            r_next = r_b
        if with_camera:
            dorg_acc = _axpy3(1.0, do_next, dorg_acc)
            dd0_acc = _axpy3(1.0, dd_next, dd0_acc)

    # ---- per-block scalar partials ---------------------------------------
    # Compiled Mosaic can't block SMEM rows of width 128, so the partials
    # ship as one VMEM (8,128) tile per block: each scalar occupies lane
    # (0, k) via a one-hot mask; the host sums row 0 across blocks.
    row0 = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0) == 0
    colid = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1)

    def place(acc, k, val):
        return acc + jnp.where(row0 & (colid == k), val, 0.0)

    tile_out = jnp.zeros((ROWS, COLS), jnp.float32)
    tile_out = place(tile_out, 0, jnp.sum(loss_partial) * inv_n)
    for i in range(n_spheres):
        for ch in range(3):
            tile_out = place(tile_out, 1 + i * 6 + ch, jnp.sum(dcol[i][ch]))
            tile_out = place(tile_out, 1 + i * 6 + 3 + ch, jnp.sum(dem[i][ch]))
    tile_out = place(tile_out, 1 + n_spheres * 6, jnp.sum(dfc))
    tile_out = place(tile_out, 2 + n_spheres * 6, jnp.sum(dfp))

    if with_camera:
        # Pull the primary-direction cotangent back through the
        # normalization d0 = draw * inv_len, then project onto the camera
        # vector components: draw = view + u*cx + v*cy, o0 = origin.
        d0 = (d0x, d0y, d0z)
        proj = _dot3(d0, dd0_acc)
        ddraw = tuple(inv_len * (dd0_acc[k] - d0[k] * proj) for k in range(3))
        base2 = 3 + n_spheres * 6
        for k in range(3):
            tile_out = place(tile_out, base2 + k, jnp.sum(dorg_acc[k]))
            tile_out = place(tile_out, base2 + 3 + k, jnp.sum(ddraw[k]))
            tile_out = place(tile_out, base2 + 6 + k, jnp.sum(u * ddraw[k]))
            tile_out = place(tile_out, base2 + 9 + k, jnp.sum(v * ddraw[k]))

    out[:] = tile_out


@functools.partial(jax.jit, static_argnames=("settings", "seed", "interpret",
                                             "with_camera"))
def cornell_loss_grads(scene: Scene, settings: RenderSettings, camera, target,
                       frame, fresnel_coef, fresnel_pow, seed: int = 0,
                       interpret: bool = False, with_camera: bool = False):
    """L2 train loss + gradients, entirely in Pallas.

    ``target`` — [N,3] image.  Returns ``(loss, dcolor [N_s,3],
    demission [N_s,3], dfresnel_coef, dfresnel_pow)`` matching
    ``jax.value_and_grad`` of the XLA train loss (parallel/sharding.py).
    With ``with_camera=True`` a sixth element is appended: a ``Camera``
    cotangent (gradients w.r.t. origin/yaw/pitch/fov), produced by the
    in-kernel geometric adjoint pulled back through ``Camera.basis``.
    """
    s = scene.spheres
    n_spheres = s.count
    if with_camera and 15 + n_spheres * 6 > OUT_WIDTH:
        raise ValueError(f"camera grads need {15 + n_spheres * 6} output "
                         f"slots > {OUT_WIDTH} (too many spheres)")
    sph = jnp.concatenate([
        s.pos, s.radius[:, None], s.color, s.emission,
        s.spec_color[:, 0:1], s.refl[:, None].astype(jnp.float32),
    ], axis=1)

    origin, view_dir, up, right, fov_scale = camera.basis()
    aspect = settings.width / settings.height
    cx = (fov_scale * aspect) * right
    cy = fov_scale * up
    cam = jnp.concatenate([
        origin, view_dir, cx, cy,
        jnp.stack([fresnel_coef, fresnel_pow]),
        jnp.zeros((2,), jnp.float32),
    ])[None, :]

    spp, bounces = settings.samples_per_pass, settings.bounces
    streams = jnp.stack([
        word
        for si in range(spp) for bi in range(bounces) for slot in (0, 1)
        for word in rng_mod.make_stream(frame, jnp.uint32(si), bi, slot)
    ])[None, :]  # interleaved (counter_salt, key_salt) pairs

    n = settings.n_pixels
    nb = -(-n // BLOCK)   # auto-pad: tail lanes masked out of the loss
    pad = nb * BLOCK - n
    tile = pl.BlockSpec((ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    def comp(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(nb * ROWS, COLS)

    partials = pl.pallas_call(
        functools.partial(_grad_kernel, settings=settings,
                          n_spheres=n_spheres, seed=seed,
                          with_camera=with_camera),
        grid=(nb,),
        in_specs=[small, small, small, tile, tile, tile],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * ROWS, COLS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cam, sph, streams, comp(target[:, 0]), comp(target[:, 1]),
      comp(target[:, 2]))

    total = jnp.sum(partials.reshape(nb, ROWS, COLS)[:, 0, :], axis=0)
    loss = total[0]
    base = 1 + jnp.arange(n_spheres) * 6
    dcol = jnp.stack([total[base + ch] for ch in range(3)], axis=-1)
    dem = jnp.stack([total[base + 3 + ch] for ch in range(3)], axis=-1)
    dfc = total[1 + n_spheres * 6]
    dfp = total[2 + n_spheres * 6]
    if not with_camera:
        return loss, dcol, dem, dfc, dfp

    # Pull the 12 camera-vector cotangents (origin, view, cx, cy) back to
    # the Camera parameters (origin/yaw/pitch/fov) through basis().
    base2 = 3 + n_spheres * 6
    dvec = lax.dynamic_slice_in_dim(total, base2, 12)

    def cam_vec(c):
        o, view_dir, up, right, fs = c.basis()
        return jnp.concatenate([o, view_dir, (fs * aspect) * right, fs * up])

    _, pullback = jax.vjp(cam_vec, camera)
    (dcamera,) = pullback(dvec)
    return loss, dcol, dem, dfc, dfp, dcamera
