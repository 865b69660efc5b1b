"""Fused mesh-scene radiance megakernel with deferred asset fetches.

Round-1's Pallas megakernel (pallas_radiance.py) covered only analytic
Cornell scenes; every mesh/HDRI/MERL/texture workload fell back to the XLA
wavefront, paying an HBM round trip of the full per-lane carry state every
bounce.  This kernel is the general-scene counterpart: the ENTIRE bounce
loop — sphere intersection, SBVH packet traversal (accel/pallas_common.py),
example-sphere shading, Fresnel/diffuse/mirror/BRDF scattering, RNG,
accumulation — runs in VMEM, matching the reference's one-megakernel
generality (``cuda/src/PathTracer.cu:597-770``) in TPU shape.

The one thing Mosaic cannot do is per-lane vector gathers, which texture,
environment-map and MERL-table fetches need.  The kernel solves this two
ways:

* **Mesh attributes are gather-free by construction**: the packet traversal
  broadcasts one triangle at a time as scalars, so the winning triangle's
  normal/uv/tangent are captured AT WIN TIME via the ``on_hit`` hook — no
  post-hoc gather by slot index.
* **Table fetches are deferred**: quantities whose *value* never influences
  control flow or ray directions — the HDRI miss radiance, the diffuse
  texture colour, the MERL reflectance — enter the estimator only as
  multiplicative/additive factors.  The kernel emits compact per-bounce
  records (miss-weighted throughput + direction, uv, MERL index) and a thin
  XLA epilogue performs the gathers and composes

      radiance = sum_b [ A_b * PD_b  +  E_b * env(dir_b) * PD_b ],
      PD_b     = prod_{j<b} D_j,

  where ``A_b = live_b * M_b * em_b`` and ``E_b = miss_b * M_b`` carry the
  kernel-known throughput ``M_b = prod_{j<b} K_j`` and ``D_j`` are the
  deferred factors (texture colour, ``24*max(merl,0)``; 1 elsewhere).

What stays out of scope (falls back to the XLA wavefront): normal maps
(change ray directions) and specular maps (change the Fresnel branch
probability) — their fetched values feed control flow, so they cannot be
deferred; paged (VMEM-exceeding) meshes.

**Deferred-table gradients come for free.** The env map, diffuse texture
and MERL table never enter the kernel — only the XLA epilogue touches
them — so ``jax.grad`` w.r.t. those tables works through this function
WITHOUT an AD rule for the kernel (the Pallas call is a constant
subexpression of the cotangent graph) and matches the XLA wavefront's
gradients (tests/test_pallas_mesh.py).  Parameters that feed the kernel
(camera, sphere colors, fresnel) still require the XLA integrator: their
cotangents hit ``pl.pallas_call`` and fail at trace time, which is the
intended guard.  See parallel/sharding.py ``sharded_deferred_opt_step``.

RNG/estimator parity: bit-identical stream spec to core/rng.py and the same
constants as render/integrator.py; interpret-mode equivalence vs the XLA
wavefront is tested per scene class (tests/test_pallas_mesh.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrenderer_pathtracer_tpu.accel.pallas_common import (
    make_leaf_blk_fn, make_node_boxes_fn, root_exit_clamp_wide,
    wide_packet_traverse)
from vrenderer_pathtracer_tpu.accel.wide import WIDE_STACK_DEPTH
from vrenderer_pathtracer_tpu.config import RenderSettings
from vrenderer_pathtracer_tpu.core import rng as rng_mod
from vrenderer_pathtracer_tpu.ops import texture as tex_ops
from vrenderer_pathtracer_tpu.ops.brdf import (
    CHANNEL_SCALE, RES_PHI_D, RES_THETA_D, RES_THETA_H)
from vrenderer_pathtracer_tpu.ops.envmap import sample_env_bilinear, sample_env_nearest
from vrenderer_pathtracer_tpu.ops.intersect import INF, SPHERE_EPS
from vrenderer_pathtracer_tpu.ops.shading import ORIGIN_OFFSET
from vrenderer_pathtracer_tpu.render.pallas_radiance import (
    BLOCK, COLS, ROWS, _threefry2x32_tile, _to_unit,
    fresnel_diffuse_scatter, sphere_running_min)
from vrenderer_pathtracer_tpu.scene.scene import Scene
from vrenderer_pathtracer_tpu.scene.spheres import (
    EXAMPLE_SPHERE_POS, EXAMPLE_SPHERE_RADIUS, SPEC)

# PHYSICAL VMEM budgets for the scene-resident arrays (layout-aware, see
# accel/pallas_traverse.wide_vmem_bytes), leaving room for the per-lane
# tile working set.  Mirrors the traversal budgets: a 46.6MB sparse scene
# ran this kernel through rounds 2-4; the old 28MB dense ceiling was the
# RECORDS SMEM window, fixed by packed records in round 5 (docs/PERF.md) —
# the node count is gated separately in supports().
VMEM_SCENE_BUDGET_SPARSE = 48 * 1024 * 1024
VMEM_SCENE_BUDGET_DENSE = 44 * 1024 * 1024


class _Defer:
    """Static deferral plan derived from settings (hashable via fields)."""

    def __init__(self, settings: RenderSettings):
        self.env = settings.has_hdr and not settings.use_cornell_box
        self.tex = settings.has_diffuse_map and not settings.use_brdf and (
            settings.has_mesh or settings.use_example_sphere)
        self.merl = settings.use_brdf and settings.has_brdf and (
            settings.has_mesh or settings.use_example_sphere)
        # Emission terms must be deferred whenever a multiplicative factor
        # is (A_b needs the not-yet-known PD_b prefix).
        self.emit = self.tex or self.merl
        self.any = self.env or self.tex or self.merl

    def slots_per_sb(self) -> int:
        n = 0
        if self.emit:
            n += 3      # A_b
        if self.env:
            n += 6      # E_b + dir_b
        if self.tex:
            n += 2      # uv_b
        if self.merl:
            n += 1      # midx_b
        return n


def supports(scene: Scene, settings: RenderSettings) -> bool:
    """Kernel scope (everything else falls back to the XLA wavefront)."""
    import numpy as np

    if settings.has_normal_map or settings.has_specular_map:
        return False
    if settings.use_brdf and not settings.has_brdf:
        return False
    # brdf_importance_sampling composes since round 5: the lobe-MIS draw
    # runs IN-KERNEL (90-step CDF scans, analytic bin edges) with the
    # table factor still deferred to the epilogue.
    if settings.samples_per_pass * settings.bounces > 32:
        return False  # per-(s,b) output slots / compile-size bound
    # Sphere-material scope: the kernel routes only example-sphere/mesh
    # hits through the BRDF path, and packs spec_color as ONE scalar per
    # sphere (the Fresnel mix uses channel 0, reference parity) — a
    # BRDF-typed or non-gray-specular custom sphere would be shaded wrong,
    # so such scenes stay on the XLA wavefront.
    from vrenderer_pathtracer_tpu.scene.spheres import BRDF

    refl = np.asarray(scene.spheres.refl)
    spec = np.asarray(scene.spheres.spec_color)
    if (refl == BRDF).any():
        return False
    if not ((spec[:, 0] == spec[:, 1]) & (spec[:, 1] == spec[:, 2])).all():
        return False
    if settings.has_mesh and not settings.use_example_sphere:
        mesh = scene.mesh
        if mesh is None or mesh.paged is not None or mesh.nodes8_f is None:
            return False
        from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
            wide_vmem_bytes)

        defer = _Defer(settings)
        budget = (VMEM_SCENE_BUDGET_DENSE
                  if mesh.nodes8_f.shape[-1] == 128
                  else VMEM_SCENE_BUDGET_SPARSE)
        if wide_vmem_bytes(mesh, with_aux=defer.merl) > budget:
            return False
        from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
            RECORDS_SMEM_BUDGET)

        if 32 * mesh.nodes8_i.shape[0] > RECORDS_SMEM_BUDGET:
            return False
    return True


def _acos(x):
    """Mosaic-safe arccos: the TC kernel type lowers sin/cos/sqrt but NOT
    acos/asin/atan (probed on hardware, round 5 — the fused MERL path had
    only ever been exercised in interpret mode, which accepts jnp.arccos).
    Abramowitz–Stegun 4.4.45 seed (|err| <= 6.7e-5 rad) plus one Newton
    step on cos(theta) = x brings it to ~1e-7 — far below the MERL bins'
    angular width."""
    xa = jnp.clip(jnp.abs(x), 0.0, 1.0)
    p = 1.5707288 + xa * (-0.2121144 + xa * (0.0742610 + xa * (-0.0187293)))
    th = jnp.sqrt(jnp.maximum(1.0 - xa, 0.0)) * p
    s = jnp.sin(th)
    th = th + (jnp.cos(th) - xa) / jnp.maximum(s, 1e-6)
    return jnp.where(x < 0.0, 3.14159265 - th, th)


def _atan2(y, x):
    """Mosaic-safe arctan2 via the A&S 4.4.49 odd minimax polynomial
    (|err| <= 1e-5 rad, far below the 2-degree phi_d bins) with 1/z range
    reduction and quadrant fix-up."""
    pi = 3.14159265
    safe_x = jnp.where(jnp.abs(x) > 1e-30, x,
                       jnp.where(x >= 0.0, 1e-30, -1e-30))
    z = y / safe_x
    az = jnp.abs(z)
    inv = az > 1.0
    zz = jnp.where(inv, 1.0 / jnp.maximum(az, 1e-30), az)
    z2 = zz * zz
    r = zz * (0.9998660 + z2 * (-0.3302995 + z2 * (
        0.1801410 + z2 * (-0.0851330 + z2 * 0.0208351))))
    r = jnp.where(inv, 1.5707963 - r, r)
    r = jnp.where(z < 0.0, -r, r)
    return jnp.where(x < 0.0,
                     jnp.where(y >= 0.0, r + pi, r - pi), r)


def _merl_index_tile(cd, d, n, t):
    """MERL flat index on component tiles (ops/brdf.py merl_index spec).

    ``cd`` (scattered out dir), ``d`` (incoming ray dir), ``n`` (normal),
    ``t`` (tangent): 3-tuples of (8,128) tiles.  Returns float32 index tile
    (exact integers; the table is 1.458e6 < 2^24 entries).
    """
    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def norm3(a, eps=1e-12):
        inv = lax.rsqrt(jnp.maximum(dot(a, a), eps * eps))
        return (a[0] * inv, a[1] * inv, a[2] * inv)

    bit = cross(n, t)
    h = norm3((cd[0] - d[0], cd[1] - d[1], cd[2] - d[2]))
    theta_h = _acos(jnp.clip(dot(n, h), 0.0, 1.0))
    theta_d = _acos(jnp.clip(dot(h, cd), 0.0, 1.0))

    phi_tangent = _atan2(
        jnp.clip(-dot(cd, bit), -1.0, 1.0), jnp.clip(dot(cd, t), -1.0, 1.0))
    nh = dot(n, h)
    u = (n[0] - nh * h[0], n[1] - nh * h[1], n[2] - nh * h[2])
    uinv = lax.rsqrt(jnp.maximum(dot(u, u), 1e-24))
    u = (-u[0] * uinv, -u[1] * uinv, -u[2] * uinv)
    v = cross(h, u)
    phi_gs = _atan2(
        jnp.clip(dot(cd, v), -1.0, 1.0), jnp.clip(dot(cd, u), -1.0, 1.0))

    small_td = theta_d < 1e-3
    big_th = theta_h > 1e-3
    phi_d = jnp.where(small_td, phi_tangent, jnp.where(big_th, phi_gs, 0.0))
    theta_h = jnp.where(small_td | big_th, theta_h, 0.0)

    phi_d = jnp.where(phi_d < 0.0, phi_d + jnp.pi, phi_d)
    idx_pd = jnp.clip((phi_d * (RES_PHI_D / jnp.pi)).astype(jnp.int32),
                      0, RES_PHI_D - 1)
    idx_th = jnp.where(
        theta_h <= 0.0, 0,
        jnp.clip((jnp.sqrt(theta_h * (2.0 / jnp.pi)) * RES_THETA_H)
                 .astype(jnp.int32), 0, RES_THETA_H - 1))
    idx_td = jnp.clip((theta_d * (2.0 / jnp.pi * RES_THETA_D))
                      .astype(jnp.int32), 0, RES_THETA_D - 1)
    idx = idx_pd + idx_td * RES_PHI_D + idx_th * RES_PHI_D * RES_THETA_D
    return idx.astype(jnp.float32)


def _kernel(cam, spheres, streams, *rest,
            settings: RenderSettings, n_spheres: int, seed: int,
            defer: _Defer, n_slots: int, tiled: bool, dual: bool = True):
    """One (8,128) pixel tile through the full general-scene estimator."""
    import os
    # Phase-cost probes (VPT_MESH_EXP): duplicate one phase of the bounce
    # loop so device-time deltas attribute the fused kernel's budget the
    # way VPT_TRAV_EXP does for the traversal body (docs/PERF.md).
    EXP = os.environ.get("VPT_MESH_EXP", "")
    has_mesh = settings.has_mesh and not settings.use_example_sphere
    use_example = settings.use_example_sphere
    w = settings.width
    spp = settings.samples_per_pass
    bounces = settings.bounces

    mis = settings.brdf_importance_sampling and defer.merl
    rest = list(rest)
    mis_cdf = rest.pop(0) if mis else None   # [1, 90] lobe CDF (detached)
    if has_mesh:
        nodes8_f = rest.pop(0)
        nodes8_p = rest.pop(0)   # flat SMEM, ONE packed word per child
        tri_pack = rest.pop(0)   # [T8,16] leaf blocks (incl. uv corners)
        tri_aux = rest.pop(0) if defer.merl else None  # tangent corners
    out = rest.pop(0)
    if has_mesh:
        t_scr = rest.pop(0)
        slot_scr = rest.pop(0)
        stack = rest.pop(0)
        nx_scr = rest.pop(0)
        ny_scr = rest.pop(0)
        nz_scr = rest.pop(0)
        uvu_scr = rest.pop(0) if defer.tex else None
        uvv_scr = rest.pop(0) if defer.tex else None
        txx_scr = rest.pop(0) if defer.merl else None
        txy_scr = rest.pop(0) if defer.merl else None
        txz_scr = rest.pop(0) if defer.merl else None

    pid = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0) * COLS + \
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1)
    base = cam[0, 14].astype(jnp.int32)
    if tiled:
        # Blocks cover 32x32 PIXEL TILES, not raster rows: a 1024-lane
        # raster block is a 1024x1-pixel strip whose bounce packets mix
        # unrelated geometry; compact tiles keep the block any-hit vote
        # local (the wavefront's _tile_remap insight — its absence here was
        # the mesh megakernel's 3x round-2 gap, docs/PERF.md round 3).
        # Pixel IDENTITY (ray + RNG stream) is untouched; the host side
        # inverse-remaps outputs back to raster order.
        tpr = w // 32
        ry0 = base // w          # base is 32-row aligned (see caller gate)
        pxi = lax.rem(pid, tpr) * 32 + lax.rem(lane, 32)
        pyi = ry0 + (pid // tpr) * 32 + lane // 32
        pixel = pyi * w + pxi
    else:
        pixel = base + pid * BLOCK + lane
    pixel_u = pixel.astype(jnp.uint32)
    px = (pixel % w).astype(jnp.float32)
    py = (pixel // w).astype(jnp.float32)

    def c(i):
        return cam[0, i]

    u0 = (0.25 + px) / settings.width - 0.5
    v0 = (0.25 + py) / settings.height - 0.5
    d0x = c(3) + u0 * c(6) + v0 * c(9)
    d0y = c(4) + u0 * c(7) + v0 * c(10)
    d0z = c(5) + u0 * c(8) + v0 * c(11)
    inv_len = lax.rsqrt(d0x * d0x + d0y * d0y + d0z * d0z)
    d0x, d0y, d0z = d0x * inv_len, d0y * inv_len, d0z * inv_len

    k0 = jnp.uint32(seed & 0xFFFFFFFF)
    k1 = jnp.uint32((seed >> 32) & 0xFFFFFFFF)
    fresnel_coef = c(12)
    fresnel_pow = c(13)

    zero = jnp.zeros((ROWS, COLS), jnp.float32)
    one = jnp.ones((ROWS, COLS), jnp.float32)
    acc_r = zero
    acc_g = zero
    acc_b = zero
    depth = jnp.ones((ROWS, COLS), jnp.float32)
    records = {}  # (name, s, b) -> tile(s)

    for s in range(spp):
        ox = jnp.full((ROWS, COLS), c(0))
        oy = jnp.full((ROWS, COLS), c(1))
        oz = jnp.full((ROWS, COLS), c(2))
        dx, dy, dz = d0x, d0y, d0z
        mr = one
        mg = one
        mb = one
        alive = jnp.ones((ROWS, COLS), bool)
        killed = jnp.zeros((ROWS, COLS), bool)
        sr = zero
        sg = zero
        sb = zero
        sample_rec = []  # (key, tile) written after kill is known

        for b in range(bounces):
            # --- analytic sphere running-min (shared with pallas_radiance) -
            best_t, (n_x, n_y, n_z), (col_r, col_g, col_b), \
                (em_r, em_g, em_b), spec0, refl_f = sphere_running_min(
                    spheres, n_spheres, (ox, oy, oz), (dx, dy, dz), zero)
            if EXP == "dup_sphere":  # cost probe: sphere phase twice —
                # folded behind a runtime-never-true, unprovable predicate.
                bt2 = sphere_running_min(
                    spheres, n_spheres, (ox, oy, oz),
                    (dy, dz, dx), zero)[0]
                best_t = jnp.where(jnp.sum(bt2) == -12345.0, 0.0, best_t)

            is_brdf = jnp.zeros((ROWS, COLS), bool)
            tex_hit = jnp.zeros((ROWS, COLS), bool)
            uv_u = zero
            uv_v = zero
            tan_x = one
            tan_y = zero
            tan_z = zero

            if use_example:
                # Reference cuda/src/PathTracer.cu:192-268, with the
                # fresh-normal UV divergence (SURVEY §7).
                ex_px, ex_py, ex_pz = EXAMPLE_SPHERE_POS
                ex_r = EXAMPLE_SPHERE_RADIUS
                opx = ex_px - ox
                opy = ex_py - oy
                opz = ex_pz - oz
                bq = opx * dx + opy * dy + opz * dz
                det = bq * bq - (opx * opx + opy * opy + opz * opz) + ex_r * ex_r
                ok = det >= 0.0
                sq = jnp.sqrt(jnp.where(ok, det, 0.0))
                tn = bq - sq
                tf = bq + sq
                t = jnp.where(tn > SPHERE_EPS, tn,
                              jnp.where(tf > SPHERE_EPS, tf, 0.0))
                ex_hit = ok & (t > 0.0) & (t < best_t)
                hx = ox + dx * t
                hy = oy + dy * t
                hz = oz + dz * t
                nx2 = hx - ex_px
                ny2 = hy - ex_py
                nz2 = hz - ex_pz
                inl = lax.rsqrt(jnp.maximum(
                    nx2 * nx2 + ny2 * ny2 + nz2 * nz2, 1e-40))
                nx2, ny2, nz2 = nx2 * inl, ny2 * inl, nz2 * inl
                best_t = jnp.where(ex_hit, t, best_t)
                n_x = jnp.where(ex_hit, nx2, n_x)
                n_y = jnp.where(ex_hit, ny2, n_y)
                n_z = jnp.where(ex_hit, nz2, n_z)
                col_r = jnp.where(ex_hit, 1.0, col_r)
                col_g = jnp.where(ex_hit, 1.0, col_g)
                col_b = jnp.where(ex_hit, 1.0, col_b)
                em_r = jnp.where(ex_hit, 0.0, em_r)
                em_g = jnp.where(ex_hit, 0.0, em_g)
                em_b = jnp.where(ex_hit, 0.0, em_b)
                spec0 = jnp.where(ex_hit, 0.0, spec0)
                refl_f = jnp.where(ex_hit, 1.0, refl_f)  # DIFF slot
                if settings.use_brdf:
                    is_brdf = is_brdf | ex_hit
                if defer.tex:
                    eu = _atan2(nx2, nz2) / (2.0 * jnp.pi) + 0.5
                    ev = ny2 * 0.5 + 0.5
                    uv_u = jnp.where(ex_hit, eu, uv_u)
                    uv_v = jnp.where(ex_hit, ev, uv_v)
                    tex_hit = tex_hit | ex_hit
                if defer.merl:
                    # Spherical tangent estimate (reference :232-235).
                    pr = jnp.sqrt(jnp.maximum(
                        hx * hx + hy * hy + hz * hz, 1e-24))
                    theta = _acos(jnp.clip(hz / pr, -1.0, 1.0))
                    phi = _atan2(hy, hx)
                    st = jnp.sin(theta)
                    tan_x = jnp.where(ex_hit, st * jnp.cos(phi), tan_x)
                    tan_y = jnp.where(ex_hit, st * jnp.sin(phi), tan_y)
                    tan_z = jnp.where(ex_hit, jnp.cos(theta), tan_z)

            if has_mesh:
                # --- fused 8-wide packet traversal (accel/wide.py layout),
                # attrs captured at win time from the vector leaf blocks ---
                slot_scr[:] = jnp.full((ROWS, COLS), -1, jnp.int32)
                # Dead lanes get a ZERO search bound: a terminated path's
                # stale ray must not drag the block's any-hit vote through
                # the tree for the remaining bounces (same rationale as
                # intersect_scene's alive hint on the standalone kernels).
                t_scr[:] = jnp.where(
                    alive,
                    root_exit_clamp_wide(
                        (ox, oy, oz), (dx, dy, dz), best_t, nodes8_f[0:8, :]),
                    0.0)

                def on_win(g, ref, win, select, blk, bu, bv):
                    shape = (8, COLS)
                    fx = (blk[:, 4:5] * blk[:, 8:9]
                          - blk[:, 5:6] * blk[:, 7:8])  # e1 x e2 per row
                    fy = (blk[:, 5:6] * blk[:, 6:7]
                          - blk[:, 3:4] * blk[:, 8:9])
                    fz = (blk[:, 3:4] * blk[:, 7:8]
                          - blk[:, 4:5] * blk[:, 6:7])
                    nxw = select(jnp.broadcast_to(fx, shape))
                    nyw = select(jnp.broadcast_to(fy, shape))
                    nzw = select(jnp.broadcast_to(fz, shape))
                    finv = lax.rsqrt(jnp.maximum(
                        nxw * nxw + nyw * nyw + nzw * nzw, 1e-40))
                    row = slice(g, g + 1)
                    nx_scr[row, :] = jnp.where(win, nxw * finv, nx_scr[row, :])
                    ny_scr[row, :] = jnp.where(win, nyw * finv, ny_scr[row, :])
                    nz_scr[row, :] = jnp.where(win, nzw * finv, nz_scr[row, :])
                    bw = 1.0 - bu - bv
                    if defer.tex:
                        iu = select(bw * blk[:, 10:11] + bu * blk[:, 12:13]
                                    + bv * blk[:, 14:15])
                        iv = select(bw * blk[:, 11:12] + bu * blk[:, 13:14]
                                    + bv * blk[:, 15:16])
                        uvu_scr[row, :] = jnp.where(win, iu, uvu_scr[row, :])
                        uvv_scr[row, :] = jnp.where(win, iv, uvv_scr[row, :])
                    if defer.merl:
                        aux = make_leaf_blk_fn(tri_aux)(ref)
                        tx = select(bw * aux[:, 0:1] + bu * aux[:, 3:4]
                                    + bv * aux[:, 6:7])
                        ty = select(bw * aux[:, 1:2] + bu * aux[:, 4:5]
                                    + bv * aux[:, 7:8])
                        tz = select(bw * aux[:, 2:3] + bu * aux[:, 5:6]
                                    + bv * aux[:, 8:9])
                        tinv = lax.rsqrt(jnp.maximum(
                            tx * tx + ty * ty + tz * tz, 1e-40))
                        txx_scr[row, :] = jnp.where(
                            win, tx * tinv, txx_scr[row, :])
                        txy_scr[row, :] = jnp.where(
                            win, ty * tinv, txy_scr[row, :])
                        txz_scr[row, :] = jnp.where(
                            win, tz * tinv, txz_scr[row, :])

                def node_meta(n):
                    words = [nodes8_p[n * 8 + c] for c in range(8)]
                    refs = [w & 0xFFFFF for w in words]
                    cnts = [((w >> 20) & 0xF) - 1 for w in words]
                    return refs, cnts, (words[0] >> 24) & 3, 0

                # Dual-node visits (nodes_per_visit=2): same win as the
                # standalone packet kernel — two disjoint stack entries per
                # iteration overlap the serialized scalar<->vector chains.
                wide_packet_traverse(
                    (ox, oy, oz), (dx, dy, dz), t_scr, slot_scr, stack,
                    node_boxes=make_node_boxes_fn(nodes8_f),
                    node_meta=node_meta,
                    leaf_blk=make_leaf_blk_fn(tri_pack),
                    n_nodes=nodes8_p.shape[0] // 8,
                    on_win=on_win,
                    nodes_per_visit=2 if dual else 1,
                )
                mesh_won = slot_scr[:] >= 0
                best_t = jnp.where(mesh_won, t_scr[:], best_t)
                n_x = jnp.where(mesh_won, nx_scr[:], n_x)
                n_y = jnp.where(mesh_won, ny_scr[:], n_y)
                n_z = jnp.where(mesh_won, nz_scr[:], n_z)
                col_r = jnp.where(mesh_won, 1.0, col_r)
                col_g = jnp.where(mesh_won, 1.0, col_g)
                col_b = jnp.where(mesh_won, 1.0, col_b)
                em_r = jnp.where(mesh_won, 0.0, em_r)
                em_g = jnp.where(mesh_won, 0.0, em_g)
                em_b = jnp.where(mesh_won, 0.0, em_b)
                spec0 = jnp.where(mesh_won, 0.0, spec0)
                refl_f = jnp.where(mesh_won, 1.0, refl_f)
                if settings.use_brdf:
                    is_brdf = is_brdf | mesh_won
                if defer.tex:
                    uv_u = jnp.where(mesh_won, uvu_scr[:], uv_u)
                    uv_v = jnp.where(mesh_won, uvv_scr[:], uv_v)
                    tex_hit = tex_hit | mesh_won
                if defer.merl:
                    tan_x = jnp.where(mesh_won, txx_scr[:], tan_x)
                    tan_y = jnp.where(mesh_won, txy_scr[:], tan_y)
                    tan_z = jnp.where(mesh_won, txz_scr[:], tan_z)

            is_spec = (refl_f == float(SPEC)) & ~is_brdf
            hit = best_t < INF
            live = alive & hit
            miss = alive & ~hit
            if settings.use_cornell_box:
                killed = killed | miss

            if b == 0:
                depth = jnp.where(live, best_t / settings.depth_scale, depth)

            live_f = jnp.where(live, 1.0, 0.0)
            if defer.emit:
                sample_rec.append((("A", s, b), [
                    live_f * mr * em_r, live_f * mg * em_g,
                    live_f * mb * em_b]))
            else:
                sr = sr + live_f * mr * em_r
                sg = sg + live_f * mg * em_g
                sb = sb + live_f * mb * em_b

            if defer.env:
                miss_f = jnp.where(miss, 1.0, 0.0)
                sample_rec.append((("E", s, b), [
                    miss_f * mr, miss_f * mg, miss_f * mb]))
                sample_rec.append((("dir", s, b), [dx, dy, dz]))

            # --- RNG draws (core/rng.py stream spec) ----------------------
            words_per_sb = 6 if mis else 4
            base_i = (s * bounces + b) * words_per_sb
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
            if mis:
                st2 = streams[0, base_i + 4]
                sk2 = streams[0, base_i + 5]
                r4, r5 = _threefry2x32_tile(
                    k0 ^ sk2, k1, pixel_u,
                    jnp.full((ROWS, COLS), st2, jnp.uint32))
                u_b1 = _to_unit(r4)
                u_b2 = _to_unit(r5)
            if EXP == "dup_rng":  # cost probe: both threefry rounds twice
                ra, _ = _threefry2x32_tile(
                    k0 ^ sk1, k1, pixel_u + jnp.uint32(1),
                    jnp.full((ROWS, COLS), st0, jnp.uint32))
                rb, rc = _threefry2x32_tile(
                    k0 ^ sk0, k1, pixel_u + jnp.uint32(2),
                    jnp.full((ROWS, COLS), st1, jnp.uint32))
                never = jnp.sum(ra ^ rb ^ rc) == jnp.uint32(0xDEADBEEF)
                u_reflect = jnp.where(never, 0.5, u_reflect)

            # --- scatter core (shared with pallas_radiance) ---------------
            (hx, hy, hz), (rfx, rfy, rfz), rlen, take_reflect, \
                (cdx, cdy, cdz), (ndx, ndy, ndz), (mult_r, mult_g, mult_b) = \
                fresnel_diffuse_scatter(
                    (ox, oy, oz), (dx, dy, dz), (n_x, n_y, n_z), best_t,
                    spec0, (col_r, col_g, col_b), fresnel_coef, fresnel_pow,
                    u_reflect, u_phi, u_r)
            if EXP == "dup_scatter":  # cost probe: scatter core twice
                probe = fresnel_diffuse_scatter(
                    (ox, oy, oz), (dx, dy, dz), (n_y, n_z, n_x), best_t,
                    spec0, (col_r, col_g, col_b), fresnel_coef, fresnel_pow,
                    u_phi, u_r, u_reflect)[3]
                never = jnp.sum(jnp.where(probe, 1.0, 0.0)) == -1.0
                mult_r = jnp.where(never, 0.0, mult_r)

            # BRDF hits: cosine sample (or one-sample lobe MIS, below);
            # kernel factor 1 (or cos/(pi*p_mix)), table value deferred.
            if defer.merl and not mis:
                bdx, bdy, bdz = cdx, cdy, cdz
                fac = None
            elif defer.merl:
                # --- in-kernel MERL lobe MIS (round 5, VERDICT r4 #7) ----
                # Mirrors ops/brdf_sampling.py with the SAME RNG streams
                # (u_reflect selects, u_b1 bin, u_b2 intra-bin, u_phi
                # azimuth).  Mosaic has no per-lane gathers, so the two
                # 90-entry CDF lookups (searchsorted + mass-at-bin) run as
                # 90-step scalar-broadcast scans; the bin EDGES are
                # analytic in the bin index (the MERL sqrt warp), so no
                # other table data is needed.  The deferred table factor
                # (24*max(f,0), epilogue) is unchanged; the kernel folds
                # cos/(pi*p_mix) into the path throughput.  All pdf math
                # uses the detached CDF (gradients w.r.t. the table still
                # flow through the epilogue alone).
                two_pi = 6.2831853
                half_pi = 1.5707963

                def _norm3(x, y, z):
                    inv = lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-40))
                    return x * inv, y * inv, z * inv

                # searchsorted(cdf, u_b1, side="right"): 90-step scan, one
                # scalar CDF read + broadcast compare per bin.
                idxf = jnp.zeros((ROWS, COLS), jnp.float32)
                for i in range(RES_THETA_H):
                    idxf = idxf + jnp.where(u_b1 >= mis_cdf[0, i], 1.0, 0.0)
                bin_f = jnp.minimum(idxf, float(RES_THETA_H - 1))
                s90 = 1.0 / RES_THETA_H
                c_lo = jnp.cos((bin_f * s90) ** 2 * half_pi)
                c_hi = jnp.cos(((bin_f + 1.0) * s90) ** 2 * half_pi)
                cos_th = c_lo - u_b2 * (c_lo - c_hi)
                sin_th = jnp.sqrt(jnp.maximum(1.0 - cos_th * cos_th, 0.0))
                phi = two_pi * u_phi
                # Frame about the normal (cosine_hemisphere's construction).
                flip = jnp.abs(n_x) > 0.1
                a_x = jnp.where(flip, 0.0, 1.0)
                a_y = jnp.where(flip, 1.0, 0.0)
                ux = a_y * n_z
                uy = -a_x * n_z
                uz = a_x * n_y - a_y * n_x
                ux, uy, uz = _norm3(ux, uy, uz)
                vx = n_y * uz - n_z * uy
                vy = n_z * ux - n_x * uz
                vz = n_x * uy - n_y * ux
                spc = jnp.sin(phi) * sin_th
                cpc = jnp.cos(phi) * sin_th
                hx_ = ux * cpc + vx * spc + n_x * cos_th
                hy_ = uy * cpc + vy * spc + n_y * cos_th
                hz_ = uz * cpc + vz * spc + n_z * cos_th
                wix, wiy, wiz = -dx, -dy, -dz
                wih = wix * hx_ + wiy * hy_ + wiz * hz_
                lx = 2.0 * wih * hx_ - wix
                ly = 2.0 * wih * hy_ - wiy
                lz = 2.0 * wih * hz_ - wiz
                lx, ly, lz = _norm3(lx, ly, lz)
                take_lobe = u_reflect < 0.5
                bdx = jnp.where(take_lobe, lx, cdx)
                bdy = jnp.where(take_lobe, ly, cdy)
                bdz = jnp.where(take_lobe, lz, cdz)
                # pdf of the FINAL direction under both strategies.
                h2x, h2y, h2z = _norm3(wix + bdx, wiy + bdy, wiz + bdz)
                c2 = n_x * h2x + n_y * h2y + n_z * h2z
                neg = c2 < 0.0
                h2x = jnp.where(neg, -h2x, h2x)
                h2y = jnp.where(neg, -h2y, h2y)
                h2z = jnp.where(neg, -h2z, h2z)
                c2 = jnp.abs(c2)
                th2 = _acos(jnp.clip(c2, 0.0, 1.0))
                i2f = jnp.floor(jnp.sqrt(th2 * (2.0 / 3.14159265))
                                * RES_THETA_H)
                i2f = jnp.clip(i2f, 0.0, float(RES_THETA_H - 1))
                m_lo = jnp.zeros((ROWS, COLS), jnp.float32)
                m_hi = jnp.zeros((ROWS, COLS), jnp.float32)
                for i in range(RES_THETA_H):
                    ci = mis_cdf[0, i]
                    m_lo = jnp.where(i2f == float(i + 1), ci, m_lo)
                    m_hi = jnp.where(i2f == float(i), ci, m_hi)
                mass2 = jnp.maximum(m_hi - m_lo, 0.0)
                e_lo = jnp.cos((i2f * s90) ** 2 * half_pi)
                e_hi = jnp.cos(((i2f + 1.0) * s90) ** 2 * half_pi)
                dom2 = jnp.maximum(two_pi * (e_lo - e_hi), 1e-12)
                wih2 = jnp.abs(wix * h2x + wiy * h2y + wiz * h2z)
                p_lobe = (mass2 / dom2) / jnp.maximum(4.0 * wih2, 1e-6)
                cos_o = jnp.maximum(n_x * bdx + n_y * bdy + n_z * bdz, 0.0)
                p_cos = cos_o / 3.14159265
                p_mix = 0.5 * p_lobe + 0.5 * p_cos
                fac = jnp.where(
                    p_mix > 0.0,
                    (1.0 / 3.14159265) * cos_o / jnp.maximum(p_mix, 1e-8),
                    0.0)
            if defer.merl:
                ndx = jnp.where(is_brdf, bdx, ndx)
                ndy = jnp.where(is_brdf, bdy, ndy)
                ndz = jnp.where(is_brdf, bdz, ndz)
                kf = 1.0 if fac is None else fac
                mult_r = jnp.where(is_brdf, kf, mult_r)
                mult_g = jnp.where(is_brdf, kf, mult_g)
                mult_b = jnp.where(is_brdf, kf, mult_b)
                midx = _merl_index_tile(
                    (bdx, bdy, bdz), (dx, dy, dz),
                    (n_x, n_y, n_z), (tan_x, tan_y, tan_z))
                midx = jnp.where(live & is_brdf, midx, -1.0)
                sample_rec.append((("midx", s, b), [midx]))

            if defer.tex:
                # Texture colour deferred: kernel col was set to 1 on
                # textured hits; record uv with an OUT-OF-BAND inactive
                # sentinel (+inf) — real assets legitimately carry negative
                # or >1 uv, and the epilogue must fetch them through the
                # same wrap semantics as the XLA wavefront.
                tex_active = live & tex_hit & ~take_reflect & ~is_brdf
                sample_rec.append((("uv", s, b), [
                    jnp.where(tex_active, uv_u, jnp.inf),
                    jnp.where(tex_active, uv_v, 0.0)]))

            # SPEC mirror overrides.
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

        not_killed = ~killed
        if settings.use_cornell_box:
            depth = jnp.where(killed, 0.0, depth)
        nk_f = jnp.where(not_killed, 1.0, 0.0)
        for key, tiles in sample_rec:
            if key[0] in ("A", "E"):
                tiles = [t * nk_f for t in tiles]
            records[key] = tiles
        if not defer.any or not defer.emit:
            sr = jnp.where(killed, 0.0, sr)
            sg = jnp.where(killed, 0.0, sg)
            sb = jnp.where(killed, 0.0, sb)
            acc_r = acc_r + sr
            acc_g = acc_g + sg
            acc_b = acc_b + sb

    # --- write the slot-blocked output ------------------------------------
    slot = 0

    def write(tile):
        nonlocal slot
        out[slot * ROWS:(slot + 1) * ROWS, :] = tile
        slot += 1

    write(depth)
    if defer.any:
        if not defer.emit:
            inv_spp = 1.0 / spp
            # env-only deferral still sums the emission part in-kernel
            records[("rgb",)] = [acc_r * inv_spp, acc_g * inv_spp,
                                 acc_b * inv_spp]
        for s in range(spp):
            for b in range(bounces):
                for name in ("A", "E", "dir", "uv", "midx"):
                    tiles = records.get((name, s, b))
                    if tiles is not None:
                        for t in tiles:
                            write(t)
        if not defer.emit:
            for t in records[("rgb",)]:
                write(t)
    else:
        inv_spp = 1.0 / spp
        write(acc_r * inv_spp)
        write(acc_g * inv_spp)
        write(acc_b * inv_spp)
    assert slot <= n_slots, (slot, n_slots)


def _layout(settings: RenderSettings, defer: _Defer):
    """Slot index per field, mirroring the kernel's write order."""
    idx = {}
    slot = 0
    idx[("depth",)] = slot
    slot += 1
    if defer.any:
        for s in range(settings.samples_per_pass):
            for b in range(settings.bounces):
                if defer.emit:
                    idx[("A", s, b)] = slot
                    slot += 3
                if defer.env:
                    idx[("E", s, b)] = slot
                    slot += 3
                    idx[("dir", s, b)] = slot
                    slot += 3
                if defer.tex:
                    idx[("uv", s, b)] = slot
                    slot += 2
                if defer.merl:
                    idx[("midx", s, b)] = slot
                    slot += 1
        if not defer.emit:
            idx[("rgb",)] = slot
            slot += 3
    else:
        idx[("rgb",)] = slot
        slot += 3
    return idx, slot


@functools.partial(jax.jit,
                   static_argnames=("settings", "seed", "interpret",
                                    "n_local_pixels", "dual"))
def render_pass_mesh_pallas(scene: Scene, settings: RenderSettings, camera,
                            frame, fresnel_coef, fresnel_pow, seed: int = 0,
                            interpret: bool = False, pixel_offset=None,
                            sample_offset=None,
                            n_local_pixels: int | None = None,
                            dual: bool = True):
    """General-scene fused forward pass; drop-in for integrator.render_pass.

    Returns ``(rgb_mean [N,3], depth [N])``.  Sharding hooks
    (``pixel_offset``/``sample_offset``/``n_local_pixels``) behave as in
    render_pass_pallas.
    """
    defer = _Defer(settings)
    s = scene.spheres
    n_spheres = s.count
    sph = jnp.concatenate([
        s.pos, s.radius[:, None], s.color, s.emission,
        s.spec_color[:, 0:1], s.refl[:, None].astype(jnp.float32),
    ], axis=1)

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
    ])[None, :]

    spp, bounces = settings.samples_per_pass, settings.bounces
    s_off = (jnp.asarray(sample_offset, jnp.uint32)
             if sample_offset is not None else jnp.uint32(0))
    mis = settings.brdf_importance_sampling and defer.merl
    slots = (0, 1, 2) if mis else (0, 1)   # slot 2: lobe-MIS u_b1/u_b2
    streams = jnp.stack([
        word
        for si in range(spp) for bi in range(bounces) for slot in slots
        for word in rng_mod.make_stream(frame, jnp.uint32(si) + s_off, bi, slot)
    ])[None, :]

    n = n_local_pixels if n_local_pixels is not None else settings.n_pixels
    # Non-BLOCK-multiple regions are padded up (see render_pass_pallas):
    # tail lanes trace finite garbage pixels and are sliced away below.
    nb = -(-n // BLOCK)
    # 32x32 pixel-tile blocks when the local region is whole tile rows.
    # Callers pass pixel_offset as a multiple of n (parallel/sharding.py
    # tile shards), so n % (w*32) == 0 also makes the offset 32-row aligned.
    tiled = settings.width % 32 == 0 and n % (settings.width * 32) == 0
    layout, n_slots = _layout(settings, defer)

    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    inputs = [cam, sph, streams]
    in_specs = [small, small, small]
    if mis:
        # Lobe CDF for the in-kernel MIS draw: 90 numbers, DETACHED (the
        # sampler build stop-gradients the table), so gradients w.r.t. the
        # MERL table still flow through the epilogue alone.
        from vrenderer_pathtracer_tpu.ops.brdf_sampling import (
            build_merl_sampler)

        inputs.append(build_merl_sampler(scene.brdf).cdf[None, :])
        in_specs.append(small)

    has_mesh = settings.has_mesh and not settings.use_example_sphere
    scratch = []
    if has_mesh:
        mesh = scene.mesh
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        # 8-wide layout: child boxes + leaf blocks are VMEM vector loads;
        # PACKED child records (one word per child incl. axis,
        # pallas_traverse.pack_node_words) are SMEM scalar fetches
        # (flattened 1-D: SMEM windows pad 2-D rows to 128 lanes).
        from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
            pack_node_words)

        inputs += [mesh.nodes8_f,
                   pack_node_words(mesh.nodes8_i, mesh.nodes8_ax),
                   mesh.tri_pack]
        in_specs += [small, smem, small]
        if defer.merl:
            inputs.append(mesh.tri_aux_pack)            # tangent corners
            in_specs.append(small)
        tile_f32 = pltpu.VMEM((ROWS, COLS), jnp.float32)
        scratch = [tile_f32, pltpu.VMEM((ROWS, COLS), jnp.int32),
                   pltpu.SMEM((WIDE_STACK_DEPTH,), jnp.int32),
                   tile_f32, tile_f32, tile_f32]
        if defer.tex:
            scratch += [tile_f32, tile_f32]
        if defer.merl:
            scratch += [tile_f32, tile_f32, tile_f32]

    out_spec = pl.BlockSpec((n_slots * ROWS, COLS), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, settings=settings, n_spheres=n_spheres,
                          seed=seed, defer=defer, n_slots=n_slots,
                          tiled=tiled, dual=dual),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nb * n_slots * ROWS, COLS),
                                       jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    blocks = out.reshape(nb, n_slots, ROWS, COLS)

    def field(key, width):
        k = layout[key]
        return [blocks[:, k + j].reshape(-1) for j in range(width)]

    def unmap(x):
        """Tile order -> raster order for [n,...] outputs (epilogue math is
        elementwise, so only the FINAL per-pixel arrays are remapped)."""
        if not tiled:
            return x
        from vrenderer_pathtracer_tpu.accel.pallas_traverse import _tile_remap
        return _tile_remap(x, n // settings.width, settings.width,
                           inverse=True)

    depth = unmap(field(("depth",), 1)[0][:n])
    if not defer.any:
        r, g, bch = field(("rgb",), 3)
        return unmap(jnp.stack([r, g, bch], axis=-1)[:n]), depth

    # --- XLA epilogue: the deferred gathers + composition ------------------
    fetch = (tex_ops.fetch_bilinear if settings.texture_filter == "bilinear"
             else tex_ops.fetch_nearest)
    env_fetch = (sample_env_bilinear if settings.texture_filter == "bilinear"
                 else sample_env_nearest)
    total = jnp.zeros((nb * BLOCK, 3), jnp.float32)
    for si in range(spp):
        pd = jnp.ones((nb * BLOCK, 3), jnp.float32)
        env_w = env_dir = None
        for bi in range(bounces):
            if defer.emit:
                a = jnp.stack(field(("A", si, bi), 3), axis=-1)
                total = total + a * pd
            if defer.env:
                # A path misses at most once, so E is nonzero at at most
                # one bounce: accumulate (E*PD, dir-at-miss) and fetch the
                # env map ONCE per sample below.  At 2M lanes a gather
                # costs ~2.4ns/row regardless of width (row-transaction
                # bound), so bounce-collapsing is the only lever — this
                # removes (bounces-1)/bounces of the env gathers (~20% of
                # the whole pass at 2spp x 4 bounces, docs/PERF.md).
                e = jnp.stack(field(("E", si, bi), 3), axis=-1)
                dirs = jnp.stack(field(("dir", si, bi), 3), axis=-1)
                if env_w is None:
                    env_w, env_dir = e * pd, dirs
                else:
                    env_w = env_w + e * pd
                    miss_here = jnp.any(e > 0.0, axis=-1, keepdims=True)
                    env_dir = jnp.where(miss_here, dirs, env_dir)
            d_fac = jnp.ones((nb * BLOCK, 3), jnp.float32)
            if defer.tex:
                uu, vv = field(("uv", si, bi), 2)
                active = jnp.isfinite(uu)
                texc = fetch(scene.diffuse_map, jnp.where(active, uu, 0.0),
                             jnp.where(active, vv, 0.0))
                d_fac = d_fac * jnp.where(active[:, None], texc, 1.0)
            if defer.merl:
                (mi,) = field(("midx", si, bi), 1)
                idx = jnp.clip(mi, 0.0, None).astype(jnp.int32)
                val = scene.brdf[:, idx].T * CHANNEL_SCALE[None, :]
                fac = 24.0 * jnp.maximum(val, 0.0)
                d_fac = d_fac * jnp.where(mi[:, None] >= 0.0, fac, 1.0)
            pd = pd * d_fac
        if defer.env:
            # Never-missed paths carry env_w=0 with a stale env_dir; guard
            # so a non-finite HDR texel (legal in EXR assets) cannot poison
            # them through 0*inf (same guard as the wavefront integrator).
            ever_missed = jnp.any(env_w != 0.0, axis=-1, keepdims=True)
            total = total + jnp.where(
                ever_missed, env_w * env_fetch(scene.hdr, env_dir), 0.0)
    total = total / spp
    if not defer.emit:
        r, g, bch = field(("rgb",), 3)
        total = total + jnp.stack([r, g, bch], axis=-1)
    return unmap(total[:n]), depth
