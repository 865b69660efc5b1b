"""FXAA 3.11 post-process (PC quality path) as a JAX image pass.

Re-implementation of the algorithm the reference applies as a GLSL screen
pass (``shaders/screenQuadFXAA.frag``, NVIDIA FXAA 3.11): quality preset 29
(12 search steps 1, 1.5, 2x8, 4, 8 — ``screenQuadFXAA.frag:601-615``),
green-as-luma (``:6``), UI defaults subpix quality 0.75 / edge threshold
0.166 (``src/NGLScene.cpp:42-44``).  The reference's "sharpness" slider only
feeds the console path, which the PC shader ignores — kept out here.

Every pixel runs the full algorithm with masked lanes (no early-exit
branches): edge detection from the 3x3 luma neighborhood, end-of-edge search
along the span, sub-pixel blending, and a final bilinear re-sample shifted
perpendicular to the edge.  Pure elementwise math + gathers — XLA fuses it
into a handful of VPU passes; differentiable like everything else.
"""

from __future__ import annotations

import jax.numpy as jnp

QUALITY_STEPS = (1.0, 1.5, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 4.0, 8.0)
EDGE_THRESHOLD_MIN = 0.0833  # FXAA_QUALITY__EDGE_THRESHOLD_MIN default


def _sample_bilinear(img, x, y):
    """Clamped bilinear fetch at texel-space coords (centers at i+0.5)."""
    h, w = img.shape[0], img.shape[1]
    fx = x - 0.5
    fy = y - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    flat = img.reshape(-1, img.shape[-1])
    c00 = flat[x0c + y0c * w]
    c10 = flat[x1c + y0c * w]
    c01 = flat[x0c + y1c * w]
    c11 = flat[x1c + y1c * w]
    top = c00 * (1 - wx) + c10 * wx
    bot = c01 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bot * wy


def _shift(img, dy, dx):
    """Neighbor fetch with clamped borders (GL clamp-to-edge semantics)."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def fxaa(
    img,
    subpix_quality: float = 0.75,
    edge_threshold: float = 0.166,
    edge_threshold_min: float = EDGE_THRESHOLD_MIN,
):
    """Antialias a display-space image.  img [H,W,3] in [0,1] -> [H,W,3]."""
    h, w = img.shape[0], img.shape[1]
    luma = img[..., 1]  # green as luma

    l_m = luma
    l_n = _shift(luma[..., None], -1, 0)[..., 0]
    l_s = _shift(luma[..., None], 1, 0)[..., 0]
    l_w = _shift(luma[..., None], 0, -1)[..., 0]
    l_e = _shift(luma[..., None], 0, 1)[..., 0]
    l_nw = _shift(luma[..., None], -1, -1)[..., 0]
    l_ne = _shift(luma[..., None], -1, 1)[..., 0]
    l_sw = _shift(luma[..., None], 1, -1)[..., 0]
    l_se = _shift(luma[..., None], 1, 1)[..., 0]

    range_max = jnp.maximum(l_m, jnp.maximum(jnp.maximum(l_n, l_s), jnp.maximum(l_w, l_e)))
    range_min = jnp.minimum(l_m, jnp.minimum(jnp.minimum(l_n, l_s), jnp.minimum(l_w, l_e)))
    lrange = range_max - range_min
    early_exit = lrange < jnp.maximum(edge_threshold_min, range_max * edge_threshold)

    # --- edge orientation --------------------------------------------------
    edge_horz = (
        jnp.abs(l_nw - 2 * l_w + l_sw)
        + 2 * jnp.abs(l_n - 2 * l_m + l_s)
        + jnp.abs(l_ne - 2 * l_e + l_se)
    )
    edge_vert = (
        jnp.abs(l_nw - 2 * l_n + l_ne)
        + 2 * jnp.abs(l_w - 2 * l_m + l_e)
        + jnp.abs(l_sw - 2 * l_s + l_se)
    )
    horz_span = edge_horz >= edge_vert

    luma1 = jnp.where(horz_span, l_n, l_w)   # candidates perpendicular to edge
    luma2 = jnp.where(horz_span, l_s, l_e)
    grad1 = jnp.abs(luma1 - l_m)
    grad2 = jnp.abs(luma2 - l_m)
    pair1 = grad1 >= grad2
    gradient_scaled = 0.25 * jnp.maximum(grad1, grad2)
    # Perpendicular step direction: -1 towards N/W, +1 towards S/E (texels).
    length_sign = jnp.where(pair1, -1.0, 1.0)
    luma_nn = jnp.where(pair1, luma1, luma2) + l_m

    # --- end-of-edge search ------------------------------------------------
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    pos_x = xs + 0.5
    pos_y = ys + 0.5
    # Base position shifted half a texel perpendicular to the edge.
    base_x = jnp.where(horz_span, pos_x, pos_x + length_sign * 0.5)
    base_y = jnp.where(horz_span, pos_y + length_sign * 0.5, pos_y)
    off_x = jnp.where(horz_span, 1.0, 0.0)
    off_y = jnp.where(horz_span, 0.0, 1.0)

    luma_nn_half = luma_nn * 0.5

    pos_nx = base_x - off_x * QUALITY_STEPS[0]
    pos_ny = base_y - off_y * QUALITY_STEPS[0]
    pos_px = base_x + off_x * QUALITY_STEPS[0]
    pos_py = base_y + off_y * QUALITY_STEPS[0]

    def luma_at(x, y):
        return _sample_bilinear(luma[..., None], x, y)[..., 0]

    end_n = luma_at(pos_nx, pos_ny) - luma_nn_half
    end_p = luma_at(pos_px, pos_py) - luma_nn_half
    done_n = jnp.abs(end_n) >= gradient_scaled
    done_p = jnp.abs(end_p) >= gradient_scaled

    for step in QUALITY_STEPS[1:]:
        adv_n = ~done_n
        adv_p = ~done_p
        pos_nx = jnp.where(adv_n, pos_nx - off_x * step, pos_nx)
        pos_ny = jnp.where(adv_n, pos_ny - off_y * step, pos_ny)
        pos_px = jnp.where(adv_p, pos_px + off_x * step, pos_px)
        pos_py = jnp.where(adv_p, pos_py + off_y * step, pos_py)
        new_end_n = luma_at(pos_nx, pos_ny) - luma_nn_half
        new_end_p = luma_at(pos_px, pos_py) - luma_nn_half
        end_n = jnp.where(adv_n, new_end_n, end_n)
        end_p = jnp.where(adv_p, new_end_p, end_p)
        done_n = done_n | (jnp.abs(end_n) >= gradient_scaled)
        done_p = done_p | (jnp.abs(end_p) >= gradient_scaled)

    dst_n = jnp.where(horz_span, pos_x - pos_nx, pos_y - pos_ny)
    dst_p = jnp.where(horz_span, pos_px - pos_x, pos_py - pos_y)
    direction_n = dst_n < dst_p
    dst = jnp.minimum(dst_n, dst_p)
    span_length = dst_p + dst_n

    luma_m_lt = (l_m - luma_nn_half) < 0.0
    good_span_n = (end_n < 0.0) != luma_m_lt
    good_span_p = (end_p < 0.0) != luma_m_lt
    good_span = jnp.where(direction_n, good_span_n, good_span_p)
    pixel_offset = -dst / jnp.maximum(span_length, 1e-6) + 0.5
    pixel_offset_good = jnp.where(good_span, pixel_offset, 0.0)

    # --- sub-pixel aliasing removal ---------------------------------------
    subpix_a = 2.0 * (l_n + l_s + l_w + l_e) + (l_nw + l_sw + l_ne + l_se)
    subpix_b = subpix_a * (1.0 / 12.0) - l_m
    subpix_c = jnp.clip(jnp.abs(subpix_b) / jnp.maximum(lrange, 1e-6), 0.0, 1.0)
    subpix_d = -2.0 * subpix_c + 3.0
    subpix_f = subpix_d * subpix_c * subpix_c
    subpix_h = subpix_f * subpix_f * subpix_quality

    offset = jnp.maximum(pixel_offset_good, subpix_h) * length_sign
    out_x = jnp.where(horz_span, pos_x, pos_x + offset)
    out_y = jnp.where(horz_span, pos_y + offset, pos_y)
    filtered = _sample_bilinear(img, out_x, out_y)

    return jnp.where(early_exit[..., None], img, filtered)
