"""Independent NumPy reference path tracer — the golden-image oracle.

This is a deliberately simple, scalar-minded re-implementation of the same
estimator the framework computes (re-derived from
``cuda/src/PathTracer.cu:597-868``), sharing nothing with the JAX code except
the RNG *specification* (Threefry-2x32, re-implemented here on Python ints).
It plays the role the reference's dual CUDA/OpenCL backends played: two
independent implementations whose images must agree.

float32 discipline is kept on every quantity that feeds a branch so that
discrete decisions (hit selection, Fresnel coin flips) agree bit-for-bit with
the float32 JAX pipeline.
"""

from __future__ import annotations

import numpy as np

F = np.float32
M32 = 0xFFFFFFFF

# ---------------------------------------------------------------------------
# Threefry-2x32 on Python integers (independent of the jnp implementation)
# ---------------------------------------------------------------------------

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def _rotl(x, r):
    return ((x << r) | (x >> (32 - r))) & M32


def threefry2x32_scalar(k0, k1, x0, x1):
    ks = (k0, k1, 0x1BD11BDA ^ k0 ^ k1)
    x0 = (x0 + ks[0]) & M32
    x1 = (x1 + ks[1]) & M32
    sched = [
        (_ROT_A, ks[1], (ks[2] + 1) & M32),
        (_ROT_B, ks[2], (ks[0] + 2) & M32),
        (_ROT_A, ks[0], (ks[1] + 3) & M32),
        (_ROT_B, ks[1], (ks[2] + 4) & M32),
        (_ROT_A, ks[2], (ks[0] + 5) & M32),
    ]
    for rots, a0, a1 in sched:
        for r in rots:
            x0 = (x0 + x1) & M32
            x1 = _rotl(x1, r)
            x1 ^= x0
        x0 = (x0 + a0) & M32
        x1 = (x1 + a1) & M32
    return x0, x1


def uniform2(seed, pixel_id, stream):
    counter_salt, key_salt = stream
    k0 = (seed & M32) ^ key_salt
    k1 = (seed >> 32) & M32
    b0, b1 = threefry2x32_scalar(k0, k1, pixel_id & M32, counter_salt & M32)
    return F((b0 >> 8) * 2.0 ** -24), F((b1 >> 8) * 2.0 ** -24)


def make_stream(frame, sample, bounce, slot):
    # (counter_salt, key_salt): sample perturbs the key (core/rng.py spec).
    counter = (((frame << 7) & M32) ^ (bounce << 2) ^ slot) & M32
    key = (sample * 0x9E3779B9) & M32
    return counter, key


# ---------------------------------------------------------------------------
# Scene tables (same constants as scene/spheres.py, written independently)
# ---------------------------------------------------------------------------

SPEC, DIFF, BRDF = 0, 1, 2


def sphere_rows(use_cornell):
    rows = []
    if use_cornell:
        rows += [
            (160.0, (0, 209, 0), (4.0, 3.6, 3.2), (0, 0, 0), DIFF, (0, 0, 0)),
            (1e5, (1e5 + 50, 0, 0), (0.075, 0.025, 0.025), (0.75, 0.25, 0.25), DIFF, (0, 0, 0)),
            (1e5, (-1e5 - 50, 0, 0), (0.025, 0.075, 0.025), (0.25, 0.75, 0.25), DIFF, (0, 0, 0)),
            (1e5, (0, 0, -1e5 - 100), (0, 0, 0), (1, 1, 1), DIFF, (0, 0, 0)),
            (1e5, (0, 1e5 + 50, 0), (0, 0, 0), (1, 1, 1), DIFF, (0, 0, 0)),
            (1e5, (0, -1e5 - 50, 0), (0, 0, 0), (1, 1, 1), DIFF, (0, 0, 0)),
        ]
    rows += [
        (3.5, (15, 0, 15), (0, 0, 0), (0, 0, 0), SPEC, (1, 1, 1)),
        (3.5, (25, 0, 15), (0, 0, 0), (1, 1, 1), DIFF, (1, 1, 1)),
    ]
    return rows


def intersect_sphere(ro, rd, pos, r):
    op = (pos - ro).astype(F)
    b = F(np.dot(op, rd))
    det = F(b * b - np.dot(op, op) + r * r)
    if det < 0:
        return F(0.0)
    sq = F(np.sqrt(det))
    t = F(b - sq)
    if t > F(1e-4):
        return t
    t = F(b + sq)
    return t if t > F(1e-4) else F(0.0)


def norm(v):
    return (v / np.linalg.norm(v)).astype(F)


def camera_basis(origin, yaw, pitch, fov_deg):
    sy, cy = np.sin(yaw), np.cos(yaw)
    sp, cp = np.sin(pitch), np.cos(pitch)
    forward = norm(np.array([sy * cp, sp, cy * cp], F))
    right = norm(np.cross(forward + np.array([0, 1, 0], F), forward))
    up = np.cross(forward, right).astype(F)
    fov_scale = F(np.tan(fov_deg * np.pi / 360.0))
    return np.asarray(origin, F), -forward, up, right, fov_scale


def env_nearest(hdr, rd):
    h, w = hdr.shape[:2]
    u = np.arctan2(rd[0], rd[2])
    if u < 0:
        u += 2 * np.pi
    u /= 2 * np.pi
    v = np.arccos(np.clip(rd[1], -1, 1)) / np.pi
    x = int(u * w)
    y = int(v * h)
    addr = min(max(x + y * w, 0), w * h - 1)
    return hdr.reshape(-1, 3)[addr].astype(F) * F(2.0)


def cosine_dir(n, u1, u2):
    w = n
    axis = np.array([0, 1, 0], F) if abs(w[0]) > 0.1 else np.array([1, 0, 0], F)
    u = norm(np.cross(axis, w))
    v = np.cross(w, u).astype(F)
    phi = F(2 * np.pi) * u1
    r = F(np.sqrt(u2))
    d = u * F(np.cos(phi)) * r + v * F(np.sin(phi)) * r + w * F(np.sqrt(max(1 - u2, F(0.0))))
    return norm(d)


def trace_pixel(
    spheres, hdr, ro, rd, pixel_id, sample, frame, bounces,
    fresnel_coef, fresnel_pow, use_cornell, seed=0, depth_scale=150.0,
):
    """One sample estimate for one pixel. Returns (rgb[3], depth)."""
    mask = np.ones(3, F)
    accum = np.zeros(3, F)
    depth = F(1.0)
    ro = np.asarray(ro, F).copy()
    rd = np.asarray(rd, F).copy()

    for bounce in range(bounces):
        best_t = F(1e20)
        best = None
        for (r, pos, emi, col, typ, spec) in spheres:
            t = intersect_sphere(ro, rd, np.array(pos, F), F(r))
            if t != 0.0 and t < best_t:
                best_t = t
                best = (np.array(pos, F), np.array(emi, F), np.array(col, F), typ, np.array(spec, F))
        if best is None:
            if use_cornell:
                return np.zeros(3, F), F(0.0)
            if hdr is not None:
                accum += mask * env_nearest(hdr, rd)
            return accum, depth

        pos, emi, col, typ, spec = best
        hit = (ro + rd * best_t).astype(F)
        n = norm(hit - pos)
        if bounce == 0:
            depth = F(np.linalg.norm(ro - hit) / depth_scale)
        accum += mask * emi

        u_reflect, _ = uniform2(seed, pixel_id, make_stream(frame, sample, bounce, 0))
        u_phi, u_r = uniform2(seed, pixel_id, make_stream(frame, sample, bounce, 1))

        if typ == SPEC:
            rd = rd - n * F(2.0) * F(np.dot(n, rd))
            ro = hit + n * F(0.05)
        else:  # DIFF
            aoi = F(np.dot(n, -rd))
            fresnel = F((F(1 - fresnel_coef) * F(max(1 - aoi, 0)) ** F(fresnel_pow) + F(fresnel_coef)) * spec[0])
            if u_reflect < fresnel:
                mask *= spec
                rd = norm(rd - n * F(2.0) * F(np.dot(n, rd)))
            else:
                nd = cosine_dir(n, u_phi, u_r)
                mask *= col
                mask *= F(np.dot(nd, n))
                mask *= F(2.0)
                rd = nd
            ro = hit + n * F(0.05)

    return accum, depth


def render_image(
    width, height, spp_per_frame, frames, bounces, use_cornell,
    hdr=None, camera=None, fresnel_coef=0.1, fresnel_pow=3.0, seed=0,
):
    """Full progressive render; returns (image01 [H,W,3], depth [H,W])."""
    cam = camera or dict(origin=(0, 0, 150), yaw=0.0, pitch=0.0, fov_deg=75.0)
    origin, view_dir, up, right, fov_scale = camera_basis(
        cam["origin"], cam["yaw"], cam["pitch"], cam["fov_deg"]
    )
    spheres = sphere_rows(use_cornell)
    cx = (fov_scale * F(width / height)) * right
    cy = fov_scale * up

    accum = np.zeros((height * width, 3), F)
    depth_img = np.ones(height * width, F)
    for frame in range(1, frames + 1):
        for y in range(height):
            for x in range(width):
                pid = x + y * width
                u = F((0.25 + x) / width - 0.5)
                v = F((0.25 + y) / height - 0.5)
                rd = norm(view_dir + cx * u + cy * v)
                total = np.zeros(3, F)
                for s in range(spp_per_frame):
                    rgb, dpt = trace_pixel(
                        spheres, hdr, origin, rd, pid, s, frame, bounces,
                        fresnel_coef, fresnel_pow, use_cornell, seed,
                    )
                    total += rgb
                    depth_img[pid] = dpt
                accum[pid] += total / F(spp_per_frame)

    img = np.clip(accum / F(frames), 0, 1) ** F(1 / 2.2)
    return img.reshape(height, width, 3), depth_img.reshape(height, width)
