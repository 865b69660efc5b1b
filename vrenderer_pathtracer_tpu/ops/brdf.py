"""MERL-100 measured-BRDF evaluation (Rusinkiewicz half/diff parameterisation).

Re-derivation of the reference lookup (``cuda/src/PathTracer.cu:473-566``,
itself adapted from the MERL BRDFRead code / Disney's BRDF Explorer):

* half vector ``H = normalize(out - in)`` where ``in`` is the incoming ray
  direction (pointing at the surface) and ``out`` the scattered direction;
* ``theta_h = acos(n.H)``, ``theta_d = acos(H.out)``; ``phi_d`` from a
  Gram-Schmidt diff frame, falling back to the tangent frame when
  ``theta_d < 1e-3`` and to 0 when ``theta_h <= 1e-3``;
* non-linear sqrt warp on the ``theta_h`` index (90 bins), linear 90/180 bins
  for ``theta_d``/``phi_d`` with the reciprocity fold ``phi_d += pi``;
* per-channel scales (1, 1.15, 1.66)/1500.

Table layout: ``[3, 90*90*180]`` channels-major, channel slabs ordered R,G,B,
index ``phi_d + theta_d*180 + theta_h*180*90`` — identical to the MERL binary
after the loader splits channels.  The lookup is differentiable w.r.t. the
table (gather -> scatter-add in the backward pass), giving material-estimation
gradients the reference cannot express.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RES_THETA_H = 90
RES_THETA_D = 90
RES_PHI_D = 180  # retained *half* of the 360 phi_d bins (reciprocity)

# numpy (not jnp) on purpose: a module-level jnp.array would initialise the
# XLA backend at import time, which breaks jax.distributed.initialize in
# multi-process workers (it must run before any backend-touching call).
CHANNEL_SCALE = np.array([1.0 / 1500.0, 1.15 / 1500.0, 1.66 / 1500.0], np.float32)

TABLE_SIZE = RES_THETA_H * RES_THETA_D * RES_PHI_D


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def merl_index(out_dir, in_dir, normal, tangent):
    """Flat MERL table index per lane. All inputs [B,3] unit vectors."""
    bitangent = jnp.cross(normal, tangent)
    h = out_dir - in_dir
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)

    theta_h = jnp.arccos(jnp.clip(_dot(normal, h), 0.0, 1.0))
    theta_d = jnp.arccos(jnp.clip(_dot(h, out_dir), 0.0, 1.0))

    # phi_d: three cases exactly as the reference orders them.
    phi_tangent = jnp.arctan2(
        jnp.clip(-_dot(out_dir, bitangent), -1.0, 1.0),
        jnp.clip(_dot(out_dir, tangent), -1.0, 1.0),
    )
    u = normal - _dot(normal, h)[:, None] * h
    u = -u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    v = jnp.cross(h, u)
    phi_gs = jnp.arctan2(
        jnp.clip(_dot(out_dir, v), -1.0, 1.0),
        jnp.clip(_dot(out_dir, u), -1.0, 1.0),
    )

    small_td = theta_d < 1e-3
    big_th = theta_h > 1e-3
    phi_d = jnp.where(small_td, phi_tangent, jnp.where(big_th, phi_gs, 0.0))
    theta_h = jnp.where(small_td | big_th, theta_h, 0.0)

    # Index maps (reference phi_diff_index/theta_half_index/theta_diff_index).
    phi_d = jnp.where(phi_d < 0.0, phi_d + jnp.pi, phi_d)
    idx_pd = jnp.clip((phi_d * (RES_PHI_D / jnp.pi)).astype(jnp.int32), 0, RES_PHI_D - 1)
    idx_th = jnp.where(
        theta_h <= 0.0,
        0,
        jnp.clip(
            (jnp.sqrt(theta_h * (2.0 / jnp.pi)) * RES_THETA_H).astype(jnp.int32),
            0,
            RES_THETA_H - 1,
        ),
    )
    idx_td = jnp.clip((theta_d * (2.0 / jnp.pi * RES_THETA_D)).astype(jnp.int32), 0, RES_THETA_D - 1)
    return idx_pd + idx_td * RES_PHI_D + idx_th * RES_PHI_D * RES_THETA_D


def lookup_brdf(table, out_dir, in_dir, normal, tangent):
    """RGB BRDF values, scaled per channel. table [3, TABLE_SIZE] -> [B,3]."""
    ind = merl_index(out_dir, in_dir, normal, tangent)
    rgb = table[:, ind].T  # [B,3]
    return rgb * CHANNEL_SCALE[None, :]
