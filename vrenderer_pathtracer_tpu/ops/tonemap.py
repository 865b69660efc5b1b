"""Display transform: progressive scaling, clamp, gamma, 8-bit quantisation.

Reference: ``color = clamp(accum/frame, 0, 1) ** (1/2.2) * 255`` and
``depth_byte = (1 - depth) * 255`` (``cuda/src/PathTracer.cu:850-866``).
"""

from __future__ import annotations

import jax.numpy as jnp


def tonemap(accum, frame, gamma: float = 2.2):
    """Accumulated radiance [..,3] + frame count -> display-linear [0,1]."""
    color = jnp.clip(accum / frame, 0.0, 1.0)
    return jnp.power(color, 1.0 / gamma)


def to_uint8(img01):
    return (img01 * 255.0).astype(jnp.uint8)


def depth_to_uint8(depth):
    """Reference packs (1-depth)*255 into the depth texture."""
    return ((1.0 - depth) * 255.0).astype(jnp.uint8)
