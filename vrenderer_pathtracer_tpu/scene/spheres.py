"""Hard-coded analytic sphere content, SoA-packed for vectorized intersection.

Values re-derived from the reference's constant tables
(``cuda/src/PathTracer.cu:107-123``):

* two always-present spheres — a mirror sphere (SPEC) and a gray diffuse
  sphere; both receive ``specular_color = (1,1,1)`` at hit time
  (``cuda/src/PathTracer.cu:188``) which makes the diffuse one the
  "Fresnel sphere".
* the Cornell box as six giant spheres (smallpt trick): a big light plus
  five walls, the red/green walls carrying small emissions; these get
  ``specular_color = (0,0,0)`` (``cuda/src/PathTracer.cu:168``).
* the "example sphere" (r=10 at the origin, white diffuse) that replaces the
  mesh when enabled.

Reflection-type enum matches the reference ordering (SPEC=0, DIFF=1, BRDF=2,
``cuda/src/PathTracer.cu:50``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

SPEC = 0
DIFF = 1
BRDF = 2


class SphereSet(NamedTuple):
    """SoA sphere arrays: every field has leading dim = number of spheres."""

    pos: jnp.ndarray        # [N,3]
    radius: jnp.ndarray     # [N]
    emission: jnp.ndarray   # [N,3]
    color: jnp.ndarray      # [N,3]
    refl: jnp.ndarray       # [N] int32
    spec_color: jnp.ndarray # [N,3]

    @property
    def count(self) -> int:
        return self.pos.shape[0]


def _soa(rows):
    pos = np.array([r[1] for r in rows], np.float32)
    rad = np.array([r[0] for r in rows], np.float32)
    emi = np.array([r[2] for r in rows], np.float32)
    col = np.array([r[3] for r in rows], np.float32)
    ref = np.array([r[4] for r in rows], np.int32)
    spc = np.array([r[5] for r in rows], np.float32)
    return SphereSet(
        jnp.asarray(pos), jnp.asarray(rad), jnp.asarray(emi),
        jnp.asarray(col), jnp.asarray(ref), jnp.asarray(spc),
    )


# (radius, pos, emission, color, refl, specular_color_at_hit)
_MIRROR_AND_FRESNEL = [
    (3.5, (15.0, 0.0, 15.0), (0, 0, 0), (0, 0, 0), SPEC, (1, 1, 1)),
    (3.5, (25.0, 0.0, 15.0), (0, 0, 0), (1, 1, 1), DIFF, (1, 1, 1)),
]

_CORNELL = [
    (160.0, (0.0, 209.0, 0.0), (4.0, 3.6, 3.2), (0, 0, 0), DIFF, (0, 0, 0)),          # light
    (1e5, (1e5 + 50.0, 0.0, 0.0), (0.075, 0.025, 0.025), (0.75, 0.25, 0.25), DIFF, (0, 0, 0)),  # right wall
    (1e5, (-1e5 - 50.0, 0.0, 0.0), (0.025, 0.075, 0.025), (0.25, 0.75, 0.25), DIFF, (0, 0, 0)), # left wall
    (1e5, (0.0, 0.0, -1e5 - 100.0), (0, 0, 0), (1, 1, 1), DIFF, (0, 0, 0)),            # back wall
    (1e5, (0.0, 1e5 + 50.0, 0.0), (0, 0, 0), (1, 1, 1), DIFF, (0, 0, 0)),              # ceiling
    (1e5, (0.0, -1e5 - 50.0, 0.0), (0, 0, 0), (1, 1, 1), DIFF, (0, 0, 0)),             # floor
]

EXAMPLE_SPHERE_RADIUS = 10.0
EXAMPLE_SPHERE_POS = (0.0, 0.0, 0.0)


def build_sphere_set(use_cornell_box: bool) -> SphereSet:
    """Analytic spheres in the reference's iteration order.

    The reference tests the Cornell spheres first, then the mirror/Fresnel
    pair, each later hit winning only if *strictly* closer
    (``cuda/src/PathTracer.cu:149-190``); our vectorized argmin keeps the
    first minimum, so listing them in the same order preserves tie-breaks.
    """
    rows = (_CORNELL if use_cornell_box else []) + _MIRROR_AND_FRESNEL
    return _soa(rows)


def example_sphere() -> SphereSet:
    return _soa([
        (EXAMPLE_SPHERE_RADIUS, EXAMPLE_SPHERE_POS, (0, 0, 0), (1, 1, 1), DIFF, (0, 0, 0)),
    ])
