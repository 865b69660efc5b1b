"""Virtual camera: orientation state, orthonormal basis, primary-ray generation.

Re-derivation of the reference camera (``src/Camera.cpp``) and the in-kernel
ray setup (``cuda/src/PathTracer.cu:826-844``) as pure JAX:

* yaw/pitch -> forward basis:  ``forward = (sin(yaw)cos(pitch), sin(pitch),
  cos(yaw)cos(pitch))`` (``src/Camera.cpp:79-92``); the view direction sent to
  the kernel is ``-forward`` (``src/Camera.cpp:104-107``).
* ``right = normalize(cross(forward + (0,1,0), forward))``,
  ``up = cross(forward, right)`` (``src/Camera.cpp:26-34``).
* ``fov_scale = tan(fov_deg * pi/360)`` (``src/Camera.cpp:119-123``).
* per-pixel ray: ``d = dir + cx*((0.25+x)/w - 0.5) + cy*((0.25+y)/h - 0.5)``
  with ``cx = fov_scale*(w/h)*right``, ``cy = fov_scale*up``
  (``cuda/src/PathTracer.cu:833-844``).  Note the reference uses a *fixed*
  quarter-pixel offset, no sub-pixel jitter; :func:`generate_rays` keeps that
  default for parity and optionally accepts jitter for antialiased renders.

Everything is differentiable: gradients flow from pixels back to
``origin``/``yaw``/``pitch``/``fov`` so the camera can be optimised by
inverse rendering — a capability the reference does not have.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Camera parameter pytree (all leaves traced -> differentiable)."""

    origin: jnp.ndarray  # [3]
    yaw: jnp.ndarray     # scalar, radians
    pitch: jnp.ndarray   # scalar, radians
    fov_deg: jnp.ndarray # scalar, degrees

    @classmethod
    def default(cls) -> "Camera":
        """Reference defaults: loc (0,0,150), fov 75 deg (``src/Camera.cpp:11-18``)."""
        return cls(
            origin=jnp.array([0.0, 0.0, 150.0], jnp.float32),
            yaw=jnp.float32(0.0),
            pitch=jnp.float32(0.0),
            fov_deg=jnp.float32(75.0),
        )

    def basis(self):
        """Return (origin, view_dir, up, right, fov_scale).

        ``view_dir`` is the negated forward vector, matching
        ``Camera::getDir`` (``src/Camera.cpp:104-107``).
        """
        sy, cy = jnp.sin(self.yaw), jnp.cos(self.yaw)
        sp, cp = jnp.sin(self.pitch), jnp.cos(self.pitch)
        forward = jnp.stack([sy * cp, sp, cy * cp])
        forward = forward / jnp.linalg.norm(forward)
        # right = normalize(cross(forward + (0,1,0), forward))
        bent = forward + jnp.array([0.0, 1.0, 0.0], forward.dtype)
        right = jnp.cross(bent, forward)
        right = right / jnp.linalg.norm(right)
        up = jnp.cross(forward, right)
        fov_scale = jnp.tan(self.fov_deg * (jnp.pi / 360.0))
        return self.origin, -forward, up, right, fov_scale

    def with_pitch_clamped(self) -> "Camera":
        """Reference clamps |pitch| to pi/2 (``src/Camera.cpp:53-59``)."""
        half_pi = jnp.float32(jnp.pi / 2)
        return self._replace(pitch=jnp.clip(self.pitch, -half_pi, half_pi))

    # -- interaction (the reference's mouse controls, as pure updates) ------

    # LMB drag sensitivity: radians per pixel (src/NGLSceneMouseControls.cpp:27).
    DRAG_RAD_PER_PX = 0.00174532925

    def orbit(self, dx_px, dy_px) -> "Camera":
        """LMB drag: dx -> yaw, dy -> pitch, pitch clamped
        (``src/NGLSceneMouseControls.cpp:13-47``, ``src/Camera.cpp:53-65``)."""
        s = jnp.float32(self.DRAG_RAD_PER_PX)
        return self._replace(
            yaw=self.yaw + s * dx_px,
            pitch=self.pitch + s * dy_px,
        ).with_pitch_clamped()

    def move_forward(self, amount) -> "Camera":
        """RMB drag: translate along the view direction
        (``src/NGLSceneMouseControls.cpp:49-99``, ``src/Camera.cpp:67-77``)."""
        _, view_dir, _, _, _ = self.basis()
        return self._replace(origin=self.origin + view_dir * amount)


def generate_rays(camera: Camera, width: int, height: int, jitter=None):
    """Primary rays for every pixel, flattened row-major (ind = x + y*width).

    Returns ``(origins [N,3], directions [N,3])`` with N = width*height.
    ``jitter`` — optional ``(jx [N], jy [N])`` in [0,1); default is the
    reference's fixed 0.25 sub-pixel offset.
    """
    origin, view_dir, up, right, fov_scale = camera.basis()
    aspect = width / height
    cx = (fov_scale * aspect) * right  # [3]
    cy = fov_scale * up                # [3]

    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    xx = jnp.tile(x, height)             # [N] pixel x, row-major
    yy = jnp.repeat(y, width)            # [N] pixel y

    if jitter is None:
        ox = oy = jnp.float32(0.25)
    else:
        ox, oy = jitter
    u = (ox + xx) / width - 0.5          # [N]
    v = (oy + yy) / height - 0.5         # [N]

    d = view_dir[None, :] + u[:, None] * cx[None, :] + v[:, None] * cy[None, :]
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(origin[None, :], d.shape)
    return origins, d


def pixel_ids(width: int, height: int):
    """Row-major pixel identities used as RNG counters (ind = x + y*w)."""
    return jnp.arange(width * height, dtype=jnp.uint32)
