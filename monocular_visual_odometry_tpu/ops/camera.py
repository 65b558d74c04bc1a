"""Pinhole camera model and pixel/camera-frame transforms.

TPU-native replacement for ``/root/reference/src/geometry/camera.cpp`` and
the ``Camera`` class (``camera.h:21-41``).  Images are assumed
pre-undistorted, as in the reference (``config/config.yaml:17``).

The camera is a tiny pytree of scalars so it can be closed over by jit or
passed as an argument without retracing on value changes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Pinhole intrinsics (fx, fy, cx, cy). A pytree of 0-d arrays."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def create(fx: float, fy: float, cx: float, cy: float) -> "Camera":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return Camera(f(fx), f(fy), f(cx), f(cy))

    @property
    def K(self) -> jnp.ndarray:
        """3x3 intrinsic matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )


def pixel2cam_norm_plane(uv: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Pixels (..., 2) -> normalized image plane (..., 2) at z=1.

    Mirrors ``pixel2CamNormPlane`` (camera.cpp:10-15).
    """
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


def pixel2cam(uv: jnp.ndarray, cam: Camera, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...) -> 3-D camera-frame points (..., 3).

    Mirrors ``pixel2cam`` (camera.cpp:16-22).
    """
    n = pixel2cam_norm_plane(uv, cam)
    return jnp.concatenate([n * depth[..., None], depth[..., None]], axis=-1)


def cam2pixel(p_cam: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Camera-frame 3-D points (..., 3) -> pixels (..., 2).

    Mirrors ``cam2pixel`` (camera.cpp:23-35).  No clamping: callers mask by
    depth>0 / in-frame themselves.
    """
    z = p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = p_cam[..., 0] / z_safe * cam.fx + cam.cx
    v = p_cam[..., 1] / z_safe * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def in_frame(uv: jnp.ndarray, height, width, border: float = 0.0) -> jnp.ndarray:
    """Boolean mask (...,) of pixels inside the image (with border margin).

    Mirrors ``Frame::isInFrame`` (/root/reference/src/vo/frame.cpp:29-41).
    """
    u, v = uv[..., 0], uv[..., 1]
    return (u >= border) & (u < width - border) & (v >= border) & (v < height - border)


def homogeneous(p: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last axis."""
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
