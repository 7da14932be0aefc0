"""Pinhole camera with radial-K3 distortion.

Reference parity: OpenMVG `Pinhole_Intrinsic_Radial_K3` as constructed in
Reconstructor.hpp:175-183 — K = [[f,0,cx],[0,f,cy],[0,0,1]] plus radial
coefficients (k1,k2,k3); forward distortion x_d = x_u (1 + k1 r^2 + k2 r^4 +
k3 r^6) in normalized coords; `get_ud_pixel` iterative undistortion
(RobustMatcher.hpp:395-397, Localizer.hpp:69) replaced by a fixed-iteration
fixed-point loop (jit-friendly, fully vmappable).

All functions operate on (..., 2) pixel arrays so they vmap/batch trivially.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    K: jnp.ndarray     # (3, 3) intrinsics
    dist: jnp.ndarray  # (3,) radial k1, k2, k3

    @property
    def fx(self):
        return self.K[0, 0]

    @property
    def fy(self):
        return self.K[1, 1]

    @property
    def cx(self):
        return self.K[0, 2]

    @property
    def cy(self):
        return self.K[1, 2]


_UNDISTORT_ITERS = 10


def normalize(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> normalized image coords (no distortion removal)."""
    f = jnp.stack([cam.fx, cam.fy])
    c = jnp.stack([cam.cx, cam.cy])
    return (uv - c) / f


def denormalize(cam: Camera, xy: jnp.ndarray) -> jnp.ndarray:
    f = jnp.stack([cam.fx, cam.fy])
    c = jnp.stack([cam.cx, cam.cy])
    return xy * f + c


def _radial_factor(cam: Camera, xy: jnp.ndarray) -> jnp.ndarray:
    r2 = jnp.sum(xy * xy, axis=-1, keepdims=True)
    k1, k2, k3 = cam.dist[0], cam.dist[1], cam.dist[2]
    return 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))


def distort(cam: Camera, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply radial distortion in normalized coords."""
    return xy * _radial_factor(cam, xy)


def undistort(cam: Camera, xy_d: jnp.ndarray) -> jnp.ndarray:
    """Invert radial distortion by fixed-point iteration (fixed trip count).

    x_{n+1} = x_d / factor(x_n); 10 iterations is ample for |k| typical of
    MAV cameras and keeps the loop jit-static (vs OpenMVG's bisection).
    """
    xy = xy_d
    for _ in range(_UNDISTORT_ITERS):
        xy = xy_d / _radial_factor(cam, xy)
    return xy


def undistort_pixel(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """get_ud_pixel parity: distorted pixel -> undistorted pixel."""
    return denormalize(cam, undistort(cam, normalize(cam, uv)))


def bearing(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel -> unit bearing vector in camera frame, (..., 3)."""
    xy = undistort(cam, normalize(cam, uv))
    v = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def project_cam(cam: Camera, X_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D point -> distorted pixel. X_cam: (..., 3)."""
    xy = X_cam[..., :2] / jnp.maximum(X_cam[..., 2:3], 1e-9)
    return denormalize(cam, distort(cam, xy))


def project(cam: Camera, R: jnp.ndarray, C: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """World point -> distorted pixel through pose (R, C). X: (..., 3)."""
    X_cam = (X - C) @ R.T
    return project_cam(cam, X_cam)


def depth(R: jnp.ndarray, C: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Z coordinate in camera frame (positive = in front)."""
    return ((X - C) @ R.T)[..., 2]
