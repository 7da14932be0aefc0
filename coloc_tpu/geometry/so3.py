"""SO(3) utilities: Euler conversions (reference convention), Rodrigues maps.

Reference parity: `colocUtils.hpp:63-141` uses a y-x-z style convention with
(bank, attitude, heading) = (atan2(-m12,m11), asin(m10), atan2(-m20,m00)) and
explicit pole singularity handling at |m10| > 0.998. The Kalman filter state
and CSV logs store angles in this convention, so we replicate it exactly.

Angle-axis (Rodrigues) conversions replace Ceres' AngleAxisToRotationMatrix /
RotationMatrixToAngleAxis used by the bundle adjuster (Refiner.hpp:62-105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def rot_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> (bank, attitude, heading), reference convention.

    Matches colocUtils.hpp:63-100 including the |m10|>0.998 pole branches.
    """
    m00, m02 = R[0, 0], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m22 = R[2, 0], R[2, 2]

    north = m10 > 0.998
    south = m10 < -0.998
    polar = north | south

    bank = jnp.where(polar, 0.0, jnp.arctan2(-m12, m11))
    attitude = jnp.where(
        polar,
        jnp.where(north, jnp.pi / 2, -jnp.pi / 2),
        jnp.arcsin(jnp.clip(m10, -1.0, 1.0)),
    )
    heading = jnp.where(polar, jnp.arctan2(m02, m22), jnp.arctan2(-m20, m00))
    return jnp.stack([bank, attitude, heading])


def euler_to_rot(euler: jnp.ndarray) -> jnp.ndarray:
    """(bank, attitude, heading) -> rotation matrix (colocUtils.hpp:102-141)."""
    b, a, h = euler[0], euler[1], euler[2]
    cb, sb = jnp.cos(b), jnp.sin(b)
    ca, sa = jnp.cos(a), jnp.sin(a)
    ch, sh = jnp.cos(h), jnp.sin(h)
    return jnp.array(
        [
            [ch * ca, sh * sb - ch * sa * cb, ch * sa * sb + sh * cb],
            [sa, ca * cb, -ca * sb],
            [-sh * ca, sh * sa * cb + ch * sb, -sh * sa * sb + ch * cb],
        ]
    )


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix [w]_x."""
    zero = jnp.zeros_like(w[0])
    return jnp.array(
        [
            [zero, -w[2], w[1]],
            [w[2], zero, -w[0]],
            [-w[1], w[0], zero],
        ]
    )


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: angle-axis (3,) -> rotation matrix (3,3).

    Taylor-safe near theta=0 so it is differentiable everywhere (the bundle
    adjuster optimizes in the tangent space; Refiner.hpp uses Ceres angle-axis).
    """
    theta_sq = jnp.dot(w, w)
    theta = jnp.sqrt(theta_sq + _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks
    a = jnp.where(theta_sq > 1e-8, jnp.sin(theta) / theta, 1.0 - theta_sq / 6.0)
    b = jnp.where(
        theta_sq > 1e-8, (1.0 - jnp.cos(theta)) / theta_sq, 0.5 - theta_sq / 24.0
    )
    W = hat(w)
    return jnp.eye(3) + a * W + b * (W @ W)


def to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), Shepperd's method.

    Branch-free: compute all four candidate extractions, select the one with
    the largest pivot (numerically stable for every rotation, incl. theta=pi).
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    # candidate pivots: 1+tr, 1+2*m00-tr, 1+2*m11-tr, 1+2*m22-tr (all = 4*q_i^2)
    pw = 1.0 + tr
    px = 1.0 + 2.0 * m00 - tr
    py = 1.0 + 2.0 * m11 - tr
    pz = 1.0 + 2.0 * m22 - tr

    qw = jnp.stack([pw, m21 - m12, m02 - m20, m10 - m01])
    qx = jnp.stack([m21 - m12, px, m01 + m10, m02 + m20])
    qy = jnp.stack([m02 - m20, m01 + m10, py, m12 + m21])
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, pz])

    pivots = jnp.stack([pw, px, py, pz])
    k = jnp.argmax(pivots)
    q = jnp.stack([qw, qx, qy, qz], axis=1)[:, k]  # (4,) unnormalized
    q = q / (jnp.linalg.norm(q) + _EPS)
    # canonical sign: w >= 0
    return q * jnp.where(q[0] < 0, -1.0, 1.0)


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> angle-axis (3,), via quaternion (stable near 0 and pi)."""
    q = to_quaternion(R)
    w, v = q[0], q[1:]
    vn = jnp.linalg.norm(v)
    theta = 2.0 * jnp.arctan2(vn, w)
    # theta/vn with series fallback: for small vn, theta ~ 2*vn/w
    scale = jnp.where(vn > 1e-7, theta / (vn + _EPS), 2.0 / jnp.maximum(w, _EPS))
    return scale * v


def project_to_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix via SVD (used after linear solvers)."""
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, jnp.sign(d)]))
    return U @ D @ Vt


# Batched versions
rot_to_euler_batch = jax.vmap(rot_to_euler)
euler_to_rot_batch = jax.vmap(euler_to_rot)
exp_batch = jax.vmap(exp)
log_batch = jax.vmap(log)
