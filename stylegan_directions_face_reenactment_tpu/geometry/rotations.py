"""Batched rotation-representation converters (euler / axis-angle / quaternion / matrix).

Vectorized JAX equivalents of `libs/DECA/decalib/utils/rotation_converter.py`
(reference). Conventions match exactly:

  * quaternions are (w, x, y, z);
  * :func:`euler_to_quaternion` takes (x, y, z) half-angle products in the
    reference's XYZ ordering (`rotation_converter.py:71-90`);
  * :func:`batch_matrix2euler` extracts (x=asin(R[2,0]),
    y=atan2(R[2,1], R[2,2]), z=atan2(R[1,0], R[0,0])) — the pipeline maps
    these to (yaw, pitch, roll) (`rotation_converter.py:312-347`).

Deviation (documented): the reference `batch_matrix2euler` iterates samples
in Python and due to a bug returns only the *last* sample's angles for the
whole batch; it is only ever called with batch size 1, where the bug is
invisible. Ours is vectorized and correct for any batch.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

PI = math.pi


def deg2rad(x):
    return x * (PI / 180.0)


def rad2deg(x):
    return x * (180.0 / PI)


def euler_to_quaternion(r: jnp.ndarray) -> jnp.ndarray:
    """Euler (..., 3) [x, y, z] radians → quaternion (..., 4) (w, x, y, z)."""
    x, y, z = r[..., 0] / 2.0, r[..., 1] / 2.0, r[..., 2] / 2.0
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    return jnp.stack([
        cx * cy * cz - sx * sy * sz,
        cx * sy * sz + cy * cz * sx,
        cx * cz * sy - sx * cy * sz,
        cx * cy * sz + sx * cz * sy,
    ], axis=-1)


def angle_axis_to_quaternion(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) → quaternion (..., 4) (ceres convention)."""
    theta_sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    # double-where guard: keep sqrt's argument away from 0 so grads stay finite
    safe_sq = jnp.where(theta_sq > 0, theta_sq, 1.0)
    theta = jnp.sqrt(safe_sq)
    half = theta * 0.5
    k = jnp.where(theta_sq > 0, jnp.sin(half) / theta, 0.5)
    w = jnp.where(theta_sq > 0, jnp.cos(half), jnp.ones_like(half))
    return jnp.concatenate([w, aa * k], axis=-1)


def quaternion_to_angle_axis(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) → axis-angle (..., 3) (ceres convention)."""
    q1, q2, q3 = q[..., 1], q[..., 2], q[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    safe_sq = jnp.where(sin_sq > 0, sin_sq, 1.0)
    sin_theta = jnp.sqrt(safe_sq)
    cos_theta = q[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta))
    k = jnp.where(sin_sq > 0, two_theta / sin_theta, 2.0 * jnp.ones_like(sin_theta))
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (B, 4) (w,x,y,z) → rotation matrix (B, 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def rotation_matrix_to_quaternion(m: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Rotation matrix (B, 3, 3) → quaternion (B, 4), 4-branch stable form
    (`rotation_converter.py:92-169`)."""
    rmat_t = jnp.swapaxes(m, -1, -2)
    r00, r01, r02 = rmat_t[..., 0, 0], rmat_t[..., 0, 1], rmat_t[..., 0, 2]
    r10, r11, r12 = rmat_t[..., 1, 0], rmat_t[..., 1, 1], rmat_t[..., 1, 2]
    r20, r21, r22 = rmat_t[..., 2, 0], rmat_t[..., 2, 1], rmat_t[..., 2, 2]

    mask_d2 = r22 < eps
    mask_d0_d1 = r00 > r11
    mask_d0_nd1 = r00 < -r11

    t0 = 1 + r00 - r11 - r22
    q0 = jnp.stack([r12 - r21, t0, r01 + r10, r20 + r02], axis=-1)
    t1 = 1 - r00 + r11 - r22
    q1 = jnp.stack([r20 - r02, r01 + r10, t1, r12 + r21], axis=-1)
    t2 = 1 - r00 - r11 + r22
    q2 = jnp.stack([r01 - r10, r20 + r02, r12 + r21, t2], axis=-1)
    t3 = 1 + r00 + r11 + r22
    q3 = jnp.stack([t3, r12 - r21, r20 - r02, r01 - r10], axis=-1)

    c0 = (mask_d2 & mask_d0_d1)
    c1 = (mask_d2 & ~mask_d0_d1)
    c2 = (~mask_d2 & mask_d0_nd1)
    c3 = (~mask_d2 & ~mask_d0_nd1)

    def pick(c, q, t):
        return jnp.where(c[..., None], q / jnp.sqrt(jnp.maximum(t, eps))[..., None], 0.0)

    q = pick(c0, q0, t0) + pick(c1, q1, t1) + pick(c2, q2, t2) + pick(c3, q3, t3)
    return q * 0.5


def batch_rodrigues(rot_vecs: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (N, 3) → rotation matrices (N, 3, 3) (`lbs.py:274-305`)."""
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros],
                  axis=-1).reshape(rot_vecs.shape[:-1] + (3, 3))
    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    return ident + sin * K + (1 - cos) * jnp.matmul(K, K)


def batch_euler2axis(r: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_angle_axis(euler_to_quaternion(r))


def batch_euler2matrix(r: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_rotation_matrix(euler_to_quaternion(r))


def batch_axis2matrix(theta: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_rotation_matrix(angle_axis_to_quaternion(theta))


def batch_matrix2axis(m: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_angle_axis(rotation_matrix_to_quaternion(m))


def batch_matrix2euler(rot_mats: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (B, 3, 3) → euler (B, 3) [x=yaw, y=pitch, z=roll].

    Vectorized with gimbal-lock handling (|R[2,0]| > 0.998), replacing the
    reference's per-sample loop (`rotation_converter.py:312-347`).
    """
    r20 = rot_mats[..., 2, 0]
    lock_up = r20 > 0.998
    lock_dn = r20 < -0.998
    lock = lock_up | lock_dn

    x_reg = jnp.arcsin(jnp.clip(r20, -1.0, 1.0))
    # cos(x) >= 0 for x = asin(.), so dividing by cos(x) (reference) doesn't
    # change atan2's result.
    y_reg = jnp.arctan2(rot_mats[..., 2, 1], rot_mats[..., 2, 2])
    z_reg = jnp.arctan2(rot_mats[..., 1, 0], rot_mats[..., 0, 0])

    x_lock = jnp.where(lock_up, PI / 2.0, -PI / 2.0)
    y_lock = jnp.where(lock_up,
                       jnp.arctan2(-rot_mats[..., 0, 1], -rot_mats[..., 0, 2]),
                       jnp.arctan2(rot_mats[..., 0, 1], rot_mats[..., 0, 2]))
    z_lock = jnp.zeros_like(z_reg)

    x = jnp.where(lock, x_lock, x_reg)
    y = jnp.where(lock, y_lock, y_reg)
    z = jnp.where(lock, z_lock, z_reg)
    return jnp.stack([x, y, z], axis=-1)


def batch_axis2euler(theta: jnp.ndarray) -> jnp.ndarray:
    return batch_matrix2euler(batch_axis2matrix(theta))


def batch_orth_proj(X: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """Weak-perspective projection (`rotation_converter.py:364-372`,
    also `decalib/utils/util.py:227-237`).

    X: (B, P, 3); camera: (B, 3) = [scale, tx, ty].
    """
    cam = camera.reshape(-1, 1, 3)
    x_trans = X[:, :, :2] + cam[:, :, 1:]
    x_trans = jnp.concatenate([x_trans, X[:, :, 2:]], axis=2)
    return cam[:, :, 0:1] * x_trans
