"""SO(3)/SE(3) manifold ops — JAX device variants (f32, batch-friendly).

Device twin of glim_tpu.ops.lie_np, playing the role of gtsam::Rot3/Pose3
Expmap/Logmap/retract inside jitted computations. Twist convention follows
GTSAM: xi = [omega (3), v (3)]. All functions are elementwise-safe (Taylor
blends via jnp.where, no data-dependent control flow) and vmap over leading
batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zero, -wz, wy], axis=-1),
        jnp.stack([wz, zero, -wx], axis=-1),
        jnp.stack([-wy, wx, zero], axis=-1),
    ], axis=-2)


def _sin_over_theta(theta, theta2):
    # sin(theta)/theta with Taylor fallback.
    small = theta2 < _EPS
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe) / safe)


def _one_minus_cos_over_theta2(theta, theta2):
    small = theta2 < _EPS
    safe2 = jnp.where(small, 1.0, theta2)
    return jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)


def _theta_minus_sin_over_theta3(theta, theta2):
    small = theta2 < _EPS
    safe3 = jnp.where(small, 1.0, theta2 * theta)
    return jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / safe3)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3) rotation (Rodrigues)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = skew(w)
    W2 = W @ W
    a = _sin_over_theta(theta, theta2)[..., None, None]
    b = _one_minus_cos_over_theta2(theta, theta2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3). Accurate for theta in [0, pi); near-pi handled
    via the quaternion route.

    Differentiation-safe: every branch's inputs are sanitized before the
    non-smooth primitives (arccos at +-1, norm at 0), so fwd- AND rev-mode
    derivatives stay finite at the identity and near pi — factor
    linearization runs jacfwd through this function (ops/factors.py).
    """
    cos_t = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5,
                     -1.0, 1.0)
    vee = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)

    # Thresholds must be representable in f32: 1 - 1e-8 rounds to 1.0 and the
    # branch would never trigger (leaving arccos'(1) = -inf in the selected
    # path).
    small = cos_t > 1.0 - 1e-6        # theta < ~1.4e-3
    near_pi = cos_t < -1.0 + 1e-5     # theta > ~pi - 4.5e-3
    generic_m = ~small & ~near_pi

    # Generic branch with sanitized input (dummy cos=0 where unselected).
    cos_g = jnp.where(generic_m, cos_t, 0.0)
    theta_g = jnp.arccos(cos_g)
    sin_g = jnp.sqrt(jnp.maximum(1.0 - cos_g * cos_g, 1e-12))
    generic = (theta_g / (2.0 * sin_g))[..., None] * vee

    # Small-angle Taylor, arccos-free: theta^2 ~ 2(1 - cos_t).
    one_m = jnp.maximum(1.0 - cos_t, 0.0)
    taylor = 0.5 * vee * (1.0 + one_m / 3.0)[..., None]

    # Near-pi via the quaternion route with sanitized vector part.
    q = rot_to_quat(R)
    sign = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    qv = q[..., :3] * sign
    qw = q[..., 3:4] * sign
    qv_safe = jnp.where(near_pi[..., None], qv,
                        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], R.dtype), qv.shape))
    vn = jnp.linalg.norm(qv_safe, axis=-1, keepdims=True)
    ang = 2.0 * jnp.arctan2(vn, qw)
    pi_branch = ang * qv_safe / jnp.maximum(vn, 1e-12)

    return jnp.where(near_pi[..., None], pi_branch,
                     jnp.where(small[..., None], taylor, generic))


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = skew(w)
    W2 = W @ W
    b = _one_minus_cos_over_theta2(theta, theta2)[..., None, None]
    c = _theta_minus_sin_over_theta3(theta, theta2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b * W + c * W2


def so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = skew(w)
    W2 = W @ W
    small = theta2 < _EPS
    half = 0.5 * theta
    safe2 = jnp.where(small, 1.0, theta2)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(jnp.abs(jnp.sin(half)) < _EPS, 1.0, jnp.sin(half))) / safe2,
    )[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term * W2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) twist [omega, v] -> (..., 4, 4)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(w), v)
    return make_se3(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    w = so3_log(T[..., :3, :3])
    v = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inv(w), T[..., :3, 3])
    return jnp.concatenate([w, v], axis=-1)


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_inv(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_mul(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 (4,4) [or batched] to points (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def se3_retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Right-multiplicative retraction T * exp(xi) (GTSAM convention)."""
    return T @ se3_exp(xi)


def se3_interpolate(T0: jnp.ndarray, T1: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    d = se3_log(se3_inv(T0) @ T1)
    return T0 @ se3_exp(a[..., None] * d if jnp.ndim(a) else a * d)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) quaternion [x y z w]; branch-free Shepperd via
    the four candidate formulations, selecting the numerically largest pivot."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Candidate w-major
    sw = safe_sqrt(1.0 + tr) * 2.0
    q_w = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, 0.25 * sw], axis=-1)
    # Candidate x-major
    sx = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q_x = jnp.stack([0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], axis=-1)
    # Candidate y-major
    sy = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q_y = jnp.stack([(m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy, (m02 - m20) / sy], axis=-1)
    # Candidate z-major
    sz = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q_z = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz, (m10 - m01) / sz], axis=-1)

    cond_w = tr > 0.0
    cond_x = (m00 > m11) & (m00 > m22)
    cond_y = m11 > m22
    q = jnp.where(cond_w[..., None], q_w,
                  jnp.where(cond_x[..., None], q_x,
                            jnp.where(cond_y[..., None], q_y, q_z)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x y z w] -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation of quaternions [x y z w]; a in [0, 1]."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-6
    a = a[..., None] if jnp.ndim(a) == jnp.ndim(q0) - 1 else a
    w0 = jnp.where(small, 1.0 - a, jnp.sin((1.0 - a) * theta) / jnp.where(small, 1.0, sin_t))
    w1 = jnp.where(small, a, jnp.sin(a * theta) / jnp.where(small, 1.0, sin_t))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def se3_adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6, 6) adjoint for twist [omega, v]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    batch = T.shape[:-2]
    Ad = jnp.zeros(batch + (6, 6), dtype=T.dtype)
    Ad = Ad.at[..., :3, :3].set(R)
    Ad = Ad.at[..., 3:, 3:].set(R)
    Ad = Ad.at[..., 3:, :3].set(skew(t) @ R)
    return Ad
