"""IMU preintegration, NavState prediction, and IMU-rate pose integration.

Equivalent surface to gtsam::PreintegratedImuMeasurements +
gtsam::NavState::predict as used by the reference's ``IMUIntegration``
(reference: src/glim/common/imu_integration.cpp:38-189) — re-derived for TPU:
one ``lax.scan`` over a padded (N, 7) sample window, carrying

  (deltaR, dv, dp, dt, bias Jacobians, 9x9 preintegration covariance)

with the standard discrete on-manifold propagation (Forster et al. RSS'15
model, which is also GTSAM's). Bias layout follows the repo convention
``[ba (3), bg (3)]`` (accelerometer first). State order for the covariance is
(theta, v, p).

Everything is f32 and mask-aware: padded samples carry dt=0 and contribute
nothing, so a fixed window capacity serves all scans.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from glim_tpu.ops.lie import skew, so3_exp, so3_log, so3_left_jacobian


def _right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) right Jacobian: Jr(w) = Jl(-w)."""
    return so3_left_jacobian(-w)


@jax.tree_util.register_dataclass
@dataclass
class PreintegratedImu:
    """Preintegrated IMU measurements between two stamps."""

    dR: jnp.ndarray     # (3, 3) rotation delta in the i-frame
    dv: jnp.ndarray     # (3,) velocity delta
    dp: jnp.ndarray     # (3,) position delta
    dt: jnp.ndarray     # () total integration time
    H_Rg: jnp.ndarray   # (3, 3) d(dR)/d(bg)
    H_va: jnp.ndarray   # (3, 3) d(dv)/d(ba)
    H_vg: jnp.ndarray   # (3, 3) d(dv)/d(bg)
    H_pa: jnp.ndarray   # (3, 3) d(dp)/d(ba)
    H_pg: jnp.ndarray   # (3, 3) d(dp)/d(bg)
    cov: jnp.ndarray    # (9, 9) preintegration covariance, order (theta, v, p)
    bias: jnp.ndarray   # (6,) [ba, bg] used during integration


def _empty_preint(bias: jnp.ndarray) -> PreintegratedImu:
    return PreintegratedImu(
        dR=jnp.eye(3), dv=jnp.zeros(3), dp=jnp.zeros(3), dt=jnp.zeros(()),
        H_Rg=jnp.zeros((3, 3)), H_va=jnp.zeros((3, 3)), H_vg=jnp.zeros((3, 3)),
        H_pa=jnp.zeros((3, 3)), H_pg=jnp.zeros((3, 3)),
        cov=jnp.zeros((9, 9)), bias=bias,
    )


@jax.jit
def preintegrate(acc: jnp.ndarray, gyro: jnp.ndarray, dts: jnp.ndarray,
                 mask: jnp.ndarray, bias: jnp.ndarray,
                 acc_noise: jnp.ndarray, gyro_noise: jnp.ndarray,
                 int_noise: jnp.ndarray) -> PreintegratedImu:
    """Integrate a padded window of IMU samples.

    Args:
      acc, gyro: (N, 3) measured specific force / angular rate
      dts:       (N,) per-sample integration intervals (0 for padding)
      mask:      (N,) validity
      bias:      (6,) [ba, bg] linearization-point bias
      *_noise:   continuous-time noise densities (scalars)
    """
    ba, bg = bias[:3], bias[3:]
    sig_a2 = acc_noise * acc_noise
    sig_g2 = gyro_noise * gyro_noise
    sig_i2 = int_noise * int_noise

    def step(carry, inp):
        (R, dv, dp, dt_sum, H_Rg, H_va, H_vg, H_pa, H_pg, cov) = carry
        a_m, w_m, dt, valid = inp
        dt = jnp.where(valid, dt, 0.0)
        a = a_m - ba
        w = w_m - bg
        wdt = w * dt
        R_inc = so3_exp(wdt)
        Jr = _right_jacobian(wdt)
        Ra = R @ a
        A_sk = R @ skew(a)

        dp_n = dp + dv * dt + 0.5 * Ra * dt * dt
        dv_n = dv + Ra * dt
        R_n = R @ R_inc

        H_pa_n = H_pa + H_va * dt - 0.5 * R * dt * dt
        H_pg_n = H_pg + H_vg * dt - 0.5 * A_sk @ H_Rg * dt * dt
        H_va_n = H_va - R * dt
        H_vg_n = H_vg - A_sk @ H_Rg * dt
        H_Rg_n = R_inc.T @ H_Rg - Jr * dt

        # Covariance propagation, state order (theta, v, p).
        Z = jnp.zeros((3, 3))
        eye = jnp.eye(3)
        A = jnp.block([
            [R_inc.T, Z, Z],
            [-A_sk * dt, eye, Z],
            [-0.5 * A_sk * dt * dt, eye * dt, eye],
        ])
        cov_n = A @ cov @ A.T
        JrT = Jr * dt
        cov_n = cov_n.at[:3, :3].add(JrT @ JrT.T * sig_g2 / jnp.maximum(dt, 1e-12))
        cov_n = cov_n.at[3:6, 3:6].add(eye * (sig_a2 * dt))
        cov_n = cov_n.at[6:9, 6:9].add(eye * (sig_i2 * dt))

        new = (R_n, dv_n, dp_n, dt_sum + dt, H_Rg_n, H_va_n, H_vg_n, H_pa_n, H_pg_n, cov_n)
        # Masked samples leave the carry untouched.
        out = jax.tree_util.tree_map(lambda n, o: jnp.where(valid, n, o), new, carry)
        return out, None

    init = (jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(()),
            jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.zeros((3, 3)),
            jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.zeros((9, 9)))
    (R, dv, dp, dt_sum, H_Rg, H_va, H_vg, H_pa, H_pg, cov), _ = jax.lax.scan(
        step, init, (acc, gyro, dts, mask))
    return PreintegratedImu(dR=R, dv=dv, dp=dp, dt=dt_sum, H_Rg=H_Rg, H_va=H_va,
                            H_vg=H_vg, H_pa=H_pa, H_pg=H_pg, cov=cov, bias=bias)


def bias_corrected(pre: PreintegratedImu, bias: jnp.ndarray):
    """First-order bias correction of the deltas to a new bias estimate."""
    db = bias - pre.bias
    dba, dbg = db[:3], db[3:]
    dR = pre.dR @ so3_exp(pre.H_Rg @ dbg)
    dv = pre.dv + pre.H_va @ dba + pre.H_vg @ dbg
    dp = pre.dp + pre.H_pa @ dba + pre.H_pg @ dbg
    return dR, dv, dp


@jax.jit
def predict(R_i: jnp.ndarray, p_i: jnp.ndarray, v_i: jnp.ndarray,
            pre: PreintegratedImu, bias: jnp.ndarray,
            gravity: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NavState prediction: world pose/velocity at the window's end."""
    dR, dv, dp = bias_corrected(pre, bias)
    dt = pre.dt
    R_j = R_i @ dR
    v_j = v_i + gravity * dt + R_i @ dv
    p_j = p_i + v_i * dt + 0.5 * gravity * dt * dt + R_i @ dp
    return R_j, p_j, v_j


@jax.jit
def imu_residual(R_i, p_i, v_i, R_j, p_j, v_j, bias: jnp.ndarray,
                 pre: PreintegratedImu, gravity: jnp.ndarray) -> jnp.ndarray:
    """9-dim IMU factor residual, order (theta, v, p) — gtsam::ImuFactor
    equivalent error (whitening is the solver's job via pre.cov)."""
    dR, dv, dp = bias_corrected(pre, bias)
    dt = pre.dt
    r_R = so3_log(dR.T @ (R_i.T @ R_j))
    r_v = R_i.T @ (v_j - v_i - gravity * dt) - dv
    r_p = R_i.T @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dp
    return jnp.concatenate([r_R, r_v, r_p])


@jax.jit
def integrate_poses(R0: jnp.ndarray, p0: jnp.ndarray, v0: jnp.ndarray,
                    bias: jnp.ndarray, gravity: jnp.ndarray,
                    acc: jnp.ndarray, gyro: jnp.ndarray, dts: jnp.ndarray,
                    mask: jnp.ndarray):
    """IMU-rate dead reckoning: world-frame pose at every sample.

    Plays the role of the reference's pose-prediction integration used for
    deskewing (common/imu_integration.cpp 'integrate_imu' pose variant).
    Returns (R (N, 3, 3), p (N, 3), v (N, 3)) — the state AFTER each sample.
    """
    ba, bg = bias[:3], bias[3:]

    def step(carry, inp):
        R, p, v = carry
        a_m, w_m, dt, valid = inp
        dt = jnp.where(valid, dt, 0.0)
        a_w = R @ (a_m - ba) + gravity
        p_n = p + v * dt + 0.5 * a_w * dt * dt
        v_n = v + a_w * dt
        R_n = R @ so3_exp((w_m - bg) * dt)
        return (R_n, p_n, v_n), (R_n, p_n, v_n)

    _, (Rs, ps, vs) = jax.lax.scan(step, (R0, p0, v0), (acc, gyro, dts, mask))
    return Rs, ps, vs


@jax.jit
def smooth_pose_chain(Rs, ps, mask, sigmas, T_end):
    """Doubly-anchored IMU pose-chain smoothing (closed form).

    TPU replacement for the reference's per-frame mini pose-graph LM
    (reference: src/glim/mapping/sub_mapping.cpp:117-162): a chain of
    IMU-integrated poses with near-hard priors at both scan poses (sigma
    1e-5) and Between factors from the IMU deltas (sigma_i = dt_i + 1e-2).
    Because the graph is a simple chain whose only external pulls are the
    two endpoint anchors, its linearized MAP solution is available in
    closed form: the start is pinned by construction (the chain integrates
    from the first scan's state) and the end-pose mismatch
    xi = log(P_N^-1 T_end) is distributed along the chain proportionally
    to the accumulated Between variance:

        S_i = P_i * exp(alpha_i * xi),   alpha_i = sum_{j<=i} sigma_j^2
                                                   / sum_j sigma_j^2.

    Args: Rs (N,3,3), ps (N,3) integrated poses; mask (N,) valid lanes;
    sigmas (N,) per-step Between sigma (entry 0 ignored); T_end (4,4) the
    next scan's pose anchoring the chain end. Returns (Rs', ps')."""
    from glim_tpu.ops import lie

    n = jnp.maximum(jnp.sum(mask), 1)
    var = jnp.where(mask, sigmas * sigmas, 0.0)
    var = var.at[0].set(0.0)
    cum = jnp.cumsum(var)
    total = jnp.maximum(cum[n - 1], 1e-12)
    alpha = jnp.clip(cum / total, 0.0, 1.0)

    idx_end = n - 1
    P_end = jnp.eye(4).at[:3, :3].set(Rs[idx_end]).at[:3, 3].set(ps[idx_end])
    xi = lie.se3_log(lie.se3_inv(P_end) @ T_end)

    def fix(R, p, a):
        T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(p)
        T2 = T @ lie.se3_exp(a * xi)
        return T2[:3, :3], T2[:3, 3]

    Rs2, ps2 = jax.vmap(fix)(Rs, ps, alpha)
    return (jnp.where(mask[:, None, None], Rs2, Rs),
            jnp.where(mask[:, None], ps2, ps))
