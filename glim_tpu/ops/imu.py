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
def preintegrate_sequential(acc: jnp.ndarray, gyro: jnp.ndarray,
                            dts: jnp.ndarray, mask: jnp.ndarray,
                            bias: jnp.ndarray, acc_noise: jnp.ndarray,
                            gyro_noise: jnp.ndarray,
                            int_noise: jnp.ndarray) -> PreintegratedImu:
    """Reference lax.scan implementation of ``preintegrate`` (kept as the
    numerical ground truth for the associative version and for docs — a
    256-iteration sequential scan costs ~2.5 ms on TPU vs ~0.3 ms for the
    log-depth form).

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


@jax.jit
def preintegrate(acc: jnp.ndarray, gyro: jnp.ndarray, dts: jnp.ndarray,
                 mask: jnp.ndarray, bias: jnp.ndarray,
                 acc_noise: jnp.ndarray, gyro_noise: jnp.ndarray,
                 int_noise: jnp.ndarray) -> PreintegratedImu:
    """Log-depth preintegration (same model as ``preintegrate_sequential``).

    A sequential 256-step lax.scan is latency-bound on TPU (~2.5 ms of tiny
    3x3 ops); every recurrence here is reformulated as an associative form
    executed in log2(N) batched levels:

      * dR chain: prefix products of the per-sample rotation increments
        (matrix multiplication is associative),
      * dv, dp, H_va, H_pa: plain (masked) sums / one cumsum, once the
        "rotation before sample k" prefix is available,
      * H_Rg: affine recurrence H' = A H + B -> associative composition of
        (A, B) pairs,
      * H_vg, H_pg: sums over the H_Rg / H_vg prefixes,
      * covariance: cov' = A cov A^T + Q -> associative composition of
        (A, Q) pairs, reduced pairwise since only the final value is needed.
    """
    ba, bg = bias[:3], bias[3:]
    sig_a2 = acc_noise * acc_noise
    sig_g2 = gyro_noise * gyro_noise
    sig_i2 = int_noise * int_noise
    N = acc.shape[0]
    eye = jnp.eye(3)

    dt = jnp.where(mask, dts, 0.0)                       # (N,)
    a = acc - ba                                         # (N, 3)
    w = gyro - bg
    wdt = w * dt[:, None]
    R_inc = jax.vmap(so3_exp)(wdt)                       # (N, 3, 3); I when dt=0
    Jr = jax.vmap(_right_jacobian)(wdt)

    # Prefix rotation products: P[k] = R_inc_0 @ ... @ R_inc_k.
    P = jax.lax.associative_scan(jnp.matmul, R_inc)
    # Rotation BEFORE sample k (identity for k=0).
    R_before = jnp.concatenate([eye[None], P[:-1]], axis=0)

    Ra = jnp.einsum("nij,nj->ni", R_before, a)           # (N, 3)
    dv_inc = Ra * dt[:, None]
    dv_before = jnp.concatenate(
        [jnp.zeros((1, 3)), jnp.cumsum(dv_inc, axis=0)[:-1]], axis=0)
    dp_inc = dv_before * dt[:, None] + 0.5 * Ra * (dt * dt)[:, None]

    dR = P[-1]
    dv = jnp.sum(dv_inc, axis=0)
    dp = jnp.sum(dp_inc, axis=0)
    dt_sum = jnp.sum(dt)

    # H_Rg: H' = R_inc^T H - Jr dt  ->  affine (A, B) composition.
    A_aff = jnp.swapaxes(R_inc, -1, -2)
    B_aff = -Jr * dt[:, None, None]

    def aff_combine(x, y):
        A1, B1 = x
        A2, B2 = y
        return A2 @ A1, jnp.einsum("nij,njk->nik", A2, B1) + B2

    A_pre, B_pre = jax.lax.associative_scan(aff_combine, (A_aff, B_aff))
    H_Rg = B_pre[-1]
    H_Rg_before = jnp.concatenate([jnp.zeros((1, 3, 3)), B_pre[:-1]], axis=0)

    # H_va / H_vg and their prefix-dependent position terms.
    A_sk = jnp.einsum("nij,njk->nik", R_before, jax.vmap(skew)(a))
    Hva_inc = -R_before * dt[:, None, None]
    Hvg_inc = -jnp.einsum("nij,njk->nik", A_sk, H_Rg_before) * dt[:, None, None]
    H_va = jnp.sum(Hva_inc, axis=0)
    H_vg = jnp.sum(Hvg_inc, axis=0)
    Hva_before = jnp.concatenate(
        [jnp.zeros((1, 3, 3)), jnp.cumsum(Hva_inc, axis=0)[:-1]], axis=0)
    Hvg_before = jnp.concatenate(
        [jnp.zeros((1, 3, 3)), jnp.cumsum(Hvg_inc, axis=0)[:-1]], axis=0)
    H_pa = jnp.sum(Hva_before * dt[:, None, None]
                   - 0.5 * R_before * (dt * dt)[:, None, None], axis=0)
    H_pg = jnp.sum(Hvg_before * dt[:, None, None]
                   - 0.5 * jnp.einsum("nij,njk->nik", A_sk, H_Rg_before)
                   * (dt * dt)[:, None, None], axis=0)

    # Covariance: cov' = A cov A^T + Q, composed pairwise (final value only).
    # A matches preintegrate_sequential's per-step transition, state order
    # (theta, v, p); A_sk = R_before @ skew(a) uses the rotation BEFORE the
    # sample, exactly as the sequential carry holds it.
    Z = jnp.zeros((N, 3, 3))
    eyeN = jnp.broadcast_to(eye, (N, 3, 3))
    RincT = jnp.swapaxes(R_inc, -1, -2)
    row0 = jnp.concatenate([RincT, Z, Z], axis=2)
    row1 = jnp.concatenate([-A_sk * dt[:, None, None], eyeN, Z], axis=2)
    row2 = jnp.concatenate([-0.5 * A_sk * (dt * dt)[:, None, None],
                            eyeN * dt[:, None, None], eyeN], axis=2)
    A_cov = jnp.concatenate([row0, row1, row2], axis=1)
    JrT = Jr * dt[:, None, None]
    Q = jnp.zeros((N, 9, 9))
    Q = Q.at[:, :3, :3].set(
        jnp.einsum("nij,nkj->nik", JrT, JrT)
        * (sig_g2 / jnp.maximum(dt, 1e-12))[:, None, None])
    Q = Q.at[:, 3:6, 3:6].set(eyeN * (sig_a2 * dt)[:, None, None])
    Q = Q.at[:, 6:9, 6:9].set(eyeN * (sig_i2 * dt)[:, None, None])

    def cov_combine(x, y):
        A1, Q1 = x
        A2, Q2 = y
        return (A2 @ A1,
                jnp.einsum("nij,njk,nlk->nil", A2, Q1, A2) + Q2)

    As, Qs = A_cov, Q
    while As.shape[0] > 1:
        n2 = As.shape[0] // 2
        pair = cov_combine((As[0:2 * n2:2], Qs[0:2 * n2:2]),
                           (As[1:2 * n2:2], Qs[1:2 * n2:2]))
        if As.shape[0] % 2:
            As = jnp.concatenate([pair[0], As[-1:]], axis=0)
            Qs = jnp.concatenate([pair[1], Qs[-1:]], axis=0)
        else:
            As, Qs = pair
    cov = Qs[0]

    return PreintegratedImu(dR=dR, dv=dv, dp=dp, dt=dt_sum, H_Rg=H_Rg,
                            H_va=H_va, H_vg=H_vg, H_pa=H_pa, H_pg=H_pg,
                            cov=cov, bias=bias)


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

    Log-depth formulation (a 256-step sequential lax.scan of tiny 3x3 ops is
    latency-bound on TPU): rotations are prefix products via an associative
    scan, then velocity/position fall out as cumulative sums because the
    world-frame acceleration of each sample depends only on the (now known)
    rotation before it.
    """
    ba, bg = bias[:3], bias[3:]
    dt = jnp.where(mask, dts, 0.0)

    R_inc = jax.vmap(so3_exp)((gyro - bg) * dt[:, None])   # I when dt=0
    P = jax.lax.associative_scan(jnp.matmul, R_inc)        # prefix products
    Rs = jnp.einsum("ij,njk->nik", R0, P)                  # after each sample
    R_before = jnp.concatenate([R0[None], Rs[:-1]], axis=0)

    a_w = jnp.einsum("nij,nj->ni", R_before, acc - ba) + gravity
    dv_inc = a_w * dt[:, None]
    vs = v0 + jnp.cumsum(dv_inc, axis=0)
    v_before = jnp.concatenate([v0[None], vs[:-1]], axis=0)
    dp_inc = v_before * dt[:, None] + 0.5 * a_w * (dt * dt)[:, None]
    ps = p0 + jnp.cumsum(dp_inc, axis=0)
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
