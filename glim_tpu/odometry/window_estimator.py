"""Device-side sliding-window LiDAR-IMU estimator core.

This is the TPU replacement for the reference's fixed-lag smoother loop
(reference: src/glim/odometry/odometry_estimation_imu.cpp:35-457 — iSAM2
incremental factorization over X/V/B states with IMU + matching-cost
factors). Incremental sparse factorization is hostile to XLA (SURVEY.md §7
hard part 1); instead the recent W states live in a device ring buffer and
every scan triggers a small batch Gauss-Newton over the full window:

  states:   T (W,4,4), v (W,3), b (W,6)          — 15 dof per state
  factors:  VGICP of each window frame vs the keyframe voxel map (unary),
            IMU preintegration between consecutive states,
            bias random walk between consecutive states,
            marginalization prior on the oldest state (dense 15x15).

The dense (W*15)^2 normal system is trivial MXU work; correspondences are
re-searched once per outer iteration and cached for inner iterations. On
window overflow the oldest state is Schur-marginalized into the prior
(replacing the smoother's marginalization, reference :343-355).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from glim_tpu.ops import gicp, lie, solver
from glim_tpu.ops.imu import PreintegratedImu, bias_corrected, imu_residual
from glim_tpu.ops.voxelmap import GaussianVoxelMap

STATE_DIM = 15  # [pose (6), velocity (3), bias (6)]


@jax.tree_util.register_dataclass
@dataclass
class WindowState:
    """Ring buffer of the W most recent states + marginalization prior."""

    T: jnp.ndarray        # (W, 4, 4) T_world_imu
    v: jnp.ndarray        # (W, 3)
    b: jnp.ndarray        # (W, 6) [ba, bg]
    stamp: jnp.ndarray    # (W,)
    valid: jnp.ndarray    # (W,) bool
    # Dense prior on state 0 (the window's oldest): H0 (15,15), anchored at
    # (T0_anch, v0_anch, b0_anch) with residual offset b0.
    H_prior: jnp.ndarray      # (15, 15)
    b_prior: jnp.ndarray      # (15,)
    T_anchor: jnp.ndarray     # (4, 4)
    v_anchor: jnp.ndarray     # (3,)
    b_anchor: jnp.ndarray     # (6,)


def empty_window(W: int) -> WindowState:
    return WindowState(
        T=jnp.tile(jnp.eye(4), (W, 1, 1)),
        v=jnp.zeros((W, 3)),
        b=jnp.zeros((W, 6)),
        stamp=jnp.zeros(W),
        valid=jnp.zeros(W, bool),
        H_prior=jnp.zeros((STATE_DIM, STATE_DIM)),
        b_prior=jnp.zeros(STATE_DIM),
        T_anchor=jnp.eye(4),
        v_anchor=jnp.zeros(3),
        b_anchor=jnp.zeros(6),
    )


def _state_residual(T, v, b, T_anchor, v_anchor, b_anchor):
    """15-dim local-coordinate offset of (T, v, b) from the anchor."""
    r_T = lie.se3_log(lie.se3_inv(T_anchor) @ T)
    return jnp.concatenate([r_T, v - v_anchor, b - b_anchor])


def _prior_system(win: WindowState):
    """Linearize the marginalization prior at the current state 0."""
    def res(xi):
        T = win.T[0] @ lie.se3_exp(xi[:6])
        return _state_residual(T, win.v[0] + xi[6:9], win.b[0] + xi[9:15],
                               win.T_anchor, win.v_anchor, win.b_anchor)

    zero = jnp.zeros(STATE_DIM)
    r = res(zero)
    J = jax.jacfwd(res)(zero)
    H = J.T @ win.H_prior @ J
    b = J.T @ (win.H_prior @ r + win.b_prior)
    err = r @ win.H_prior @ r + 2.0 * win.b_prior @ r
    return H, b, err


def _imu_factor_system(T_i, v_i, T_j, v_j, b_i, pre: PreintegratedImu,
                       gravity, bias_rw_info):
    """Linearized IMU factor between states i and j + bias random walk.

    Returns the (30, 30) H block over [state_i, state_j] and (30,) b.
    Whitening uses the inverse preintegration covariance (diagonal-regularized
    Cholesky solve).
    """
    def res(xi):
        xi_i, xi_j = xi[:STATE_DIM], xi[STATE_DIM:]
        Ti = T_i @ lie.se3_exp(xi_i[:6])
        Tj = T_j @ lie.se3_exp(xi_j[:6])
        vi = v_i + xi_i[6:9]
        vj = v_j + xi_j[6:9]
        bi = b_i + xi_i[9:15]
        return imu_residual(Ti[:3, :3], Ti[:3, 3], vi, Tj[:3, :3], Tj[:3, 3],
                            vj, bi, pre, gravity)

    zero = jnp.zeros(2 * STATE_DIM)
    r = res(zero)
    J = jax.jacfwd(res)(zero)
    # Information = inv(cov); solve instead of explicit inverse.
    cov = pre.cov + jnp.eye(9) * 1e-8
    info_r = jnp.linalg.solve(cov, r)
    info_J = jnp.linalg.solve(cov, J)
    H = J.T @ info_J
    b = J.T @ info_r
    err = r @ info_r
    return H, b, err


def _bias_rw_system(b_i, b_j, dt, bias_rw_info):
    """Bias random walk between consecutive states (BetweenFactor on bias)."""
    r = b_j - b_i
    info = bias_rw_info / jnp.maximum(dt, 1e-3)
    H_ii = jnp.diag(info)
    b_i_out = -info * r
    b_j_out = info * r
    err = jnp.sum(info * r * r)
    return H_ii, b_i_out, b_j_out, err


@partial(jax.jit, static_argnames=("W", "outer_iters", "inner_iters"))
def window_optimize(win: WindowState, preints: PreintegratedImu,
                    frame_pts, frame_covs, frame_mask,
                    vms, T_lidar_imu,
                    gravity, bias_rw_info, matching_weight,
                    *, W: int, outer_iters: int = 2, inner_iters: int = 2):
    """Batch GN over the window.

    preints: stacked PreintegratedImu with leading dim (W-1,) — entry k
    connects state k to k+1 (invalid entries have dt=0 and are ignored).
    frame_*: (W, C, ...) per-state deskewed scans in their LIDAR frame.
    vms: TUPLE of keyframe model voxel maps, one per resolution level
         (multi-resolution matching widens the convergence basin — reference
         odometry_estimation_gpu.cpp:97-106); systems from all levels are
         summed.
    T_lidar_imu: extrinsics (p_lidar = T_lidar_imu p_imu).
    """
    if isinstance(vms, GaussianVoxelMap):
        vms = (vms,)
    D = W * STATE_DIM
    T_imu_lidar = lie.se3_inv(T_lidar_imu)

    def unpack(x):
        return x.reshape(W, STATE_DIM)

    def retract(state, delta):
        d = unpack(delta)
        T = state[0] @ lie.se3_exp(d[:, :6])
        v = state[1] + d[:, 6:9]
        b = state[2] + d[:, 9:15]
        return (T, v, b)

    def linearize(state, corr):
        T, v, b = state
        H = jnp.zeros((D, D))
        g = jnp.zeros(D)
        err = jnp.zeros(())

        # Prior on state 0.
        win_cur = WindowState(T=T, v=v, b=b, stamp=win.stamp, valid=win.valid,
                              H_prior=win.H_prior, b_prior=win.b_prior,
                              T_anchor=win.T_anchor, v_anchor=win.v_anchor,
                              b_anchor=win.b_anchor)
        Hp, bp, ep = _prior_system(win_cur)
        H = H.at[:STATE_DIM, :STATE_DIM].add(Hp)
        g = g.at[:STATE_DIM].add(bp)
        err = err + ep

        # IMU + bias factors between consecutive states.
        for k in range(W - 1):
            pre_k = jax.tree_util.tree_map(lambda x: x[k], preints)
            ok = win.valid[k] & win.valid[k + 1] & (pre_k.dt > 1e-6)
            w_k = ok.astype(jnp.float32)
            Hk, bk, ek = _imu_factor_system(T[k], v[k], T[k + 1], v[k + 1],
                                            b[k], pre_k, gravity, bias_rw_info)
            s = k * STATE_DIM
            H = jax.lax.dynamic_update_slice(
                H, jax.lax.dynamic_slice(H, (s, s), (30, 30)) + w_k * Hk, (s, s))
            g = jax.lax.dynamic_update_slice(
                g, jax.lax.dynamic_slice(g, (s,), (30,)) + w_k * bk, (s,))
            err = err + w_k * ek

            Hb, bbi, bbj, eb = _bias_rw_system(b[k], b[k + 1],
                                               pre_k.dt, bias_rw_info)
            bi = s + 9
            bj = s + STATE_DIM + 9
            H = H.at[bi:bi + 6, bi:bi + 6].add(w_k * Hb)
            H = H.at[bj:bj + 6, bj:bj + 6].add(w_k * Hb)
            H = H.at[bi:bi + 6, bj:bj + 6].add(-w_k * Hb)
            H = H.at[bj:bj + 6, bi:bi + 6].add(-w_k * Hb)
            g = g.at[bi:bi + 6].add(w_k * bbi)
            g = g.at[bj:bj + 6].add(w_k * bbj)
            err = err + w_k * eb

        # Matching-cost factors: each window frame vs each resolution level
        # of the keyframe map (cached correspondences; poses here are
        # T_world_imu, points in the lidar frame -> T_world_lidar =
        # T_world_imu @ T_imu_lidar).
        Ad = lie.se3_adjoint(lie.se3_inv(T_imu_lidar))
        for k in range(W):
            T_wl = T[k] @ T_imu_lidar
            w_k = win.valid[k].astype(jnp.float32) * matching_weight
            for lvl in range(len(vms)):
                mu_k, Ct_k, hit_k = corr[k][lvl]
                s_sys = gicp.vgicp_linearize_cached(jnp.eye(4), T_wl, frame_pts[k],
                                                    frame_covs[k], mu_k, Ct_k, hit_k)
                # Map the lidar-pose Jacobian to the imu-pose tangent:
                # T_wi exp(xi) T_il = T_wl exp(Ad_{T_il^-1} xi).
                H_ss = Ad.T @ s_sys.H_ss @ Ad
                b_s = Ad.T @ s_sys.b_s
                s = k * STATE_DIM
                H = H.at[s:s + 6, s:s + 6].add(w_k * H_ss)
                g = g.at[s:s + 6].add(w_k * b_s)
                err = err + w_k * s_sys.error
        return H, g, err

    def search(state):
        T, v, b = state
        out = []
        for k in range(W):
            T_wl = T[k] @ T_imu_lidar
            out.append([gicp.vgicp_lookup(jnp.eye(4), T_wl, frame_pts[k],
                                          frame_mask[k], vm) for vm in vms])
        return out

    state = (win.T, win.v, win.b)
    err_last = jnp.zeros(())
    for _ in range(outer_iters):
        corr = search(state)
        for _ in range(inner_iters):
            H, g, err_last = linearize(state, corr)
            delta = solver.solve_damped(H, g, jnp.float32(1e-4))
            state = retract(state, delta)

    T, v, b = state
    H, g, err_last = linearize(state, search(state))
    new_win = WindowState(T=T, v=v, b=b, stamp=win.stamp, valid=win.valid,
                          H_prior=win.H_prior, b_prior=win.b_prior,
                          T_anchor=win.T_anchor, v_anchor=win.v_anchor,
                          b_anchor=win.b_anchor)
    return new_win, H, err_last


@partial(jax.jit, static_argnames=("W",))
def window_marginalize(win: WindowState, H: jnp.ndarray, *, W: int) -> WindowState:
    """Shift the ring buffer left, folding state 0 into the prior.

    H is the converged window Hessian; the Schur complement onto state 1
    becomes the new prior, anchored at state 1's current estimate
    (reference analogue: fixed-lag marginalization,
    odometry_estimation_imu.cpp:343-355).
    """
    D = W * STATE_DIM
    # Reorder: [state1 | state0] then marginalize the trailing block.
    keep = jnp.concatenate([jnp.arange(STATE_DIM, 2 * STATE_DIM),
                            jnp.arange(0, STATE_DIM)])
    H2 = H[jnp.ix_(keep, keep)]
    Hr, _ = solver.schur_marginalize(H2, jnp.zeros(2 * STATE_DIM), STATE_DIM)

    roll = lambda a: jnp.roll(a, -1, axis=0)
    return WindowState(
        T=roll(win.T), v=roll(win.v), b=roll(win.b), stamp=roll(win.stamp),
        valid=roll(win.valid).at[W - 1].set(False),
        H_prior=Hr, b_prior=jnp.zeros(STATE_DIM),
        T_anchor=win.T[1], v_anchor=win.v[1], b_anchor=win.b[1],
    )
