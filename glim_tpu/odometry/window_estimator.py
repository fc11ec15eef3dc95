"""Device-side sliding-window LiDAR-IMU estimator core.

This is the TPU replacement for the reference's fixed-lag smoother loop
(reference: src/glim/odometry/odometry_estimation_imu.cpp:35-457 — iSAM2
incremental factorization over X/V/B states with IMU + matching-cost
factors). Incremental sparse factorization is hostile to XLA (SURVEY.md §7
hard part 1); instead the ENTIRE per-scan step is ONE fused device program
over a ring-buffer state:

  preintegrate IMU -> predict -> IMU-rate deskew -> covariances ->
  marginalize the oldest state (Schur prior) -> insert the new state ->
  batch GN over W states (15 dof each) -> keyframe-gated model insert

Performance-critical asymmetry: the NEWEST frame matches at full resolution
with correspondences re-searched every outer iteration; OLDER in-window
frames match a 4x-subsampled copy with correspondences refreshed once per
scan — they only stabilize the window, so precision lives in the newest
factor while lookup cost (the dominant term: binary search + stats gathers)
drops ~4x. The host dispatches one step per scan and never blocks; status
(corruption flags, errors, prediction-vs-optimized for IMU validation) comes
back as a small packed vector fetched one scan late, when its transfer has
already completed.

States are right-aligned in the ring: the newest is always slot W-1; slots
fill from the right during warmup and the marginalization prior tracks the
oldest VALID slot.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from glim_tpu.ops import deskew as deskew_ops
from glim_tpu.ops import gicp, lie, solver
from glim_tpu.ops import imu as imu_ops
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.ops.imu import PreintegratedImu

STATE_DIM = 15      # [pose (6), velocity (3), bias (6)]
OLD_SUBSAMPLE = 4   # older frames match every 4th point


@jax.tree_util.register_dataclass
@dataclass
class WindowState:
    """Ring buffer of the W most recent states + frames + marginalization
    prior + the last window Hessian (for the next Schur complement)."""

    T: jnp.ndarray        # (W, 4, 4) T_world_imu
    v: jnp.ndarray        # (W, 3)
    b: jnp.ndarray        # (W, 6) [ba, bg]
    stamp: jnp.ndarray    # (W,)
    valid: jnp.ndarray    # (W,) bool
    # Subsampled frame ring for the older-frame matching factors.
    pts: jnp.ndarray      # (W, Cs, 3) lidar-frame deskewed points
    covs: jnp.ndarray     # (W, Cs, 3, 3)
    mask: jnp.ndarray     # (W, Cs)
    # Preintegration ring: entry k connects state k -> k+1.
    preints: PreintegratedImu   # stacked (W-1, ...)
    # Dense prior on the oldest valid state.
    H_prior: jnp.ndarray      # (15, 15)
    b_prior: jnp.ndarray      # (15,)
    T_anchor: jnp.ndarray     # (4, 4)
    v_anchor: jnp.ndarray     # (3,)
    b_anchor: jnp.ndarray     # (6,)
    # Marginalization system over [state0 | state1] built from ONLY the
    # factors incident to state 0 (prior, IMU 0-1, bias walk 0-1,
    # matching(0)) at the last optimized estimate — Schur-complemented into
    # the new prior at the next insert. Using the full window Hessian here
    # would double-count still-active factors that get re-linearized.
    H_marg: jnp.ndarray       # (30, 30)
    b_marg: jnp.ndarray       # (30,)
    step: jnp.ndarray         # () int32 monotone scan counter (LRU stamps)


def _zero_preints(W: int) -> PreintegratedImu:
    n = W - 1
    return PreintegratedImu(
        dR=jnp.tile(jnp.eye(3), (n, 1, 1)), dv=jnp.zeros((n, 3)),
        dp=jnp.zeros((n, 3)), dt=jnp.zeros(n),
        H_Rg=jnp.zeros((n, 3, 3)), H_va=jnp.zeros((n, 3, 3)),
        H_vg=jnp.zeros((n, 3, 3)), H_pa=jnp.zeros((n, 3, 3)),
        H_pg=jnp.zeros((n, 3, 3)), cov=jnp.zeros((n, 9, 9)),
        bias=jnp.zeros((n, 6)))


def empty_window(W: int, C_sub: int) -> WindowState:
    return WindowState(
        T=jnp.tile(jnp.eye(4), (W, 1, 1)),
        v=jnp.zeros((W, 3)),
        b=jnp.zeros((W, 6)),
        stamp=jnp.zeros(W),
        valid=jnp.zeros(W, bool),
        pts=jnp.zeros((W, C_sub, 3)),
        covs=jnp.zeros((W, C_sub, 3, 3)),
        mask=jnp.zeros((W, C_sub), bool),
        preints=_zero_preints(W),
        H_prior=jnp.zeros((STATE_DIM, STATE_DIM)),
        b_prior=jnp.zeros(STATE_DIM),
        T_anchor=jnp.eye(4),
        v_anchor=jnp.zeros(3),
        b_anchor=jnp.zeros(6),
        H_marg=jnp.zeros((2 * STATE_DIM, 2 * STATE_DIM)),
        b_marg=jnp.zeros(2 * STATE_DIM),
        step=jnp.int32(0),
    )


def _state_residual(T, v, b, T_anchor, v_anchor, b_anchor):
    r_T = lie.se3_log(lie.se3_inv(T_anchor) @ T)
    return jnp.concatenate([r_T, v - v_anchor, b - b_anchor])


def _prior_system(T0, v0, b0, T_anchor, v_anchor, b_anchor, H_prior, b_prior):
    def res(xi):
        T = T0 @ lie.se3_exp(xi[:6])
        return _state_residual(T, v0 + xi[6:9], b0 + xi[9:15],
                               T_anchor, v_anchor, b_anchor)

    zero = jnp.zeros(STATE_DIM)
    r = res(zero)
    J = jax.jacfwd(res)(zero)
    H = J.T @ H_prior @ J
    b = J.T @ (H_prior @ r + b_prior)
    err = r @ H_prior @ r + 2.0 * b_prior @ r
    return H, b, err


def _imu_factor_system(T_i, v_i, T_j, v_j, b_i, pre: PreintegratedImu, gravity):
    def res(xi):
        xi_i, xi_j = xi[:STATE_DIM], xi[STATE_DIM:]
        Ti = T_i @ lie.se3_exp(xi_i[:6])
        Tj = T_j @ lie.se3_exp(xi_j[:6])
        return imu_ops.imu_residual(Ti[:3, :3], Ti[:3, 3], v_i + xi_i[6:9],
                                    Tj[:3, :3], Tj[:3, 3], v_j + xi_j[6:9],
                                    b_i + xi_i[9:15], pre, gravity)

    zero = jnp.zeros(2 * STATE_DIM)
    r = res(zero)
    J = jax.jacfwd(res)(zero)
    cov = pre.cov + jnp.eye(9) * 1e-8
    info_r = jnp.linalg.solve(cov, r)
    info_J = jnp.linalg.solve(cov, J)
    return J.T @ info_J, J.T @ info_r, r @ info_r


@partial(jax.jit, static_argnames=("W", "outer_iters", "inner_iters",
                                   "bootstrap"))
def window_scan_step(win: WindowState, vms,
                     # raw scan (full resolution, lidar frame, NOT deskewed)
                     scan_pts, scan_times, scan_mask, scan_neighbors,
                     # padded IMU window covering (t_prev, t_scan_end];
                     # stamps relative to the scan start (<=0 -> preint)
                     imu_acc, imu_gyro, imu_stamps_rel, imu_dts, imu_mask,
                     scan_stamp, T_lidar_imu, gravity,
                     acc_noise, gyro_noise, int_noise, bias_rw_info,
                     matching_weight, keyframe_max_overlap,
                     *, W: int, outer_iters: int = 2, inner_iters: int = 2,
                     bootstrap: bool = False):
    """One fused odometry step. Returns (win', vms', outputs dict)."""
    from glim_tpu.ops import covariance as cov_ops

    if isinstance(vms, vmx.GaussianVoxelMap):
        vms = (vms,)
    L = len(vms)
    D = W * STATE_DIM
    T_imu_lidar = lie.se3_inv(T_lidar_imu)
    Ad = lie.se3_adjoint(lie.se3_inv(T_imu_lidar))

    k_prev = W - 1
    T_prev = win.T[k_prev]
    v_prev = win.v[k_prev]
    b_prev = win.b[k_prev]

    # --- 1. preintegrate (t_prev, t_scan] and predict ---
    # Samples straddling the scan-start boundary contribute a CLIPPED dt so
    # the preintegration horizon lands exactly on the scan stamp.
    pre_dts = jnp.clip(imu_dts - jnp.maximum(imu_stamps_rel, 0.0), 0.0, None)
    pre_mask = imu_mask & (imu_stamps_rel - imu_dts < -1e-9)
    pre_new = imu_ops.preintegrate(imu_acc, imu_gyro, pre_dts, pre_mask,
                                   b_prev, acc_noise, gyro_noise, int_noise)
    R_j, p_j, v_pred = imu_ops.predict(T_prev[:3, :3], T_prev[:3, 3], v_prev,
                                       pre_new, b_prev, gravity)
    T_pred = jnp.eye(4).at[:3, :3].set(R_j).at[:3, 3].set(p_j)

    # --- 2. IMU-rate deskew of the new scan ---
    Rs, ps, _vs = imu_ops.integrate_poses(T_prev[:3, :3], T_prev[:3, 3], v_prev,
                                          b_prev, gravity, imu_acc, imu_gyro,
                                          imu_dts, imu_mask)
    # Padding lanes must sort AFTER the real stamps or deskew's binary
    # search lands in the zero-padded tail and assigns scan-end poses to
    # mid-scan points.
    stamps_sorted = jnp.where(imu_mask, imu_stamps_rel, jnp.inf)
    stamps_t, quats_t, trans_t = deskew_ops.imu_pose_table(stamps_sorted, Rs, ps)
    # Guard: with <2 valid samples the pose table is degenerate -> skip deskew.
    enough_imu = jnp.sum(imu_mask) >= 2
    deskewed = jnp.where(enough_imu,
                         deskew_ops.deskew_imu(scan_pts, scan_times, scan_mask,
                                               stamps_t, quats_t, trans_t,
                                               T_lidar_imu),
                         scan_pts)
    covs_new, normals_new = cov_ops.estimate_covariances(
        deskewed, scan_mask, scan_neighbors, "plane")

    # --- 3. marginalize the oldest state (if the ring is full) + roll ---
    was_full = win.valid[0]
    marg_T_wi = win.T[0]
    marg_T_wl = marg_T_wi @ T_imu_lidar
    marg_v = win.v[0]
    marg_b = win.b[0]
    marg_stamp = win.stamp[0]

    # Schur prior from the stored state-0-incident system: reorder
    # [state1 | state0], marginalize the trailing 15 dof (with gradient).
    keep = jnp.concatenate([jnp.arange(STATE_DIM, 2 * STATE_DIM),
                            jnp.arange(0, STATE_DIM)])
    H2 = win.H_marg[jnp.ix_(keep, keep)]
    b2 = win.b_marg[keep]
    H_schur, b_schur = solver.schur_marginalize(H2, b2, STATE_DIM)
    H_prior_n = jnp.where(was_full, H_schur, win.H_prior)
    b_prior_n = jnp.where(was_full, b_schur, win.b_prior)
    T_anchor_n = jnp.where(was_full, win.T[1], win.T_anchor)
    v_anchor_n = jnp.where(was_full, win.v[1], win.v_anchor)
    b_anchor_n = jnp.where(was_full, win.b[1], win.b_anchor)

    roll = lambda a: jnp.roll(a, -1, axis=0)
    sub_pts = deskewed[::OLD_SUBSAMPLE]
    sub_covs = covs_new[::OLD_SUBSAMPLE]
    sub_mask = scan_mask[::OLD_SUBSAMPLE]

    T_r = roll(win.T).at[W - 1].set(T_pred)
    v_r = roll(win.v).at[W - 1].set(v_pred)
    b_r = roll(win.b).at[W - 1].set(b_prev)
    stamp_r = roll(win.stamp).at[W - 1].set(scan_stamp)
    valid_r = roll(win.valid).at[W - 1].set(True)
    pts_r = roll(win.pts).at[W - 1].set(sub_pts)
    covs_r = roll(win.covs).at[W - 1].set(sub_covs)
    mask_r = roll(win.mask).at[W - 1].set(sub_mask)
    pre_r = jax.tree_util.tree_map(
        lambda rbuf, new: roll(rbuf).at[W - 2].set(new), win.preints, pre_new)

    prior_idx = jnp.argmax(valid_r)  # oldest valid slot

    # --- 4. batch GN over the window ---
    def linearize(T, v, b, corr_old, corr_new):
        H = jnp.zeros((D, D))
        g = jnp.zeros(D)
        err = jnp.zeros(())

        Hp, bp, ep = _prior_system(T[prior_idx], v[prior_idx], b[prior_idx],
                                   T_anchor_n, v_anchor_n, b_anchor_n,
                                   H_prior_n, b_prior_n)
        s0 = prior_idx * STATE_DIM
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (s0, s0), (15, 15)) + Hp, (s0, s0))
        g = jax.lax.dynamic_update_slice(
            g, jax.lax.dynamic_slice(g, (s0,), (15,)) + bp, (s0,))
        err = err + ep

        for k in range(W - 1):
            pre_k = jax.tree_util.tree_map(lambda x: x[k], pre_r)
            ok = valid_r[k] & valid_r[k + 1] & (pre_k.dt > 1e-6)
            w_k = ok.astype(jnp.float32)
            Hk, bk, ek = _imu_factor_system(T[k], v[k], T[k + 1], v[k + 1],
                                            b[k], pre_k, gravity)
            s = k * STATE_DIM
            H = H.at[s:s + 30, s:s + 30].add(w_k * Hk)
            g = g.at[s:s + 30].add(w_k * bk)
            err = err + w_k * ek

            # Bias random walk.
            r_b = b[k + 1] - b[k]
            info = bias_rw_info / jnp.maximum(pre_k.dt, 1e-3)
            Hb = jnp.diag(info)
            bi = s + 9
            bj = s + STATE_DIM + 9
            H = H.at[bi:bi + 6, bi:bi + 6].add(w_k * Hb)
            H = H.at[bj:bj + 6, bj:bj + 6].add(w_k * Hb)
            H = H.at[bi:bi + 6, bj:bj + 6].add(-w_k * Hb)
            H = H.at[bj:bj + 6, bi:bi + 6].add(-w_k * Hb)
            g = g.at[bi:bi + 6].add(-w_k * info * r_b)
            g = g.at[bj:bj + 6].add(w_k * info * r_b)
            err = err + w_k * jnp.sum(info * r_b * r_b)

        # Matching: older frames (subsampled, refreshed once), newest (full).
        for k in range(W - 1):
            T_wl = T[k] @ T_imu_lidar
            w_k = valid_r[k].astype(jnp.float32) * matching_weight * OLD_SUBSAMPLE
            for lvl in range(L):
                mu_k, Ct_k, hit_k = corr_old[k][lvl]
                sys_ = gicp.vgicp_linearize_cached(jnp.eye(4), T_wl, pts_r[k],
                                                   covs_r[k], mu_k, Ct_k, hit_k)
                s = k * STATE_DIM
                H = H.at[s:s + 6, s:s + 6].add(w_k * (Ad.T @ sys_.H_ss @ Ad))
                g = g.at[s:s + 6].add(w_k * (Ad.T @ sys_.b_s))
                err = err + w_k * sys_.error
        T_wl_n = T[W - 1] @ T_imu_lidar
        for lvl in range(L):
            mu_n, Ct_n, hit_n = corr_new[lvl]
            sys_ = gicp.vgicp_linearize_cached(jnp.eye(4), T_wl_n, deskewed,
                                               covs_new, mu_n, Ct_n, hit_n)
            s = (W - 1) * STATE_DIM
            w_n = matching_weight
            H = H.at[s:s + 6, s:s + 6].add(w_n * (Ad.T @ sys_.H_ss @ Ad))
            g = g.at[s:s + 6].add(w_n * (Ad.T @ sys_.b_s))
            err = err + w_n * sys_.error
        return H, g, err

    # Once-per-scan refresh for the older frames (the expensive lookups).
    corr_old = []
    for k in range(W - 1):
        T_wl = T_r[k] @ T_imu_lidar
        corr_old.append([gicp.vgicp_lookup(jnp.eye(4), T_wl, pts_r[k],
                                           mask_r[k], vm) for vm in vms])

    T_c, v_c, b_c = T_r, v_r, b_r
    err_fin = jnp.zeros(())
    for _ in range(outer_iters):
        T_wl_n = T_c[W - 1] @ T_imu_lidar
        corr_new = [gicp.vgicp_lookup(jnp.eye(4), T_wl_n, deskewed, scan_mask, vm)
                    for vm in vms]
        for _ in range(inner_iters):
            H_gn, g, err_fin = linearize(T_c, v_c, b_c, corr_old, corr_new)
            delta = solver.solve_damped(H_gn, g, jnp.float32(1e-4))
            d = delta.reshape(W, STATE_DIM)
            T_c = T_c @ lie.se3_exp(d[:, :6])
            v_c = v_c + d[:, 6:9]
            b_c = b_c + d[:, 9:15]

    # --- 5. corruption guard: fall back to the IMU prediction ---
    finite = jnp.all(jnp.isfinite(T_c)) & jnp.all(jnp.isfinite(v_c))
    T_c = jnp.where(finite, T_c, T_r)
    v_c = jnp.where(finite, v_c, v_r)
    b_c = jnp.where(finite, b_c, b_r)

    # --- 5b. build the NEXT marginalization system: only the factors
    # incident to state 0, linearized at the final estimate ---
    Hm = jnp.zeros((2 * STATE_DIM, 2 * STATE_DIM))
    bm = jnp.zeros(2 * STATE_DIM)
    w01 = (valid_r[0] & valid_r[1]).astype(jnp.float32)
    # prior (applies to state 0 when the window is full next scan)
    Hp0, bp0, _ = _prior_system(T_c[0], v_c[0], b_c[0], T_anchor_n,
                                v_anchor_n, b_anchor_n, H_prior_n, b_prior_n)
    Hm = Hm.at[:15, :15].add(w01 * Hp0)
    bm = bm.at[:15].add(w01 * bp0)
    # IMU factor 0-1
    pre_0 = jax.tree_util.tree_map(lambda x: x[0], pre_r)
    ok0 = w01 * (pre_0.dt > 1e-6).astype(jnp.float32)
    Hi0, bi0, _ = _imu_factor_system(T_c[0], v_c[0], T_c[1], v_c[1], b_c[0],
                                     pre_0, gravity)
    Hm = Hm + ok0 * Hi0
    bm = bm + ok0 * bi0
    # bias walk 0-1
    r_b0 = b_c[1] - b_c[0]
    info0 = bias_rw_info / jnp.maximum(pre_0.dt, 1e-3)
    Hb0 = jnp.diag(info0)
    Hm = Hm.at[9:15, 9:15].add(ok0 * Hb0)
    Hm = Hm.at[24:30, 24:30].add(ok0 * Hb0)
    Hm = Hm.at[9:15, 24:30].add(-ok0 * Hb0)
    Hm = Hm.at[24:30, 9:15].add(-ok0 * Hb0)
    bm = bm.at[9:15].add(-ok0 * info0 * r_b0)
    bm = bm.at[24:30].add(ok0 * info0 * r_b0)
    # matching(0) on pose 0
    T_wl0 = T_c[0] @ T_imu_lidar
    for lvl in range(L):
        mu0, Ct0, hit0 = corr_old[0][lvl]
        sys0 = gicp.vgicp_linearize_cached(jnp.eye(4), T_wl0, pts_r[0],
                                           covs_r[0], mu0, Ct0, hit0)
        w0 = w01 * matching_weight * OLD_SUBSAMPLE
        Hm = Hm.at[:6, :6].add(w0 * (Ad.T @ sys0.H_ss @ Ad))
        bm = bm.at[:6].add(w0 * (Ad.T @ sys0.b_s))
    Hm = jnp.where(finite, Hm, jnp.eye(2 * STATE_DIM))
    bm = jnp.where(finite, bm, jnp.zeros(2 * STATE_DIM))

    # --- 6. keyframe-gated model update ---
    T_wl_new = T_c[W - 1] @ T_imu_lidar
    ov = vmx.voxelmap_overlap(vms[0], sub_pts, sub_mask, T_wl_new)
    do_insert = bootstrap | (ov < keyframe_max_overlap)
    w_pts = deskewed @ T_wl_new[:3, :3].T + T_wl_new[:3, 3]
    covs_w = jnp.einsum("ij,cjk,lk->cil", T_wl_new[:3, :3], covs_new, T_wl_new[:3, :3])
    step_id = win.step + 1

    def ins(vm):
        return vmx.voxelmap_insert(vm, w_pts, scan_mask & do_insert, covs_w,
                                   step_id)

    vms_new = tuple(jax.lax.cond(do_insert, ins, lambda v: v, vm) for vm in vms)

    win_new = WindowState(
        T=T_c, v=v_c, b=b_c, stamp=stamp_r, valid=valid_r,
        pts=pts_r, covs=covs_r, mask=mask_r, preints=pre_r,
        H_prior=H_prior_n, b_prior=b_prior_n, T_anchor=T_anchor_n,
        v_anchor=v_anchor_n, b_anchor=b_anchor_n, H_marg=Hm, b_marg=bm,
        step=win.step + 1)

    # Packed status (fetched lazily, one scan late): [finite, err, overlap,
    # marginalized?, pred/opt poses + velocities for IMU validation].
    status = jnp.concatenate([
        jnp.stack([finite.astype(jnp.float32), err_fin, ov,
                   was_full.astype(jnp.float32)]),
        T_pred.ravel(), v_pred,
        T_c[W - 1].ravel(), v_c[W - 1],
    ])

    outputs = dict(
        T_wl=T_c[W - 1] @ T_imu_lidar,
        T_wi=T_c[W - 1], v=v_c[W - 1], b=b_c[W - 1],
        deskewed=deskewed, covs=covs_new, normals=normals_new,
        marg=dict(T_wl=marg_T_wl, T_wi=marg_T_wi, v=marg_v, b=marg_b,
                  stamp=marg_stamp, was_full=was_full),
        pose_table=(stamps_t, quats_t, trans_t),
        status=status,
    )
    return win_new, vms_new, outputs
