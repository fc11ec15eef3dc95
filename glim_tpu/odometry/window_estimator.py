"""Device-side sliding-window LiDAR-IMU estimator core.

This is the TPU replacement for the reference's fixed-lag smoother loop
(reference: src/glim/odometry/odometry_estimation_imu.cpp:35-457 — iSAM2
incremental factorization over X/V/B states with IMU + matching-cost
factors, marginalized by time at ``smoother_lag``,
odometry_estimation_imu.cpp:343-355). Incremental sparse factorization is
hostile to XLA (SURVEY.md §7 hard part 1); instead the ENTIRE per-scan step
is ONE fused device program over a ring-buffer state:

  preintegrate IMU -> predict -> IMU-rate deskew -> covariances ->
  marginalize the oldest state (Schur prior; by ring overflow OR by
  ``smoother_lag`` age) -> insert the new state -> batch GN over W states
  (15 dof each) -> freeze the newest matching linearization

The window capacity W is config-driven (``smoother_lag`` x scan rate,
bucketed to avoid recompiles) and the per-scan cost is nearly INDEPENDENT
of W, mirroring iSAM2's lazy relinearization:

  * The newest state matches the keyframe map live, at full resolution,
    with correspondences re-searched every outer iteration.
  * Every OLDER in-window state carries a FROZEN matching linearization —
    the 6x6 Gauss-Newton system (H, g, e) of its scan vs the map, stored at
    the pose it was last linearized at.  In the window GN it contributes
    H and the first-order-corrected gradient g + H*log(T_lin^-1 T), exactly
    the quadratic model iSAM2 keeps for unrelinearized factors.
  * One older state per scan is RE-linearized round-robin against the
    current map from its stored (subsampled) points, bounding staleness at
    W scans (the analogue of iSAM2's relinearization threshold sweep).

All per-state factor systems (IMU, bias walk, frozen matching) are vmapped
and scatter-added into the dense window Hessian, so the program size does
not grow with W.  The host dispatches one step per scan and never blocks;
status (corruption flags, errors, keyframe-strategy inputs) comes back as a
small packed vector fetched one scan late, when its transfer has already
completed.

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
OLD_SUBSAMPLE = 4   # older frames keep every 4th point for relinearization

# Status vector layout (host side decodes by these offsets).
STATUS_FINITE = 0
STATUS_ERR = 1
STATUS_OVERLAP = 2
STATUS_MARGINALIZED = 3
STATUS_LOGDET = 4      # log|H| of the newest live matching block (ENTROPY)
STATUS_DTRANS = 5      # displacement vs the given last-keyframe pose
STATUS_DROT = 6
STATUS_POSES = 7       # then: T_pred (16), v_pred (3), T_opt (16), v_opt (3)
STATUS_LEN = STATUS_POSES + 38


@jax.tree_util.register_dataclass
@dataclass
class WindowState:
    """Ring buffer of the W most recent states + frames + marginalization
    prior + frozen per-state matching linearizations."""

    T: jnp.ndarray        # (W, 4, 4) T_world_imu
    v: jnp.ndarray        # (W, 3)
    b: jnp.ndarray        # (W, 6) [ba, bg]
    stamp: jnp.ndarray    # (W,)
    valid: jnp.ndarray    # (W,) bool
    # Subsampled frame ring for round-robin relinearization.
    pts: jnp.ndarray      # (W, Cs, 3) lidar-frame deskewed points
    covs: jnp.ndarray     # (W, Cs, 3, 3)
    mask: jnp.ndarray     # (W, Cs)
    # Preintegration ring: entry k connects state k -> k+1.
    preints: PreintegratedImu   # stacked (W-1, ...)
    # Frozen matching linearization per state (IMU-pose tangent coords):
    # gradient-convention 6x6 system at linearization pose m_Tlin.
    m_H: jnp.ndarray      # (W, 6, 6)
    m_g: jnp.ndarray      # (W, 6)
    m_e: jnp.ndarray      # (W,)
    m_Tlin: jnp.ndarray   # (W, 4, 4)
    m_valid: jnp.ndarray  # (W,) bool
    # Dense prior on the oldest valid state.
    H_prior: jnp.ndarray      # (15, 15)
    b_prior: jnp.ndarray      # (15,)
    T_anchor: jnp.ndarray     # (4, 4)
    v_anchor: jnp.ndarray     # (3,)
    b_anchor: jnp.ndarray     # (6,)
    # Marginalization system over [oldest | oldest+1] built from ONLY the
    # factors incident to the oldest state (prior, IMU, bias walk, frozen
    # matching) at the last optimized estimate — Schur-complemented into
    # the new prior at the next eviction. Using the full window Hessian
    # here would double-count still-active factors that get re-linearized.
    H_marg: jnp.ndarray       # (30, 30)
    b_marg: jnp.ndarray       # (30,)
    step: jnp.ndarray         # () int32 monotone scan counter


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
        m_H=jnp.zeros((W, 6, 6)),
        m_g=jnp.zeros((W, 6)),
        m_e=jnp.zeros(W),
        m_Tlin=jnp.tile(jnp.eye(4), (W, 1, 1)),
        m_valid=jnp.zeros(W, bool),
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


def _frozen_matching_system(T, m_H, m_g, m_e, m_Tlin, w):
    """Evaluate one frozen matching linearization at pose T.

    The stored (H, g, e) is the gradient-convention GN system of the scan's
    matching cost at m_Tlin; at displacement xi = log(Tlin^-1 T) the
    quadratic model gives gradient g + H xi and error e + 2 g.xi + xi.H.xi
    (iSAM2's kept linearization for factors below the relin threshold)."""
    xi = lie.se3_log(lie.se3_inv(m_Tlin) @ T)
    g = m_g + m_H @ xi
    e = m_e + 2.0 * (m_g @ xi) + xi @ m_H @ xi
    return w * m_H, w * g, w * e


def _build_pair_system(T_c, v_c, b_c, valid, pre_ring, j,
                       T_anchor, v_anchor, b_anchor, H_prior, b_prior,
                       m_H, m_g, m_e, m_Tlin, m_valid,
                       bias_rw_info, gravity):
    """GN system over [state_j | state_{j+1}] from ONLY the factors incident
    to state j (prior, IMU j->j+1, bias walk, frozen matching(j)), at the
    given estimate — the next eviction Schur-complements this."""
    take = lambda a: jnp.take(a, j, axis=0)
    take1 = lambda a: jnp.take(a, j + 1, axis=0)
    Tj, vj, bj = take(T_c), take(v_c), take(b_c)
    Tj1, vj1, bj1 = take1(T_c), take1(v_c), take1(b_c)
    pre_j = jax.tree_util.tree_map(lambda x: jnp.take(x, jnp.minimum(j, x.shape[0] - 1), axis=0), pre_ring)

    Hm = jnp.zeros((2 * STATE_DIM, 2 * STATE_DIM))
    bm = jnp.zeros(2 * STATE_DIM)
    w_pair = (take(valid) & take1(valid)).astype(jnp.float32)

    Hp, bp, _ = _prior_system(Tj, vj, bj, T_anchor, v_anchor, b_anchor,
                              H_prior, b_prior)
    Hm = Hm.at[:15, :15].add(w_pair * Hp)
    bm = bm.at[:15].add(w_pair * bp)

    ok = w_pair * (pre_j.dt > 1e-6).astype(jnp.float32)
    Hi, bi, _ = _imu_factor_system(Tj, vj, Tj1, vj1, bj, pre_j, gravity)
    Hm = Hm + ok * Hi
    bm = bm + ok * bi

    r_b = bj1 - bj
    info = bias_rw_info / jnp.maximum(pre_j.dt, 1e-3)
    Hb = jnp.diag(info)
    Hm = Hm.at[9:15, 9:15].add(ok * Hb)
    Hm = Hm.at[24:30, 24:30].add(ok * Hb)
    Hm = Hm.at[9:15, 24:30].add(-ok * Hb)
    Hm = Hm.at[24:30, 9:15].add(-ok * Hb)
    bm = bm.at[9:15].add(-ok * info * r_b)
    bm = bm.at[24:30].add(ok * info * r_b)

    w_m = w_pair * take(m_valid).astype(jnp.float32)
    Hf, gf, _ = _frozen_matching_system(Tj, take(m_H), take(m_g), take(m_e),
                                        take(m_Tlin), w_m)
    Hm = Hm.at[:6, :6].add(Hf)
    bm = bm.at[:6].add(gf)
    return Hm, bm


@partial(jax.jit, static_argnames=("W", "outer_iters", "inner_iters",
                                   "compute_covs", "matching",
                                   "full_connection"),
         donate_argnums=(0,))
def window_scan_step(win: WindowState, vms,
                     # raw scan (full resolution, lidar frame, NOT deskewed)
                     scan_pts, scan_times, scan_mask, scan_neighbors,
                     # ONE packed per-scan upload (cap+1, 8): rows 0..cap-1
                     # are IMU samples [acc(3), gyro(3), stamp_rel, dt]
                     # covering (t_prev, t_scan_end] with stamps relative to
                     # the scan start (<=0 -> preintegration); the LAST row
                     # is metadata [n_imu, scan_stamp, force_evict, 0...].
                     # Packing everything that changes per scan into a single
                     # host->device transfer matters on remoted chips, where
                     # every transfer costs ~2 ms of tunnel latency.
                     imu_packed,
                     T_lidar_imu, gravity,
                     acc_noise, gyro_noise, int_noise, bias_rw_info,
                     matching_weight, T_last_keyframe,
                     max_corr_dist=jnp.float32(2.0),
                     # optional (2,) [weight, v_max]: quadratic pull of the
                     # newest velocity back to the |v| <= v_max ball
                     # (glim_ext velocity_suppressor role); None = absent.
                     vel_reg=None,
                     *, W: int, outer_iters: int = 2, inner_iters: int = 2,
                     compute_covs: bool = False, matching: str = "vgicp",
                     full_connection: int = 2):
    """One fused odometry step. Returns (win', outputs dict).

    The model update is NOT part of this program (the host decides keyframe
    insertion from the lagged status via keyframe_manager.py — or, for the
    cpu-parity module, inserts a random sample every scan — and dispatches
    the map ops separately); ``vms`` is read-only here:
      matching="vgicp": tuple of multi-resolution GaussianVoxelMaps
      matching="gicp":  one PointVoxelMap (iVox role), NN correspondences
                        capped at max_corr_dist (reference
                        odometry_estimation_cpu.cpp:98-104)."""
    from glim_tpu.ops import covariance as cov_ops

    # Unpack the per-scan upload (see parameter docs above).
    imu_cap = imu_packed.shape[0] - 1
    imu_acc = imu_packed[:imu_cap, 0:3]
    imu_gyro = imu_packed[:imu_cap, 3:6]
    imu_stamps_rel = imu_packed[:imu_cap, 6]
    imu_dts = imu_packed[:imu_cap, 7]
    meta = imu_packed[imu_cap]
    imu_mask = jnp.arange(imu_cap) < meta[0].astype(jnp.int32)
    scan_stamp = meta[1]
    force_evict = meta[2] > 0.5

    if matching == "gicp":
        pm = vms

        def lookup_all(T_wl, pts, mask):
            from glim_tpu.ops.pallas_knn import nn_search
            q = pts @ T_wl[:3, :3].T + T_wl[:3, 3]
            idx, d2 = nn_search(q, mask, pm.points, pm.mask)
            hit = mask & (d2 < max_corr_dist * max_corr_dist) & jnp.isfinite(d2)
            return [(pm.points[idx], pm.covs[idx], hit)]
    else:
        if isinstance(vms, vmx.GaussianVoxelMap):
            vms = (vms,)

        def lookup_all(T_wl, pts, mask):
            return [gicp.vgicp_lookup(jnp.eye(4), T_wl, pts, mask, vm)
                    for vm in vms]

    def lookup_all_soa(T_wl, pts, mask):
        """lookup_all + relayout of the correspondences to SoA (point axis
        last, packed symmetric covs) — the linearizations consuming them
        run ~30x faster in that layout (ops/gicp.py SoA note); the one-time
        transpose per lookup is trivial next to the search itself."""
        return [(jnp.swapaxes(mu, -1, -2), gicp.sym_pack_soa(Ct), hit)
                for mu, Ct, hit in lookup_all(T_wl, pts, mask)]

    def match_soa(T_wl, pts_s, covs_s, mu_s, ct_s, hit):
        """H_ss/b_s/error of one cached-correspondence VGICP system (the
        window only constrains the SOURCE pose; target is the world map).
        Unused H_tt/H_ts/b_t outputs are dead-code-eliminated by XLA."""
        out = gicp.linearize_core_soa(T_wl[:3, :3], T_wl[:3, 3],
                                      pts_s, covs_s, mu_s, ct_s, hit)
        return out[2], out[4], out[5]
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
    # SoA mirrors of the scan geometry for the matching linearizations.
    deskewed_s = jnp.swapaxes(deskewed, -1, -2)          # (3, C)
    covs_new_s = gicp.sym_pack_soa(covs_new)             # (6, C)

    # --- 3. evict the oldest state (ring overflow OR smoother_lag age).
    # The decision is made ON THE HOST (deterministically, from the same
    # stamps) and passed in, so host frame bookkeeping never needs a sync
    # and can never diverge from the device by f32/f64 rounding. ---
    j_old = jnp.argmax(win.valid)            # oldest valid slot (pre-roll)
    n_valid = jnp.sum(win.valid)
    evict = (n_valid >= 2) & force_evict

    take_old = lambda a: jnp.take(a, j_old, axis=0)
    marg_T_wi = take_old(win.T)
    marg_T_wl = marg_T_wi @ T_imu_lidar
    marg_v = take_old(win.v)
    marg_b = take_old(win.b)
    marg_stamp = take_old(win.stamp)

    # Schur prior from the stored oldest-pair system: reorder
    # [state_{j+1} | state_j], marginalize the trailing 15 dof (w/ gradient).
    keep = jnp.concatenate([jnp.arange(STATE_DIM, 2 * STATE_DIM),
                            jnp.arange(0, STATE_DIM)])
    H2 = win.H_marg[jnp.ix_(keep, keep)]
    b2 = win.b_marg[keep]
    H_schur, b_schur = solver.schur_marginalize(H2, b2, STATE_DIM)
    take_old1 = lambda a: jnp.take(a, jnp.minimum(j_old + 1, W - 1), axis=0)
    H_prior_n = jnp.where(evict, H_schur, win.H_prior)
    b_prior_n = jnp.where(evict, b_schur, win.b_prior)
    T_anchor_n = jnp.where(evict, take_old1(win.T), win.T_anchor)
    v_anchor_n = jnp.where(evict, take_old1(win.v), win.v_anchor)
    b_anchor_n = jnp.where(evict, take_old1(win.b), win.b_anchor)
    valid_pre = win.valid & ~(evict & (jnp.arange(W) == j_old))

    roll = lambda a: jnp.roll(a, -1, axis=0)
    sub_pts = deskewed[::OLD_SUBSAMPLE]
    sub_covs = covs_new[::OLD_SUBSAMPLE]
    sub_mask = scan_mask[::OLD_SUBSAMPLE]

    T_r = roll(win.T).at[W - 1].set(T_pred)
    v_r = roll(win.v).at[W - 1].set(v_pred)
    b_r = roll(win.b).at[W - 1].set(b_prev)
    stamp_r = roll(win.stamp).at[W - 1].set(scan_stamp)
    valid_r = roll(valid_pre).at[W - 1].set(True)
    pts_r = roll(win.pts).at[W - 1].set(sub_pts)
    covs_r = roll(win.covs).at[W - 1].set(sub_covs)
    mask_r = roll(win.mask).at[W - 1].set(sub_mask)
    pre_r = jax.tree_util.tree_map(
        lambda rbuf, new: roll(rbuf).at[W - 2].set(new), win.preints, pre_new)
    mH_r = roll(win.m_H)
    mg_r = roll(win.m_g)
    me_r = roll(win.m_e)
    mT_r = roll(win.m_Tlin).at[W - 1].set(T_pred)
    mv_r = roll(win.m_valid).at[W - 1].set(False)

    prior_idx = jnp.argmax(valid_r)  # oldest valid slot (post-roll)

    # --- 3b. per-scan relinearization of older states against the current
    # map. Two tiers (both bounded-cost, both on the 1/OLD_SUBSAMPLE frame):
    #   * the newest `full_connection - 1` older states refresh EVERY scan —
    #     the analogue of the reference's full_connection_window_size binary
    #     factors whose Jacobians touch the recent poses at every update
    #     (odometry_estimation_gpu.cpp:175-184);
    #   * ONE of the remaining states refreshes round-robin, bounding
    #     frozen-system staleness at ~W scans (iSAM2's threshold sweep). ---
    def _refresh_slot(k, bufs):
        mH, mg, me, mT, mv = bufs
        T_wl_k = jnp.take(T_r, k, axis=0) @ T_imu_lidar
        pts_k = jnp.take(pts_r, k, axis=0)
        covs_k = jnp.take(covs_r, k, axis=0)
        mask_k = jnp.take(mask_r, k, axis=0) & jnp.take(valid_r, k)
        pts_k_s = jnp.swapaxes(pts_k, -1, -2)
        covs_k_s = gicp.sym_pack_soa(covs_k)
        Hk = jnp.zeros((6, 6))
        gk = jnp.zeros(6)
        ek = jnp.zeros(())
        for mu, ct, hit in lookup_all_soa(T_wl_k, pts_k, mask_k):
            Hs, bs, es = match_soa(T_wl_k, pts_k_s, covs_k_s, mu, ct, hit)
            Hk = Hk + Hs
            gk = gk + bs
            ek = ek + es
        w_k = OLD_SUBSAMPLE * matching_weight
        do = jnp.take(valid_r, k) & (k < W - 1) & (k >= 0)
        sel = (jnp.arange(W) == k) & do
        mH = jnp.where(sel[:, None, None], w_k * (Ad.T @ Hk @ Ad), mH)
        mg = jnp.where(sel[:, None], w_k * (Ad.T @ gk), mg)
        me = jnp.where(sel, w_k * ek, me)
        mT = jnp.where(sel[:, None, None], jnp.take(T_r, k, axis=0), mT)
        mv = jnp.where(sel, True, mv)
        return mH, mg, me, mT, mv

    bufs = (mH_r, mg_r, me_r, mT_r, mv_r)
    fc_extra = min(max(full_connection - 1, 0), W - 2)
    for j in range(fc_extra):
        bufs = _refresh_slot(jnp.int32(W - 2 - j), bufs)
    n_rest = jnp.maximum(jnp.sum(valid_r) - 1 - fc_extra, 1)
    k_rr = W - 2 - fc_extra - (win.step % n_rest)
    mH_r, mg_r, me_r, mT_r, mv_r = _refresh_slot(k_rr, bufs)

    # --- 4. batch GN over the window ---
    rows30 = (jnp.arange(W - 1)[:, None] * STATE_DIM
              + jnp.arange(2 * STATE_DIM)[None, :])       # (W-1, 30)
    rows6 = (jnp.arange(W)[:, None] * STATE_DIM
             + jnp.arange(6)[None, :])                    # (W, 6)
    pair_ok = (valid_r[:-1] & valid_r[1:]
               & (pre_r.dt > 1e-6)).astype(jnp.float32)   # (W-1,)
    walk_info = bias_rw_info[None, :] / jnp.maximum(pre_r.dt, 1e-3)[:, None]

    # Linearize the prior and the IMU factors ONCE per scan, at the entry
    # estimates; the GN iterations evaluate the resulting quadratic model
    # with a first-order-corrected gradient (g0 + H*delta) — exactly the
    # linearization iSAM2 keeps for factors below the relinearization
    # threshold. Within one scan the iterate moves millimetres, so the
    # frozen Jacobians are indistinguishable from per-iteration jacfwd at a
    # quarter of its cost; the marginalization system (5c) and the next
    # scan's step still relinearize at the updated estimate.
    Hp0, bp0, ep0 = _prior_system(T_r[prior_idx], v_r[prior_idx],
                                  b_r[prior_idx], T_anchor_n, v_anchor_n,
                                  b_anchor_n, H_prior_n, b_prior_n)
    Hk0, bk0, ek0 = jax.vmap(_imu_factor_system, in_axes=(0, 0, 0, 0, 0, 0, None))(
        T_r[:-1], v_r[:-1], T_r[1:], v_r[1:], b_r[:-1], pre_r, gravity)

    def state_deltas(T, v, b):
        xi_T = jax.vmap(lambda a, c: lie.se3_log(lie.se3_inv(a) @ c))(T_r, T)
        return jnp.concatenate([xi_T, v - v_r, b - b_r], axis=1)   # (W, 15)

    def linearize(T, v, b, corr_new):
        H = jnp.zeros((D, D))
        g = jnp.zeros(D)
        delta = state_deltas(T, v, b)

        # Prior on the oldest valid state (frozen quadratic model).
        d0 = delta[prior_idx]
        Hp = Hp0
        bp = bp0 + Hp0 @ d0
        ep = ep0 + 2.0 * (bp0 @ d0) + d0 @ Hp0 @ d0
        s0 = prior_idx * STATE_DIM
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (s0, s0), (15, 15)) + Hp, (s0, s0))
        g = jax.lax.dynamic_update_slice(
            g, jax.lax.dynamic_slice(g, (s0,), (15,)) + bp, (s0,))
        err = ep

        # IMU factors k -> k+1 (frozen quadratic models), scatter-added.
        dpair = jnp.concatenate([delta[:-1], delta[1:]], axis=1)   # (W-1, 30)
        Hk = Hk0
        bk = bk0 + jnp.einsum("kij,kj->ki", Hk0, dpair)
        ek = (ek0 + 2.0 * jnp.einsum("ki,ki->k", bk0, dpair)
              + jnp.einsum("ki,kij,kj->k", dpair, Hk0, dpair))
        H = H.at[rows30[:, :, None], rows30[:, None, :]].add(
            pair_ok[:, None, None] * Hk)
        g = g.at[rows30].add(pair_ok[:, None] * bk)
        err = err + jnp.sum(pair_ok * ek)

        # Bias random walk between consecutive states.
        r_b = b[1:] - b[:-1]                              # (W-1, 6)
        wi = pair_ok[:, None] * walk_info
        bias_rows_i = rows30[:, 9:15]
        bias_rows_j = rows30[:, 24:30]
        eye6 = jnp.eye(6)
        Hb = wi[:, :, None] * eye6[None]
        H = H.at[bias_rows_i[:, :, None], bias_rows_i[:, None, :]].add(Hb)
        H = H.at[bias_rows_j[:, :, None], bias_rows_j[:, None, :]].add(Hb)
        H = H.at[bias_rows_i[:, :, None], bias_rows_j[:, None, :]].add(-Hb)
        H = H.at[bias_rows_j[:, :, None], bias_rows_i[:, None, :]].add(-Hb)
        g = g.at[bias_rows_i].add(-wi * r_b)
        g = g.at[bias_rows_j].add(wi * r_b)
        err = err + jnp.sum(wi * r_b * r_b)

        # Frozen matching factors on all older states, vmapped.
        w_frozen = (mv_r & valid_r).astype(jnp.float32) * \
            (jnp.arange(W) < W - 1).astype(jnp.float32)
        Hf, gf, ef = jax.vmap(_frozen_matching_system)(
            T, mH_r, mg_r, me_r, mT_r, w_frozen)
        H = H.at[rows6[:, :, None], rows6[:, None, :]].add(Hf)
        g = g.at[rows6].add(gf)
        err = err + jnp.sum(ef)

        # Live matching for the newest state (full resolution, all levels).
        T_wl_n = T[W - 1] @ T_imu_lidar
        s = (W - 1) * STATE_DIM
        H_live = jnp.zeros((6, 6))
        for mu_n, ct_n, hit_n in corr_new:
            Hs, bs, es = match_soa(T_wl_n, deskewed_s, covs_new_s,
                                   mu_n, ct_n, hit_n)
            H_live = H_live + matching_weight * (Ad.T @ Hs @ Ad)
            g = g.at[s:s + 6].add(matching_weight * (Ad.T @ bs))
            err = err + matching_weight * es
        H = H.at[s:s + 6, s:s + 6].add(H_live)

        if vel_reg is not None:
            # Velocity regulation on the newest state: GN of the residual
            # r = v - proj_{|v|<=v_max}(v) (zero inside the ball).
            sv = (W - 1) * STATE_DIM + 6
            v_new = v[W - 1]
            speed = jnp.linalg.norm(v_new)
            r_v = v_new * jnp.maximum(
                1.0 - vel_reg[1] / jnp.maximum(speed, 1e-6), 0.0)
            H = H.at[sv + jnp.arange(3), sv + jnp.arange(3)].add(vel_reg[0])
            g = g.at[sv:sv + 3].add(vel_reg[0] * r_v)
            err = err + vel_reg[0] * jnp.sum(r_v * r_v)
        return H, g, err, H_live

    T_c, v_c, b_c = T_r, v_r, b_r
    err_fin = jnp.zeros(())
    H_gn = jnp.eye(D)
    H_live_fin = jnp.eye(6)
    for _ in range(outer_iters):
        T_wl_n = T_c[W - 1] @ T_imu_lidar
        corr_new = lookup_all_soa(T_wl_n, deskewed, scan_mask)
        for _ in range(inner_iters):
            H_gn, g, err_fin, H_live_fin = linearize(T_c, v_c, b_c, corr_new)
            delta = solver.solve_damped(H_gn, g, jnp.float32(1e-4))
            d = delta.reshape(W, STATE_DIM)
            d = d * valid_r[:, None]
            T_c = T_c @ lie.se3_exp(d[:, :6])
            v_c = v_c + d[:, 6:9]
            b_c = b_c + d[:, 9:15]

    # --- 5. corruption guard: fall back to the IMU prediction ---
    finite = jnp.all(jnp.isfinite(T_c)) & jnp.all(jnp.isfinite(v_c))
    T_c = jnp.where(finite, T_c, T_r)
    v_c = jnp.where(finite, v_c, v_r)
    b_c = jnp.where(finite, b_c, b_r)

    # --- 5b. freeze the newest matching linearization at the final pose ---
    T_wl_fin = T_c[W - 1] @ T_imu_lidar
    sub_pts_s = deskewed_s[:, ::OLD_SUBSAMPLE]
    sub_covs_s = covs_new_s[:, ::OLD_SUBSAMPLE]
    Hn = jnp.zeros((6, 6))
    gn = jnp.zeros(6)
    en = jnp.zeros(())
    hit0 = None
    for mu, ct, hit in lookup_all_soa(T_wl_fin, sub_pts, sub_mask):
        Hs, bs, es = match_soa(T_wl_fin, sub_pts_s, sub_covs_s, mu, ct, hit)
        Hn = Hn + Hs
        gn = gn + bs
        en = en + es
        hit0 = hit if hit0 is None else hit0
    w_n = OLD_SUBSAMPLE * matching_weight
    mH_r = mH_r.at[W - 1].set(w_n * (Ad.T @ Hn @ Ad))
    mg_r = mg_r.at[W - 1].set(w_n * (Ad.T @ gn))
    me_r = me_r.at[W - 1].set(w_n * en)
    mT_r = mT_r.at[W - 1].set(T_c[W - 1])
    mv_r = mv_r.at[W - 1].set(True)

    # --- 5c. marginalization system for the NEXT eviction: factors incident
    # to the (post-roll) oldest state, linearized at the final estimate ---
    Hm, bm = _build_pair_system(T_c, v_c, b_c, valid_r, pre_r, prior_idx,
                                T_anchor_n, v_anchor_n, b_anchor_n,
                                H_prior_n, b_prior_n,
                                mH_r, mg_r, me_r, mT_r, mv_r,
                                bias_rw_info, gravity)
    Hm = jnp.where(finite, Hm, jnp.eye(2 * STATE_DIM))
    bm = jnp.where(finite, bm, jnp.zeros(2 * STATE_DIM))

    # --- 6. keyframe-strategy inputs (decision happens on host, lagged).
    # Overlap = fraction of (subsampled) scan points with a level-0
    # correspondence at the final pose — reused from the freeze lookup, so
    # no extra map pass (gtsam_points::overlap role). ---
    T_wl_new = T_wl_fin
    ov = jnp.sum(hit0) / jnp.maximum(jnp.sum(sub_mask), 1)
    sign, logdet = jnp.linalg.slogdet(H_live_fin + jnp.eye(6) * 1e-6)
    d_kf = lie.se3_log(lie.se3_inv(T_last_keyframe) @ T_c[W - 1])
    d_rot = jnp.linalg.norm(d_kf[:3])
    d_trans = jnp.linalg.norm(d_kf[3:])

    win_new = WindowState(
        T=T_c, v=v_c, b=b_c, stamp=stamp_r, valid=valid_r,
        pts=pts_r, covs=covs_r, mask=mask_r, preints=pre_r,
        m_H=mH_r, m_g=mg_r, m_e=me_r, m_Tlin=mT_r, m_valid=mv_r,
        H_prior=H_prior_n, b_prior=b_prior_n, T_anchor=T_anchor_n,
        v_anchor=v_anchor_n, b_anchor=b_anchor_n, H_marg=Hm, b_marg=bm,
        step=win.step + 1)

    # Packed status (fetched lazily, one scan late): see STATUS_* layout.
    status = jnp.concatenate([
        jnp.stack([finite.astype(jnp.float32), err_fin, ov,
                   evict.astype(jnp.float32), sign * logdet,
                   d_trans, d_rot]),
        T_pred.ravel(), v_pred,
        T_c[W - 1].ravel(), v_c[W - 1],
    ])

    outputs = dict(
        T_wl=T_wl_new,
        T_wi=T_c[W - 1], v=v_c[W - 1], b=b_c[W - 1],
        deskewed=deskewed, covs=covs_new, normals=normals_new,
        marg=dict(T_wl=marg_T_wl, T_wi=marg_T_wi, v=marg_v, b=marg_b,
                  stamp=marg_stamp, was_full=evict),
        pose_table=(stamps_t, quats_t, trans_t),
        status=status,
    )
    if compute_covs:
        # Marginal covariances of every in-window state from the final
        # window Hessian (reference computes these from iSAM2 on request,
        # odometry_estimation_imu.cpp:399-428). Nearly free at this size.
        damp = 1e-4 * jnp.diag(H_gn) + 1e-6
        Sigma = jnp.linalg.inv(H_gn + jnp.diag(damp))
        blocks = Sigma.reshape(W, STATE_DIM, W, STATE_DIM)
        outputs["state_covs"] = jax.vmap(lambda k: blocks[k, :, k, :])(
            jnp.arange(W))
    return win_new, outputs
