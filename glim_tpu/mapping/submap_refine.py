"""Submap batch refinement: the full in-submap factor graph on device.

TPU equivalent of the reference's submap optimization
(reference: src/glim/mapping/sub_mapping.cpp:183-243 factor creation,
:421-452 batch LM): per-frame 15-dof states [pose, velocity, bias] joined by

  * a pose prior on the first frame (precision 1e8),
  * odometry Between factors between consecutive frames with a
    GICP-Hessian-derived information matrix (:193-210),
  * the IMU factor chain — preintegrated factors between consecutive
    frames, velocity/bias priors at odometry values, bias random-walk
    betweens, and a velocity-between fallback where IMU data was
    insufficient (:219-243),
  * fully-connected VGICP matching factors between keyframe pairs
    (target = earlier keyframe's multi-level voxelmaps, source = later
    keyframe's subsampled points, :275-316).

Everything is padded to static capacities (Np frames, Kp keyframes) and the
whole LM runs as ONE jitted program: per-factor systems are vmapped and
scatter-added into the dense (Np*15)^2 Hessian; VGICP correspondences are
re-searched once per outer iteration and cached across inner GN steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from glim_tpu.odometry.window_estimator import (STATE_DIM,
                                                _imu_factor_system)
from glim_tpu.ops import gicp, lie, solver

POSE_PRIOR_INFO = 1e8      # first-frame gauge prior (reference :190)
VEL_PRIOR_INFO = 1e3       # per-frame velocity prior  (reference :227)
BIAS_PRIOR_INFO = 1e6      # per-frame bias prior      (reference :228)
BIAS_WALK_INFO = 1e6       # bias between              (reference :237)
VEL_WALK_INFO = 1.0        # velocity-between fallback (reference :242)


def _prior_system6(T, anchor, info):
    """SE3 pose prior (gradient convention)."""
    def res(xi):
        return lie.se3_log(lie.se3_inv(anchor) @ (T @ lie.se3_exp(xi)))

    zero = jnp.zeros(6)
    r = res(zero)
    J = jax.jacfwd(res)(zero)
    return J.T @ info @ J, J.T @ (info @ r), r @ info @ r


def _between_system(T_i, T_j, Z, info):
    """Full-information SE3 Between factor (gradient convention)."""
    Z_inv = lie.se3_inv(Z)

    def res(xi):
        Ti = T_i @ lie.se3_exp(xi[:6])
        Tj = T_j @ lie.se3_exp(xi[6:])
        return lie.se3_log(Z_inv @ lie.se3_inv(Ti) @ Tj)

    zero = jnp.zeros(12)
    r = res(zero)
    J = jax.jacfwd(res)(zero)
    H = J.T @ info @ J
    g = J.T @ (info @ r)
    return H, g, r @ info @ r


@partial(jax.jit, static_argnames=("Np", "Kp", "outer", "inner"))
def submap_refine(T0, v0, b0, valid,
                  bt_delta, bt_info, bt_valid,
                  pre, pre_valid,
                  kf_pts, kf_covs, kf_mask, kf_fidx, kf_valid, kf_vms,
                  gravity,
                  *, Np: int, Kp: int, outer: int = 3, inner: int = 3):
    """Refine all frame states of one submap.

    Args (padded): T0 (Np,4,4) v0 (Np,3) b0 (Np,6) valid (Np,) — initial
    states; bt_* — Between edge (i-1, i) data (entry 0 unused);
    pre / pre_valid — stacked preintegrations for edges (i, i+1), length
    Np-1; kf_* — keyframe refinement clouds (Kp, Cs, ...), their frame
    indices and a tuple (levels) of stacked (Kp, ...) GaussianVoxelMaps.
    Returns (T, v, b, final_error)."""
    D = Np * STATE_DIM
    rows30 = (jnp.arange(Np - 1)[:, None] * STATE_DIM
              + jnp.arange(2 * STATE_DIM)[None, :])
    pose_rows = jnp.arange(Np)[:, None] * STATE_DIM + jnp.arange(6)[None, :]
    vel_rows = jnp.arange(Np)[:, None] * STATE_DIM + 6 + jnp.arange(3)[None, :]
    bias_rows = jnp.arange(Np)[:, None] * STATE_DIM + 9 + jnp.arange(6)[None, :]

    edge_ok = (valid[:-1] & valid[1:]).astype(jnp.float32)
    bt_ok = edge_ok * bt_valid[1:].astype(jnp.float32)     # edge (i-1,i) -> i
    imu_ok = edge_ok * pre_valid.astype(jnp.float32) * \
        (pre.dt > 1e-6).astype(jnp.float32)
    vel_fb_ok = edge_ok * (1.0 - (pre_valid & (pre.dt > 1e-6)).astype(jnp.float32))

    # Static keyframe pair list (i < j).
    pairs = [(i, j) for i in range(Kp) for j in range(Kp) if i < j]
    pi = jnp.asarray([p[0] for p in pairs])
    pj = jnp.asarray([p[1] for p in pairs])
    pair_ok = (kf_valid[pi] & kf_valid[pj]).astype(jnp.float32)
    fi = kf_fidx[pi]       # target frame index per pair
    fj = kf_fidx[pj]       # source frame index per pair
    rows_t = fi[:, None] * STATE_DIM + jnp.arange(6)[None, :]   # (P, 6)
    rows_s = fj[:, None] * STATE_DIM + jnp.arange(6)[None, :]

    def pair_lookups(T):
        """Correspondences for every (level, pair): list over levels of
        (mu, Ct, hit) stacked (P, Cs, ...). Loop targets statically (the
        stacked-map gather per pair would blow memory); sources vmapped."""
        out = []
        for vms_l in kf_vms:
            mus, cts, hits = [], [], []
            for i in range(Kp):
                vm_i = jax.tree_util.tree_map(lambda x: x[i], vms_l)
                T_t = T[kf_fidx[i]]

                def one(pts, msk, T_s):
                    return gicp.vgicp_lookup(T_t, T_s, pts, msk, vm_i)

                mu, ct, hit = jax.vmap(one)(kf_pts, kf_mask, T[kf_fidx])
                mus.append(mu)
                cts.append(ct)
                hits.append(hit)
            # Select per-pair target entries: target i of pair p.
            mu_all = jnp.stack(mus)       # (Kp_target, Kp_source, Cs, 3)
            ct_all = jnp.stack(cts)
            hit_all = jnp.stack(hits)
            out.append((mu_all[pi, pj], ct_all[pi, pj], hit_all[pi, pj]))
        return out

    def linearize(T, v, b, corr):
        H = jnp.zeros((D, D))
        g = jnp.zeros(D)

        # Gauge prior on frame 0 + per-frame velocity/bias priors.
        Hp, gp, ep = _prior_system6(T[0], T0[0], jnp.eye(6) * POSE_PRIOR_INFO)
        H = H.at[:6, :6].add(Hp)
        g = g.at[:6].add(gp)
        err = ep

        w_v = valid.astype(jnp.float32)[:, None]
        r_v = (v - v0) * w_v
        r_b = (b - b0) * w_v
        H = H.at[vel_rows[:, :, None], vel_rows[:, None, :]].add(
            VEL_PRIOR_INFO * w_v[:, :, None] * jnp.eye(3)[None])
        g = g.at[vel_rows].add(VEL_PRIOR_INFO * r_v)
        H = H.at[bias_rows[:, :, None], bias_rows[:, None, :]].add(
            BIAS_PRIOR_INFO * w_v[:, :, None] * jnp.eye(6)[None])
        g = g.at[bias_rows].add(BIAS_PRIOR_INFO * r_b)
        err = err + VEL_PRIOR_INFO * jnp.sum(r_v * r_v) \
                  + BIAS_PRIOR_INFO * jnp.sum(r_b * r_b)

        # Odometry Between factors (i-1, i) with GICP-Hessian information.
        Hb, gb, eb = jax.vmap(_between_system)(T[:-1], T[1:], bt_delta[1:],
                                               bt_info[1:])
        # Between couples pose blocks of (i-1, i): rows = [pose_{i-1} | pose_i].
        rows12 = jnp.concatenate([pose_rows[:-1], pose_rows[1:]], axis=1)
        H = H.at[rows12[:, :, None], rows12[:, None, :]].add(
            bt_ok[:, None, None] * Hb)
        g = g.at[rows12].add(bt_ok[:, None] * gb)
        err = err + jnp.sum(bt_ok * eb)

        # IMU factor chain.
        Hi, gi, ei = jax.vmap(_imu_factor_system,
                              in_axes=(0, 0, 0, 0, 0, 0, None))(
            T[:-1], v[:-1], T[1:], v[1:], b[:-1], pre, gravity)
        H = H.at[rows30[:, :, None], rows30[:, None, :]].add(
            imu_ok[:, None, None] * Hi)
        g = g.at[rows30].add(imu_ok[:, None] * gi)
        err = err + jnp.sum(imu_ok * ei)

        # Bias walk + velocity-between fallback.
        r_bw = b[1:] - b[:-1]
        H = H.at[bias_rows[:-1][:, :, None], bias_rows[:-1][:, None, :]].add(
            BIAS_WALK_INFO * edge_ok[:, None, None] * jnp.eye(6)[None])
        H = H.at[bias_rows[1:][:, :, None], bias_rows[1:][:, None, :]].add(
            BIAS_WALK_INFO * edge_ok[:, None, None] * jnp.eye(6)[None])
        H = H.at[bias_rows[:-1][:, :, None], bias_rows[1:][:, None, :]].add(
            -BIAS_WALK_INFO * edge_ok[:, None, None] * jnp.eye(6)[None])
        H = H.at[bias_rows[1:][:, :, None], bias_rows[:-1][:, None, :]].add(
            -BIAS_WALK_INFO * edge_ok[:, None, None] * jnp.eye(6)[None])
        g = g.at[bias_rows[:-1]].add(-BIAS_WALK_INFO * edge_ok[:, None] * r_bw)
        g = g.at[bias_rows[1:]].add(BIAS_WALK_INFO * edge_ok[:, None] * r_bw)
        err = err + BIAS_WALK_INFO * jnp.sum(edge_ok[:, None] * r_bw * r_bw)

        r_vw = v[1:] - v[:-1]
        H = H.at[vel_rows[:-1][:, :, None], vel_rows[:-1][:, None, :]].add(
            VEL_WALK_INFO * vel_fb_ok[:, None, None] * jnp.eye(3)[None])
        H = H.at[vel_rows[1:][:, :, None], vel_rows[1:][:, None, :]].add(
            VEL_WALK_INFO * vel_fb_ok[:, None, None] * jnp.eye(3)[None])
        H = H.at[vel_rows[:-1][:, :, None], vel_rows[1:][:, None, :]].add(
            -VEL_WALK_INFO * vel_fb_ok[:, None, None] * jnp.eye(3)[None])
        H = H.at[vel_rows[1:][:, :, None], vel_rows[:-1][:, None, :]].add(
            -VEL_WALK_INFO * vel_fb_ok[:, None, None] * jnp.eye(3)[None])
        g = g.at[vel_rows[:-1]].add(-VEL_WALK_INFO * vel_fb_ok[:, None] * r_vw)
        g = g.at[vel_rows[1:]].add(VEL_WALK_INFO * vel_fb_ok[:, None] * r_vw)
        err = err + VEL_WALK_INFO * jnp.sum(vel_fb_ok[:, None] * r_vw * r_vw)

        # VGICP keyframe pairs (cached correspondences).
        for mu, ct, hit in corr:
            def one(T_t, T_s, pts, covs, m, c, h, w):
                s = gicp.vgicp_linearize_cached(T_t, T_s, pts, covs, m, c,
                                                h & (w > 0))
                return s.H_tt, s.H_ts, s.H_ss, s.b_t, s.b_s, s.error

            Htt, Hts, Hss, bt_, bs_, ev = jax.vmap(one)(
                T[fi], T[fj], kf_pts[pj], kf_covs[pj], mu, ct, hit, pair_ok)
            w = pair_ok[:, None, None]
            H = H.at[rows_t[:, :, None], rows_t[:, None, :]].add(w * Htt)
            H = H.at[rows_t[:, :, None], rows_s[:, None, :]].add(w * Hts)
            H = H.at[rows_s[:, :, None], rows_t[:, None, :]].add(
                w * jnp.swapaxes(Hts, 1, 2))
            H = H.at[rows_s[:, :, None], rows_s[:, None, :]].add(w * Hss)
            g = g.at[rows_t].add(pair_ok[:, None] * bt_)
            g = g.at[rows_s].add(pair_ok[:, None] * bs_)
            err = err + jnp.sum(pair_ok * ev)
        return H, g, err

    T, v, b = T0, v0, b0
    err = jnp.zeros(())
    for _ in range(outer):
        corr = pair_lookups(T)
        for _ in range(inner):
            H, g, err = linearize(T, v, b, corr)
            delta = solver.solve_damped(H, g, jnp.float32(1e-4))
            d = delta.reshape(Np, STATE_DIM) * valid[:, None]
            T = T @ lie.se3_exp(d[:, :6])
            v = v + d[:, 6:9]
            b = b + d[:, 9:15]

    finite = jnp.all(jnp.isfinite(T)) & jnp.all(jnp.isfinite(v))
    T = jnp.where(finite, T, T0)
    v = jnp.where(finite, v, v0)
    b = jnp.where(finite, b, b0)
    return T, v, b, err
