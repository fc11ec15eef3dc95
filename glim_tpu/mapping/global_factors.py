"""Batched global-mapping optimization kernel.

The round-1 backend linearized matching-cost factors one-by-one in a host
loop; this module replaces that with the TPU-native design (SURVEY.md §7
phase 6): all factors live in stacked padded arrays and ONE jitted program
runs the whole damped-GN optimization —

  * matching-cost factors: vmapped ``vgicp_linearize_cached`` over the
    factor axis with CACHED correspondences (the voxel lookups — binary
    search + gathers — are refreshed outside, only for factors whose
    relative pose moved; the per-iteration relinearization is pure einsum
    chains that XLA tiles onto the MXU). This is the iSAM2-style lazy
    relinearization split, applied at the factor level.
  * between factors / priors / gravity anchors: existing batched kernels.
  * IMU endpoint-chain factors (junction velocity/bias states appended to
    the state vector): vmapped jacfwd systems.
  * selective recovery damping: per-pose LinearDampingFactor scales
    (reference global_mapping.cpp:505-543) as a traced vector.

The factor axis is also the multi-chip shard axis: `shard` > 1 runs the
matching linearization under shard_map over the mesh (factors split across
devices, poses replicated, per-factor blocks gathered back).

Padding buckets keep recompiles logarithmic in map size.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import factors as fct
from glim_tpu.ops import gicp, lie, solver
from glim_tpu.ops import imu as imu_ops

BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def bucket(n: int) -> int:
    for b in BUCKETS:
        if b >= n:
            return b
    return ((n + 1023) // 1024) * 1024


def _between_system_full(T_i, T_j, Z, info):
    """SE3 Between factor with a full 6x6 information matrix (carries the
    GICP-Hessian noise of reference global_mapping.cpp:379-428)."""
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
    return H[:6, :6], H[:6, 6:], H[6:, 6:], g[:6], g[6:], r @ info @ r


def _endpoint_imu_system(T_i, T_j, junc, A_R, A_L, pre, gravity):
    """One endpoint-chain factor: dof [xi_i(6), xi_j(6), d_junc(12)]
    (reference global_mapping.cpp:168-219)."""

    def res(x):
        xi_i, xi_j = x[:6], x[6:12]
        v_R = junc[:3] + x[12:15]
        v_L = junc[3:6] + x[15:18]
        bias = junc[6:12] + x[18:24]
        T_R = (T_i @ lie.se3_exp(xi_i)) @ A_R
        T_L = (T_j @ lie.se3_exp(xi_j)) @ A_L
        return imu_ops.imu_residual(T_R[:3, :3], T_R[:3, 3], v_R,
                                    T_L[:3, :3], T_L[:3, 3], v_L,
                                    bias, pre, gravity)

    zero = jnp.zeros(24)
    r = res(zero)
    J = jax.jacfwd(res)(zero)
    cov = pre.cov + jnp.eye(9) * 1e-6
    info_r = jnp.linalg.solve(cov, r)
    info_J = jnp.linalg.solve(cov, J)
    return J.T @ info_J, J.T @ info_r, r @ info_r


@partial(jax.jit, static_argnames=("Sp", "Fp", "Bp", "Jp", "Ap", "Tp",
                                   "iters", "shard_mesh"))
def global_gn(poses0, junc0,
              # matching factors (cached correspondences)
              f_tgt, f_src, f_w, f_mu, f_ct, f_hit,
              sm_pts, sm_covs,
              # between factors (full 6x6 information)
              b_i, b_j, b_Z, b_info, b_valid,
              # IMU endpoint factors
              m_i, m_j, m_AR, m_AL, m_pre, m_valid,
              # priors / anchors / recovery
              prior_T, prior_sqrt, grav_idx, grav_valid, grav_sqrt,
              damping, gravity, matching_weight,
              # translation priors (GNSS / external position constraints)
              t_idx=None, t_pos=None, t_sqrt=None, t_valid=None,
              *, Sp: int, Fp: int, Bp: int, Jp: int, Ap: int, Tp: int = 0,
              iters: int = 5, shard_mesh=None):
    """Damped-GN over submap poses (+ junction states). Returns
    (poses', junc', err, min_diag (Sp,) — per-pose Hessian diagonal minima
    for selective indeterminacy recovery).

    err and min_diag come from the LAST REAL linearization under the
    convergence gate — i.e. they describe the iterate one update BEFORE the
    returned poses, not the returned poses themselves. That is sufficient
    for their consumers (monitoring error trend; rank-deficiency detection,
    which is a structural property that does not move in one sub-tolerance
    step) and avoids a whole extra linearization per call."""
    D = Sp * 6 + Jp * 12
    rows6 = jnp.arange(Sp)[:, None] * 6 + jnp.arange(6)[None, :]

    f_rows_t = f_tgt[:, None] * 6 + jnp.arange(6)[None, :]       # (Fp, 6)
    f_rows_s = f_src[:, None] * 6 + jnp.arange(6)[None, :]
    b_rows_i = b_i[:, None] * 6 + jnp.arange(6)[None, :]
    b_rows_j = b_j[:, None] * 6 + jnp.arange(6)[None, :]
    m_rows = jnp.concatenate([
        m_i[:, None] * 6 + jnp.arange(6)[None, :],
        m_j[:, None] * 6 + jnp.arange(6)[None, :],
        Sp * 6 + jnp.arange(Jp)[:, None] * 12 + jnp.arange(12)[None, :],
    ], axis=1)                                                    # (Jp, 24)

    # One-time SoA relayout per call (iteration-invariant, hoisted out of
    # the GN scan by XLA): the point axis goes LAST (TPU lanes) and the
    # symmetric 3x3s become 6 packed planes — the AoS (C, 3, 3)/(C, 3, 6)
    # temporaries only occupy a sliver of each (8, 128) register tile and
    # measured ~30x slower per linearize chunk (ops/gicp.py SoA note).
    f_mu_s = jnp.swapaxes(f_mu, -1, -2)           # (Fp, 3, M)
    f_ct_s = gicp.sym_pack_soa(f_ct)              # (Fp, 6, M)
    sm_pts_s = jnp.swapaxes(sm_pts, -1, -2)       # (Sp, 3, M)
    sm_covs_s = gicp.sym_pack_soa(sm_covs)        # (Sp, 6, M)

    def match_blocks(T):
        def one(tgt, src, mu, ct, hit, w):
            T_rel = lie.se3_inv(T[tgt]) @ T[src]
            return gicp.linearize_core_soa(
                T_rel[:3, :3], T_rel[:3, 3],
                sm_pts_s[src], sm_covs_s[src], mu, ct, hit & (w > 0))

        def chunked_vmap(tgt, src, mu, ct, hit, w):
            # Chunked map over factor rows: bounds peak HBM for the
            # per-point temporaries of in-flight rows.
            n = tgt.shape[0]
            CH = min(n, 256)
            if n % CH != 0:
                return jax.vmap(one)(tgt, src, mu, ct, hit, w)
            args = jax.tree_util.tree_map(
                lambda a: a.reshape((n // CH, CH) + a.shape[1:]),
                (tgt, src, mu, ct, hit, w))
            out = jax.lax.map(lambda a: jax.vmap(one)(*a), args)
            return jax.tree_util.tree_map(
                lambda a: a.reshape((n,) + a.shape[2:]), out)

        if shard_mesh is not None:
            from jax.sharding import PartitionSpec as P

            @partial(jax.shard_map, mesh=shard_mesh,
                     in_specs=(P(), P("factors"), P("factors"), P("factors"),
                               P("factors"), P("factors"), P("factors")),
                     out_specs=P("factors"))
            def run(T_rep, tgt, src, mu, ct, hit, w):
                return chunked_vmap(tgt, src, mu, ct, hit, w)
            return run(T, f_tgt, f_src, f_mu_s, f_ct_s, f_hit, f_w)
        return chunked_vmap(f_tgt, f_src, f_mu_s, f_ct_s, f_hit, f_w)

    def linearize(T, junc):
        H = jnp.zeros((D, D))
        g = jnp.zeros(D)

        Htt, Hts, Hss, bt, bs, ev = match_blocks(T)
        w = (matching_weight * f_w)[:, None, None]
        wv = (matching_weight * f_w)[:, None]
        H = H.at[f_rows_t[:, :, None], f_rows_t[:, None, :]].add(w * Htt)
        H = H.at[f_rows_t[:, :, None], f_rows_s[:, None, :]].add(w * Hts)
        H = H.at[f_rows_s[:, :, None], f_rows_t[:, None, :]].add(
            w * jnp.swapaxes(Hts, 1, 2))
        H = H.at[f_rows_s[:, :, None], f_rows_s[:, None, :]].add(w * Hss)
        g = g.at[f_rows_t].add(wv * bt)
        g = g.at[f_rows_s].add(wv * bs)
        err = jnp.sum(matching_weight * f_w * ev)

        Hii, Hij, Hjj, bi_, bj_, be = jax.vmap(_between_system_full)(
            T[b_i], T[b_j], b_Z, b_info)
        bw = b_valid.astype(jnp.float32)
        H = H.at[b_rows_i[:, :, None], b_rows_i[:, None, :]].add(
            bw[:, None, None] * Hii)
        H = H.at[b_rows_i[:, :, None], b_rows_j[:, None, :]].add(
            bw[:, None, None] * Hij)
        H = H.at[b_rows_j[:, :, None], b_rows_i[:, None, :]].add(
            bw[:, None, None] * jnp.swapaxes(Hij, 1, 2))
        H = H.at[b_rows_j[:, :, None], b_rows_j[:, None, :]].add(
            bw[:, None, None] * Hjj)
        g = g.at[b_rows_i].add(bw[:, None] * bi_)
        g = g.at[b_rows_j].add(bw[:, None] * bj_)
        err = err + jnp.sum(bw * be)

        if Jp > 0:
            Hm, gm, em = jax.vmap(_endpoint_imu_system,
                                  in_axes=(0, 0, 0, 0, 0, 0, None))(
                T[m_i], T[m_j], junc, m_AR, m_AL, m_pre, gravity)
            mw = m_valid.astype(jnp.float32)
            H = H.at[m_rows[:, :, None], m_rows[:, None, :]].add(
                mw[:, None, None] * Hm)
            g = g.at[m_rows].add(mw[:, None] * gm)
            err = err + jnp.sum(mw * em)
            # Weak junction regularization keeps padded/unobserved states sane.
            jrows = Sp * 6 + jnp.arange(Jp * 12)
            H = H.at[jrows, jrows].add(1e-4)

        pH, pb, perr = fct.prior_linearize(T[0][None], prior_T[None],
                                           prior_sqrt[None])
        H = H.at[:6, :6].add(pH[0])
        g = g.at[:6].add(pb[0])
        err = err + perr[0]

        if Ap > 0:
            ez = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (Ap, 1))
            gH, gb, gerr = fct.rotate_vector3_linearize(
                T[grav_idx], ez, ez, jnp.tile(grav_sqrt[None], (Ap, 3)))
            gw = grav_valid.astype(jnp.float32)
            garows = grav_idx[:, None] * 6 + jnp.arange(6)[None, :]
            H = H.at[garows[:, :, None], garows[:, None, :]].add(
                gw[:, None, None] * gH)
            g = g.at[garows].add(gw[:, None] * gb)
            err = err + jnp.sum(gw * gerr)

        if Tp > 0:
            # External position constraints (GNSS-style): translation-only
            # priors on arbitrary submap poses, rotation left free.
            tH, tb, terr = fct.translation_prior_linearize(T[t_idx], t_pos,
                                                           t_sqrt)
            tw = t_valid.astype(jnp.float32)
            trows = t_idx[:, None] * 6 + jnp.arange(6)[None, :]
            H = H.at[trows[:, :, None], trows[:, None, :]].add(
                tw[:, None, None] * tH)
            g = g.at[trows].add(tw[:, None] * tb)
            err = err + jnp.sum(tw * terr)

        # Per-pose recovery damping + base regularization on padded slots.
        H = H.at[rows6[:, :, None], rows6[:, None, :]].add(
            damping[:, None, None] * jnp.eye(6)[None])
        H = H + jnp.eye(D) * 1e-6
        return H, g, err

    # Each scan step linearizes + solves under a convergence gate: once the
    # update norm drops below tol, remaining iterations take the (cheap)
    # skip branch — lax.cond executes only the taken branch on TPU, so a
    # steady-state optimize (poses barely moving) pays for 1-2 real
    # linearizations instead of all `iters`. err/min_diag ride the carry
    # from the LAST REAL linearization (the former extra post-scan
    # linearize just for the Hessian diagonal cost a full iteration).
    tol = jnp.float32(1e-4)

    def step(carry, _):
        T, junc, err_prev, diag_prev, done = carry

        def do(operand):
            T, junc, _, _, _ = operand
            H, g, err = linearize(T, junc)
            delta = solver.solve_damped(H, g, jnp.float32(1e-4))
            dT = delta[:Sp * 6].reshape(Sp, 6)
            T2 = T @ lie.se3_exp(dT)
            junc2 = junc + delta[Sp * 6:].reshape(Jp, 12) if Jp else junc
            diag = jnp.min(jnp.diagonal(H)[:Sp * 6].reshape(Sp, 6), axis=1)
            return T2, junc2, err, diag, jnp.max(jnp.abs(delta)) < tol

        return jax.lax.cond(done, lambda o: o, do,
                            (T, junc, err_prev, diag_prev, done)), None

    init = (poses0, junc0, jnp.float32(0.0),
            jnp.full(Sp, jnp.inf, jnp.float32), jnp.bool_(False))
    (T_fin, junc_fin, err_fin, min_diag, _), _ = jax.lax.scan(
        step, init, None, length=iters)
    return T_fin, junc_fin, err_fin, min_diag


def pad_stack(items, pad_to: int, template=None):
    """Stack a list of identically-shaped device/numpy arrays and pad the
    leading axis to ``pad_to`` with zeros (or the template entry).

    The item LIST is padded to ``pad_to`` before the stack so the device
    concat program's shape depends only on the (bucketized) pad_to, never on
    the exact item count — otherwise every new factor/submap count compiles
    a fresh trivial program (minutes each on remoted compile services).

    Host-resident items (numpy arrays / python scalars) take a pure-numpy
    fast path: ONE padded host array, ONE device upload. The per-item
    ``jnp.asarray`` path costs one H2D transfer per item — at 128 submaps
    the pose stack alone was 128 round-trips per optimize round on the
    tunneled chip (the dominant share of the measured ~1.4 s opt.args)."""
    if not items:
        assert template is not None
        z = jnp.zeros_like(jnp.asarray(template))
        return jnp.tile(z[None], (pad_to,) + (1,) * z.ndim)
    if all(isinstance(x, (np.ndarray, np.generic, float, int, bool))
           for x in items):
        a0 = np.asarray(items[0])
        out = np.zeros((pad_to,) + a0.shape, a0.dtype)
        out[:len(items)] = np.stack([np.asarray(x) for x in items])
        return jnp.asarray(out)
    arrs = [jnp.asarray(x) for x in items]
    if len(arrs) < pad_to:
        zero = jnp.zeros_like(arrs[0])
        arrs = arrs + [zero] * (pad_to - len(arrs))
    return jnp.stack(arrs)


def pad_stack_tree(trees, pad_to: int, zero_tree):
    """Stack a list of pytrees (e.g. PreintegratedImu) with zero padding.
    Like pad_stack, pads the list before stacking so program shapes are
    keyed by the bucket, not the exact count."""
    import jax.tree_util as jtu
    if not trees:
        return jtu.tree_map(
            lambda z: jnp.tile(jnp.zeros_like(z)[None], (pad_to,) + (1,) * z.ndim),
            zero_tree)
    if len(trees) < pad_to:
        zt = jtu.tree_map(lambda x: jnp.zeros_like(jnp.asarray(x)), trees[0])
        trees = list(trees) + [zt] * (pad_to - len(trees))
    return jtu.tree_map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *trees)
