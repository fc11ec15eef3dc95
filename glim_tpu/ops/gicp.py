"""GICP / VGICP matching-cost linearization kernels.

TPU-native equivalents of gtsam_points' ``IntegratedGICPFactor``,
``IntegratedVGICPFactor[GPU]`` and ``inlier_fraction`` (reference usage:
src/glim/odometry/odometry_estimation_cpu.cpp:98-114,
odometry/odometry_estimation_gpu.cpp:128-206, mapping/global_mapping.cpp:430-484).

A "factor" here is a pure function: given the two poses and the point data it
returns the summed 6/12-dof Gauss-Newton system

    H = sum_i J_i^T Omega_i J_i,   b = sum_i J_i^T Omega_i r_i,
    err = sum_i r_i^T Omega_i r_i

with the plane-to-plane Mahalanobis weight Omega_i = (C_tgt + R C_src R^T)^-1.
Correspondences are re-searched at every linearization (matching the
reference's per-iteration correspondence updates): nearest-neighbor via the
MXU kNN kernel for GICP, voxel-hash lookup for VGICP. All reductions are
masked sums over fixed-capacity arrays — XLA fuses the per-point Jacobian,
3x3 closed-form inverse and the (C, 3, 12) einsum chain into a single pass.

Pose convention: world poses T with right retraction T * exp([omega, v]).
Residuals live in the TARGET frame: r_i = mu_tgt - T_t^-1 T_s p_src.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from glim_tpu.ops.lie import se3_inv, skew
from glim_tpu.ops.voxelmap import GaussianVoxelMap, voxelmap_lookup


class FactorSystem(NamedTuple):
    """Accumulated GN system for one binary factor (target, source)."""

    H_tt: jnp.ndarray   # (6, 6)
    H_ts: jnp.ndarray   # (6, 6)
    H_ss: jnp.ndarray   # (6, 6)
    b_t: jnp.ndarray    # (6,)
    b_s: jnp.ndarray    # (6,)
    error: jnp.ndarray  # ()
    num_inliers: jnp.ndarray  # ()


def inv_sym3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched symmetric 3x3 (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    A11 = d * f - e * e
    A12 = c * e - b * f
    A13 = b * e - c * d
    A22 = a * f - c * c
    A23 = b * c - a * e
    A33 = a * d - b * b
    det = a * A11 + b * A12 + c * A13
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    inv = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A12, A22, A23], axis=-1),
        jnp.stack([A13, A23, A33], axis=-1),
    ], axis=-2) * inv_det[..., None, None]
    return inv


def _linearize_core(R_rel, t_rel, src_pts, mu_tgt, omega, w):
    """Given correspondences + weights, build the 12-dof system.

    Jacobians (target-frame residual r = mu - q, right perturbation, twist
    order [omega, v]):
      dr/dxi_t = [ -[q]x     |  I      ]
      dr/dxi_s = [ R_rel [p]x | -R_rel ]
    """
    q = src_pts @ R_rel.T + t_rel                    # (C, 3)
    r = mu_tgt - q

    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), q.shape + (3,))
    J_t = jnp.concatenate([-skew(q), eye3], axis=-1)                       # (C, 3, 6)
    Rp = jnp.einsum("ij,cjk->cik", R_rel, skew(src_pts))                   # R [p]x
    J_s = jnp.concatenate([Rp, -jnp.broadcast_to(R_rel, q.shape + (3,))], axis=-1)  # (C, 3, 6)

    Wr = jnp.einsum("cij,cj->ci", omega, r) * w[:, None]                   # (C, 3)
    WJt = jnp.einsum("cij,cjk->cik", omega, J_t) * w[:, None, None]
    WJs = jnp.einsum("cij,cjk->cik", omega, J_s) * w[:, None, None]

    H_tt = jnp.einsum("cki,ckj->ij", J_t, WJt)
    H_ts = jnp.einsum("cki,ckj->ij", J_t, WJs)
    H_ss = jnp.einsum("cki,ckj->ij", J_s, WJs)
    b_t = jnp.einsum("cki,ck->i", J_t, Wr)
    b_s = jnp.einsum("cki,ck->i", J_s, Wr)
    err = jnp.sum(jnp.einsum("ci,ci->c", r, Wr))
    return FactorSystem(H_tt, H_ts, H_ss, b_t, b_s, err, jnp.sum(w > 0))


# --- SoA (structure-of-arrays) linearization -------------------------------
#
# The AoS core above carries per-point (C, 3, 3) / (C, 3, 6) temporaries whose
# tiny trailing dims map onto a fraction of the TPU's (8, 128) register tiles;
# measured on-chip, one backend linearize chunk (128 factor rows x 2048 pts)
# costs ~12 ms AoS vs ~0.4 ms with the point axis LAST and matrix components
# unrolled (symmetric 3x3s packed as 6 planes). The SoA forms below are the
# hot path of the global backend's matching-factor linearization.

def sym_pack_soa(A: jnp.ndarray) -> jnp.ndarray:
    """(..., M, 3, 3) symmetric -> packed SoA (..., 6, M):
    planes [xx, xy, xz, yy, yz, zz]."""
    return jnp.stack([A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
                      A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]], axis=-2)


def _soa_sym_mul_vec(s, v):
    """Packed symmetric (6, C) times vectors (3, C) -> (3, C)."""
    xx, xy, xz, yy, yz, zz = s
    return jnp.stack([xx * v[0] + xy * v[1] + xz * v[2],
                      xy * v[0] + yy * v[1] + yz * v[2],
                      xz * v[0] + yz * v[1] + zz * v[2]])


def _soa_rot_sym(R, s):
    """R S R^T for packed symmetric S (6, C) and R (3, 3) -> (6, C)."""
    xx, xy, xz, yy, yz, zz = s

    def srow(a, b, c):
        return [a * R[j, 0] + b * R[j, 1] + c * R[j, 2] for j in range(3)]

    sr = [srow(xx, xy, xz), srow(xy, yy, yz), srow(xz, yz, zz)]

    def out(i, j):
        return R[i, 0] * sr[0][j] + R[i, 1] * sr[1][j] + R[i, 2] * sr[2][j]

    return jnp.stack([out(0, 0), out(0, 1), out(0, 2),
                      out(1, 1), out(1, 2), out(2, 2)])


def _soa_inv_sym(s):
    """Closed-form inverse of packed symmetric 3x3 (6, C) -> (6, C).
    Same determinant guard as inv_sym3x3."""
    xx, xy, xz, yy, yz, zz = s
    c00 = yy * zz - yz * yz
    c01 = xz * yz - xy * zz
    c02 = xy * yz - xz * yy
    c11 = xx * zz - xz * xz
    c12 = xy * xz - xx * yz
    c22 = xx * yy - xy * xy
    det = xx * c00 + xy * c01 + xz * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    return jnp.stack([c00, c01, c02, c11, c12, c22]) * inv_det


def linearize_core_soa(R_rel, t_rel, pts, covs, mu, ct, hit):
    """SoA twin of _linearize_core + the VGICP Mahalanobis weighting.

    pts/mu: (3, C); covs/ct: packed symmetric (6, C); hit: (C,) bool.
    Returns the same (H_tt, H_ts, H_ss, b_t, b_s, error) blocks."""
    q = jnp.stack([R_rel[i, 0] * pts[0] + R_rel[i, 1] * pts[1]
                   + R_rel[i, 2] * pts[2] + t_rel[i] for i in range(3)])
    r = mu - q
    omega = _soa_inv_sym(ct + _soa_rot_sym(R_rel, covs))
    w = hit.astype(pts.dtype)

    zero = jnp.zeros_like(q[0])
    one = jnp.ones_like(q[0])
    # J_t = [-skew(q) | I] columns; J_s = [R skew(p) | -R] columns.
    Jt = [jnp.stack([zero, -q[2], q[1]]),
          jnp.stack([q[2], zero, -q[0]]),
          jnp.stack([-q[1], q[0], zero]),
          jnp.stack([one, zero, zero]),
          jnp.stack([zero, one, zero]),
          jnp.stack([zero, zero, one])]
    sp = [jnp.stack([zero, pts[2], -pts[1]]),
          jnp.stack([-pts[2], zero, pts[0]]),
          jnp.stack([pts[1], -pts[0], zero])]

    def rmul(v):
        return jnp.stack([R_rel[i, 0] * v[0] + R_rel[i, 1] * v[1]
                          + R_rel[i, 2] * v[2] for i in range(3)])

    Js = [rmul(v) for v in sp] + [
        jnp.stack([-R_rel[0, i] * one, -R_rel[1, i] * one,
                   -R_rel[2, i] * one]) for i in range(3)]

    WJt = [_soa_sym_mul_vec(omega, c) * w for c in Jt]
    WJs = [_soa_sym_mul_vec(omega, c) * w for c in Js]
    Wr = _soa_sym_mul_vec(omega, r) * w

    def dots(A, B):
        return jnp.stack([jnp.stack([jnp.sum(a * b) for b in B]) for a in A])

    H_tt = dots(Jt, WJt)
    H_ts = dots(Jt, WJs)
    H_ss = dots(Js, WJs)
    b_t = jnp.stack([jnp.sum(c * Wr) for c in Jt])
    b_s = jnp.stack([jnp.sum(c * Wr) for c in Js])
    err = jnp.sum(r * Wr)
    return H_tt, H_ts, H_ss, b_t, b_s, err


def _soa_system(R_rel, t_rel, src_pts, src_covs, mu, C_t, hit) -> FactorSystem:
    """AoS-interface wrapper over the SoA core: converts the (C, 3)/(C, 3, 3)
    operands once (a relayout XLA fuses into the producing gathers) and runs
    the fast-layout linearization. All public linearizers route through
    here, so every matching-factor call site gets the SoA speedup."""
    out = linearize_core_soa(R_rel, t_rel,
                             jnp.swapaxes(src_pts, -1, -2),
                             sym_pack_soa(src_covs),
                             jnp.swapaxes(mu, -1, -2),
                             sym_pack_soa(C_t), hit)
    return FactorSystem(*out, jnp.sum(hit > 0))


@jax.jit
def gicp_linearize(T_target: jnp.ndarray, T_source: jnp.ndarray,
                   src_pts: jnp.ndarray, src_covs: jnp.ndarray, src_mask: jnp.ndarray,
                   tgt_pts: jnp.ndarray, tgt_covs: jnp.ndarray, tgt_mask: jnp.ndarray,
                   max_dist: jnp.ndarray) -> FactorSystem:
    """GICP factor vs an explicit target point cloud (NN correspondences)."""
    from glim_tpu.ops.pallas_knn import nn_search

    T_rel = se3_inv(T_target) @ T_source
    R_rel, t_rel = T_rel[:3, :3], T_rel[:3, 3]
    q = src_pts @ R_rel.T + t_rel

    idx, d2 = nn_search(q, src_mask, tgt_pts, tgt_mask)
    mu = tgt_pts[idx]
    C_t = tgt_covs[idx]

    inlier = src_mask & (d2 < max_dist * max_dist) & jnp.isfinite(d2)
    return _soa_system(R_rel, t_rel, src_pts, src_covs, mu, C_t,
                       inlier.astype(q.dtype))


@jax.jit
def vgicp_linearize(T_target: jnp.ndarray, T_source: jnp.ndarray,
                    src_pts: jnp.ndarray, src_covs: jnp.ndarray, src_mask: jnp.ndarray,
                    vm: GaussianVoxelMap) -> FactorSystem:
    """VGICP factor vs a target Gaussian voxel map (voxel-hash lookups)."""
    T_rel = se3_inv(T_target) @ T_source
    R_rel, t_rel = T_rel[:3, :3], T_rel[:3, 3]
    q = src_pts @ R_rel.T + t_rel

    vidx = voxelmap_lookup(vm, q)
    hit = (vidx >= 0) & src_mask
    safe = jnp.maximum(vidx, 0)
    stats = jnp.concatenate([vm.mean, vm.cov.reshape(-1, 9)], axis=1)
    row = stats[safe]
    mu = row[:, :3]
    C_t = row[:, 3:].reshape(-1, 3, 3)

    return _soa_system(R_rel, t_rel, src_pts, src_covs, mu, C_t,
                       hit.astype(q.dtype))


@jax.jit
def vgicp_lookup(T_target: jnp.ndarray, T_source: jnp.ndarray,
                 src_pts: jnp.ndarray, src_mask: jnp.ndarray,
                 vm: GaussianVoxelMap):
    """Correspondence phase of VGICP: voxel lookup + stats gather.

    Split out so GN solvers can cache correspondences across inner iterations
    (pose updates of a few mm rarely cross voxel boundaries, so re-searching
    every iteration — the expensive gather/binary-search part — is wasted)."""
    T_rel = se3_inv(T_target) @ T_source
    q = src_pts @ T_rel[:3, :3].T + T_rel[:3, 3]
    vidx = voxelmap_lookup(vm, q)
    hit = (vidx >= 0) & src_mask
    safe = jnp.maximum(vidx, 0)
    # One fused (V, 12) row gather for mean+cov instead of two separate
    # gathers; the pack is elementwise over the table and CSE'd once per
    # compiled program across every lookup site sharing the map.
    stats = jnp.concatenate([vm.mean, vm.cov.reshape(-1, 9)], axis=1)
    row = stats[safe]
    return row[:, :3], row[:, 3:].reshape(-1, 3, 3), hit


@jax.jit
def vgicp_lookup_stacked(T_all, tgt, src, sm_pts, sm_mask, keys, stats, res):
    """Batched correspondence search for R factor rows against STACKED
    per-submap voxelmap tables (see voxelmap.gaussian_lookup_table).

    Replaces the global mapping's per-factor vgicp_lookup dispatch loop in
    the correspondence refresh: after a loop closure moves the whole map,
    MOST factors are stale, and re-searching them one dispatch at a time
    costs hundreds of tunnel round-trips per refresh round (measured ~4 s
    per optimize at 128 submaps / 608 factors); this runs the entire round
    as ONE program. The searches use an unrolled binary search whose
    per-step gathers index the stacked table in place — the "sort" strategy
    best for single maps would re-sort the table once per row.

    T_all: (S, 4, 4) poses; tgt/src: (R,) int32; sm_pts: (S, M, 3);
    sm_mask: (S, M); keys: (S, V, 2); stats: (S, V, 12); res: (S,)
    -> mu (R, M, 3), C_t (R, M, 3, 3), hit (R, M)."""
    from glim_tpu.ops.voxelmap import lookup_keys

    def one(t, s):
        T_rel = se3_inv(T_all[t]) @ T_all[s]
        q = sm_pts[s] @ T_rel[:3, :3].T + T_rel[:3, 3]
        found = lookup_keys(keys[t], res[t], q, method="scan_unrolled")
        hit = (found >= 0) & sm_mask[s]
        row = stats[t][jnp.maximum(found, 0)]
        return row[:, :3], row[:, 3:].reshape(-1, 3, 3), hit

    R = tgt.shape[0]
    CH = 32
    if R <= CH or R % CH != 0:
        return jax.vmap(one)(tgt, src)
    # Chunked map bounds the transient per-row gather footprint (a flat
    # vmap materializes all R rows' (M, 12) stats gathers at once).
    args = (tgt.reshape(R // CH, CH), src.reshape(R // CH, CH))
    out = jax.lax.map(lambda a: jax.vmap(one)(*a), args)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((R,) + a.shape[2:]), out)


@jax.jit
def vgicp_linearize_cached(T_target: jnp.ndarray, T_source: jnp.ndarray,
                           src_pts: jnp.ndarray, src_covs: jnp.ndarray,
                           mu: jnp.ndarray, C_t: jnp.ndarray,
                           hit: jnp.ndarray) -> FactorSystem:
    """Linearize with pre-fetched correspondences (see vgicp_lookup)."""
    T_rel = se3_inv(T_target) @ T_source
    return _soa_system(T_rel[:3, :3], T_rel[:3, 3], src_pts, src_covs,
                       mu, C_t, hit.astype(src_pts.dtype))


@jax.jit
def icp_linearize(T_target: jnp.ndarray, T_source: jnp.ndarray,
                  src_pts: jnp.ndarray, src_mask: jnp.ndarray,
                  tgt_pts: jnp.ndarray, tgt_mask: jnp.ndarray,
                  max_dist: jnp.ndarray) -> FactorSystem:
    """Point-to-point ICP factor (gtsam_points::IntegratedICPFactor role):
    GICP with identity covariances, i.e. isotropic Mahalanobis weights."""
    from glim_tpu.ops.pallas_knn import nn_search

    T_rel = se3_inv(T_target) @ T_source
    R_rel, t_rel = T_rel[:3, :3], T_rel[:3, 3]
    q = src_pts @ R_rel.T + t_rel
    idx, d2 = nn_search(q, src_mask, tgt_pts, tgt_mask)
    mu = tgt_pts[idx]
    inlier = src_mask & (d2 < max_dist * max_dist) & jnp.isfinite(d2)
    # Identity covariances on both sides halve to identity weights.
    zeros = jnp.zeros(q.shape + (3,), q.dtype)
    eyes = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), q.shape + (3,))
    return _soa_system(R_rel, t_rel, src_pts, zeros, mu, eyes,
                       inlier.astype(q.dtype))


@jax.jit
def gicp_error(T_target, T_source, src_pts, src_covs, src_mask,
               tgt_pts, tgt_covs, tgt_mask, max_dist) -> jnp.ndarray:
    return gicp_linearize(T_target, T_source, src_pts, src_covs, src_mask,
                          tgt_pts, tgt_covs, tgt_mask, max_dist).error


@jax.jit
def vgicp_error(T_target, T_source, src_pts, src_covs, src_mask, vm) -> jnp.ndarray:
    return vgicp_linearize(T_target, T_source, src_pts, src_covs, src_mask, vm).error


@jax.jit
def inlier_fraction(T_target, T_source, src_pts, src_mask,
                    tgt_pts, tgt_mask, max_dist) -> jnp.ndarray:
    """Fraction of source points with a target NN within max_dist
    (gtsam_points::inlier_fraction, used for loop validation:
    reference global_mapping_pose_graph.cpp:404,417)."""
    from glim_tpu.ops.pallas_knn import nn_search

    T_rel = se3_inv(T_target) @ T_source
    q = src_pts @ T_rel[:3, :3].T + T_rel[:3, 3]
    _, d2 = nn_search(q, src_mask, tgt_pts, tgt_mask)
    ok = src_mask & (d2 < max_dist * max_dist)
    return jnp.sum(ok) / jnp.maximum(jnp.sum(src_mask), 1)
