"""Small analytic factors: SE3 between/prior with robust kernels, batched.

Equivalent roles to gtsam::BetweenFactor / PriorFactor + Huber noise models
and gtsam_points' LinearDampingFactor (reference usage:
src/glim/mapping/global_mapping_pose_graph.cpp:292-303,446-473,
mapping/global_mapping.cpp:505-543). Residuals follow the right-retraction
convention used across this package: x (+) xi = x * Exp(xi).

Linearization is exact via jax.jacfwd on the retraction parameters, vmapped
over the factor batch — the factor counts here (pose-graph edges) are tiny
compared to point factors, so clarity wins over hand-derived Jacobians.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from glim_tpu.ops.lie import se3_exp, se3_inv, se3_log


class BetweenBatch(NamedTuple):
    """Batched linearized between factors.

    For each factor k with endpoints (i_k, j_k):
    residual r_k = log( Z_k^-1 * (T_i^-1 T_j) ), whitened by sqrt_info and
    robust-weighted. H blocks are (B, 6, 6); b blocks (B, 6).
    """

    H_ii: jnp.ndarray
    H_ij: jnp.ndarray
    H_jj: jnp.ndarray
    b_i: jnp.ndarray
    b_j: jnp.ndarray
    error: jnp.ndarray   # (B,)
    weight: jnp.ndarray  # (B,) robust weights actually applied


def _between_residual(T_i, T_j, Z_inv):
    return se3_log(Z_inv @ se3_inv(T_i) @ T_j)


@jax.jit
def between_linearize(T_i: jnp.ndarray, T_j: jnp.ndarray, Z: jnp.ndarray,
                      sqrt_info: jnp.ndarray, huber_k: jnp.ndarray) -> BetweenBatch:
    """Batched SE3 between factors.

    Args:
      T_i, T_j:   (B, 4, 4) current world poses of the endpoints
      Z:          (B, 4, 4) measured relative pose i->j
      sqrt_info:  (B, 6) per-dim square-root information (diagonal whitening)
      huber_k:    (B,) Huber threshold on the whitened norm; <=0 disables
    """
    Z_inv = se3_inv(Z)

    def res_of(xi_i, xi_j, Ti, Tj, Zi):
        return _between_residual(Ti @ se3_exp(xi_i), Tj @ se3_exp(xi_j), Zi)

    zero = jnp.zeros(6)

    def one(Ti, Tj, Zi, si, hk):
        r = _between_residual(Ti, Tj, Zi)
        J_i = jax.jacfwd(lambda x: res_of(x, zero, Ti, Tj, Zi))(zero)
        J_j = jax.jacfwd(lambda x: res_of(zero, x, Ti, Tj, Zi))(zero)
        rw = si * r
        norm = jnp.linalg.norm(rw)
        w = jnp.where(hk > 0, jnp.minimum(1.0, hk / jnp.maximum(norm, 1e-12)), 1.0)
        W = (si * si * w)[:, None]  # diag info * robust weight
        H_ii = J_i.T @ (W * J_i)
        H_ij = J_i.T @ (W * J_j)
        H_jj = J_j.T @ (W * J_j)
        b_i = J_i.T @ (W[:, 0] * r)
        b_j = J_j.T @ (W[:, 0] * r)
        err = jnp.sum(W[:, 0] * r * r)
        return H_ii, H_ij, H_jj, b_i, b_j, err, w

    out = jax.vmap(one)(T_i, T_j, Z_inv, sqrt_info, huber_k)
    return BetweenBatch(*out)


@jax.jit
def prior_linearize(T: jnp.ndarray, Z: jnp.ndarray, sqrt_info: jnp.ndarray):
    """Batched SE3 prior factors: r = log(Z^-1 T). Returns (H (B,6,6),
    b (B,6), err (B,))."""
    Z_inv = se3_inv(Z)

    def one(Ti, Zi, si):
        r = se3_log(Zi @ Ti)
        J = jax.jacfwd(lambda x: se3_log(Zi @ (Ti @ se3_exp(x))))(jnp.zeros(6))
        W = (si * si)[:, None]
        return J.T @ (W * J), J.T @ (W[:, 0] * r), jnp.sum(W[:, 0] * r * r)

    return jax.vmap(one)(T, Z_inv, sqrt_info)


@jax.jit
def translation_prior_linearize(T: jnp.ndarray, t_meas: jnp.ndarray,
                                sqrt_info: jnp.ndarray):
    """Batched translation-only priors (gtsam::PoseTranslationPrior role;
    reference usage: mapping/global_mapping.cpp session-anchor priors).

    r = T.t - t_meas, whitened by diag(sqrt_info); rotation is left free.
    Returns (H (B,6,6), b (B,6), err (B,)) in the same right-retraction
    parameterization as the other factors here.
    """

    def one(Ti, tm, si):
        r = Ti[:3, 3] - tm
        J = jax.jacfwd(lambda x: (Ti @ se3_exp(x))[:3, 3] - tm)(jnp.zeros(6))
        W = (si * si)[:, None]
        return J.T @ (W * J), J.T @ (W[:, 0] * r), jnp.sum(W[:, 0] * r * r)

    return jax.vmap(one)(T, t_meas, sqrt_info)


@jax.jit
def rotate_vector3_linearize(T: jnp.ndarray, v_local: jnp.ndarray,
                             v_world: jnp.ndarray, sqrt_info: jnp.ndarray):
    """Batched gtsam_points::RotateVector3Factor role: constrain a pose's
    rotation so that R @ v_local == v_world (reference usage:
    mapping/global_mapping.cpp:168-219 — aligning a new session's gravity
    direction to the map frame).

    r = R(T) @ v_local - v_world (3-dim), whitened by diag(sqrt_info).
    Returns (H (B,6,6), b (B,6), err (B,)); translation columns are zero.
    """

    def one(Ti, vl, vw, si):
        def res(x):
            return (Ti @ se3_exp(x))[:3, :3] @ vl - vw

        r = res(jnp.zeros(6))
        J = jax.jacfwd(res)(jnp.zeros(6))
        W = (si * si)[:, None]
        return J.T @ (W * J), J.T @ (W[:, 0] * r), jnp.sum(W[:, 0] * r * r)

    return jax.vmap(one)(T, v_local, v_world, sqrt_info)


def linear_damping(dim: int, scale) -> jnp.ndarray:
    """gtsam_points::LinearDampingFactor role: an isotropic information
    block added at a key to fix gauge freedom or recover an indeterminate
    system (reference usage: mapping/global_mapping.cpp:505-543)."""
    return jnp.eye(dim) * scale


def scatter_between(H, b, batch: BetweenBatch, idx_i, idx_j):
    """Accumulate batched between blocks into the dense (N*6, N*6) system.

    Host-side loop over factors (factor counts are small); device scatter
    via .at[].add keeps everything jittable when wrapped.
    """
    def body(k, Hb):
        H, b = Hb
        i = idx_i[k]
        j = idx_j[k]
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (i * 6, i * 6), (6, 6)) + batch.H_ii[k], (i * 6, i * 6))
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (i * 6, j * 6), (6, 6)) + batch.H_ij[k], (i * 6, j * 6))
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (j * 6, i * 6), (6, 6)) + batch.H_ij[k].T, (j * 6, i * 6))
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (j * 6, j * 6), (6, 6)) + batch.H_jj[k], (j * 6, j * 6))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (i * 6,), (6,)) + batch.b_i[k], (i * 6,))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (j * 6,), (6,)) + batch.b_j[k], (j * 6,))
        return H, b

    B = batch.b_i.shape[0]
    return jax.lax.fori_loop(0, B, body, (H, b))
