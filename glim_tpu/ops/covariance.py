"""Per-point covariance & normal estimation from kNN neighborhoods.

Equivalent behavior to the reference's ``CloudCovarianceEstimation``
(reference: src/glim/common/cloud_covariance_estimation.cpp:24-226): gather
each point's k neighbors, form the 3x3 scatter, then regularize — PLANE mode
replaces the eigenvalues with diag(1e-3, 1, 1) in the eigenbasis (the GICP
plane-to-plane model), NORMALIZED_MIN_EIG clamps the spectrum relative to the
largest eigenvalue, FROBENIUS adds a scaled identity. Normal = eigenvector of
the smallest eigenvalue, oriented toward the sensor origin.

All fully batched; the eigendecomposition is the closed-form kernel in
glim_tpu.ops.eigh3, not LAPACK.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from glim_tpu.ops.eigh3 import eigh_sym3x3

PLANE = "plane"
NORMALIZED_MIN_EIG = "normalized_min_eig"
FROBENIUS = "frobenius"
NONE = "none"


@partial(jax.jit, static_argnames=("regularization",))
def estimate_covariances(points: jnp.ndarray, mask: jnp.ndarray,
                         neighbors: jnp.ndarray,
                         regularization: str = PLANE,
                         plane_eps: float = 1e-3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point regularized covariance + normal.

    Args:
      points:    (C, 3) f32
      mask:      (C,) bool
      neighbors: (C, k) int32 kNN indices (self included)
      regularization: PLANE | NORMALIZED_MIN_EIG | FROBENIUS | NONE

    Returns (covs (C, 3, 3), normals (C, 3)). Invalid lanes get identity covs
    and zero normals.
    """
    neigh = points[neighbors]                       # (C, k, 3)
    neigh_valid = mask[neighbors]                   # (C, k)
    w = neigh_valid.astype(points.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(neigh * w[..., None], axis=-2) / cnt
    d = (neigh - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("cki,ckj->cij", d, d) / cnt[..., None]

    eigvals, eigvecs = eigh_sym3x3(cov)

    if regularization == PLANE:
        # diag(eps, 1, 1) in the eigenbasis (ascending order: smallest first).
        lam = jnp.array([plane_eps, 1.0, 1.0], dtype=points.dtype)
        cov_r = jnp.einsum("cij,j,ckj->cik", eigvecs, lam, eigvecs)
    elif regularization == NORMALIZED_MIN_EIG:
        lam_max = jnp.maximum(eigvals[..., 2:3], 1e-12)
        lam = jnp.maximum(eigvals / lam_max, plane_eps)
        cov_r = jnp.einsum("cij,cj,ckj->cik", eigvecs, lam, eigvecs)
    elif regularization == FROBENIUS:
        lam_f = 1e-3
        cov_f = cov + lam_f * jnp.eye(3, dtype=points.dtype)
        norm = jnp.linalg.norm(cov_f.reshape(-1, 9), axis=-1).reshape(-1, 1, 1)
        cov_r = cov_f / jnp.maximum(norm, 1e-12)
    else:
        cov_r = cov

    normals = eigvecs[..., :, 0]                    # smallest-eigenvalue direction
    # Orient normals toward the origin (sensor).
    flip = jnp.sum(normals * points, axis=-1, keepdims=True) > 0.0
    normals = jnp.where(flip, -normals, normals)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), cov_r.shape)
    cov_r = jnp.where(mask[:, None, None], cov_r, eye)
    normals = jnp.where(mask[:, None], normals, 0.0)
    return cov_r, normals


@partial(jax.jit, static_argnames=())
def estimate_normals(points: jnp.ndarray, mask: jnp.ndarray,
                     neighbors: jnp.ndarray) -> jnp.ndarray:
    """Per-point normals only (gtsam_points::estimate_normals role)."""
    _, normals = estimate_covariances(points, mask, neighbors, NONE)
    return normals


@jax.jit
def outlier_mask(sq_dists: jnp.ndarray, mask: jnp.ndarray,
                 std_mul_factor: float = 1.0) -> jnp.ndarray:
    """Statistical outlier removal on kNN distances.

    Equivalent to gtsam_points::remove_outliers as used by the preprocessor
    (reference: preprocess/cloud_preprocessor.cpp:160-167): a point is kept if
    its mean neighbor distance is below mean + std * factor over the cloud.
    """
    d = jnp.sqrt(jnp.maximum(sq_dists, 0.0))
    d = jnp.where(jnp.isfinite(d), d, 0.0)
    mean_k = jnp.mean(d, axis=-1)
    valid = mask.astype(d.dtype)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    mu = jnp.sum(mean_k * valid) / n
    var = jnp.sum((mean_k - mu) ** 2 * valid) / n
    thresh = mu + jnp.sqrt(jnp.maximum(var, 0.0)) * std_mul_factor
    return mask & (mean_k < thresh)
