"""Closed-form eigendecomposition of batched symmetric 3x3 matrices.

jnp.linalg.eigh on huge batches of tiny matrices is poor TPU work (generic
QR path); the analytic trigonometric solution vectorizes perfectly on the VPU
and is what per-point covariance regularization needs (SURVEY.md §7 "hard
parts" item 6).

Eigenvalues: Smith's trigonometric method for symmetric 3x3.
Eigenvectors: cross-product method with pivoting on the largest column,
falling back gracefully on (near-)degenerate spectra.
Returned in ascending eigenvalue order, matching jnp.linalg.eigh.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


@jax.jit
def eigvals_sym3x3(A: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> (..., 3) eigenvalues ascending."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))

    safe_p = jnp.where(p > _EPS, p, 1.0)
    c00, c11, c22 = b00 / safe_p, b11 / safe_p, b22 / safe_p
    c01, c02, c12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    # det(B/p) / 2
    detB = (c00 * (c11 * c22 - c12 * c12)
            - c01 * (c01 * c22 - c12 * c02)
            + c02 * (c01 * c12 - c11 * c02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e2 = q + 2.0 * p * jnp.cos(phi)
    e0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e1 = 3.0 * q - e0 - e2
    # Degenerate: p ~ 0 -> all eigenvalues = q.
    deg = p <= _EPS
    e0 = jnp.where(deg, q, e0)
    e1 = jnp.where(deg, q, e1)
    e2 = jnp.where(deg, q, e2)
    return jnp.stack([e0, e1, e2], axis=-1)


def _eigvec_for(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of symmetric (..., 3, 3) for eigenvalue lam via the
    cross-product of the two most independent rows of (A - lam I)."""
    eye = jnp.eye(3, dtype=A.dtype)
    M = A - lam[..., None, None] * eye
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.stack([n01, n02, n12], axis=-1).argmax(axis=-1)
    v = jnp.where((best == 0)[..., None], c01,
                  jnp.where((best == 1)[..., None], c02, c12))
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # Fully degenerate (sphere): any unit vector is an eigenvector.
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), v.shape)
    return jnp.where(nrm > 1e-20, v / jnp.maximum(nrm, 1e-20), fallback)


@jax.jit
def eigh_sym3x3(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 3, 3) symmetric -> (eigvals (..., 3) ascending, eigvecs (..., 3, 3)
    with eigvecs[..., :, i] the i-th eigenvector), like jnp.linalg.eigh."""
    w = eigvals_sym3x3(A)
    v0 = _eigvec_for(A, w[..., 0])
    v2 = _eigvec_for(A, w[..., 2])
    # Middle vector: orthogonal complement (robust when lam1 is close to
    # either neighbor).
    v1 = jnp.cross(v2, v0)
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v1 = jnp.where(n1 > 1e-20, v1 / jnp.maximum(n1, 1e-20),
                   jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], A.dtype), v1.shape))
    # Re-orthogonalize v0 against v2 to fight f32 drift in near-degenerate
    # spectra, then rebuild v1.
    v0 = v0 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v2
    v0n = jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v0 = jnp.where(v0n > 1e-20, v0 / jnp.maximum(v0n, 1e-20),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), v0.shape))
    v1 = jnp.cross(v2, v0)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w, V
