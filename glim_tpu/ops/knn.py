"""Brute-force k-nearest-neighbor search via tiled distance matmuls.

TPU-native replacement for the reference's KD-trees (gtsam_points::KdTree /
KdTree2 / KdTreeX, used at src/glim/preprocess/cloud_preprocessor.cpp:190-221
for the k=10 covariance-estimation graph). Pointer-chasing trees are hostile
to a systolic-array machine; with scan sizes of ~10-50k points the full
pairwise-distance computation is a few GFLOP — ideal MXU work:

    ||q - t||^2 = |q|^2 + |t|^2 - 2 q.t

computed tile-by-tile over query rows so the (Tq, N) distance block stays in
VMEM, followed by top-k. Invalid lanes get +inf distance and self-matches are
allowed (the reference's kNN graph includes the point itself as neighbor 0).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_TILE = 1024


@partial(jax.jit, static_argnames=("k", "exclude_self"))
def knn_search(queries: jnp.ndarray, query_mask: jnp.ndarray,
               targets: jnp.ndarray, target_mask: jnp.ndarray,
               k: int, exclude_self: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest targets for each query.

    Returns (indices (Q, k) int32, sq_dists (Q, k) f32). Invalid queries get
    index 0 / +inf distances. ``exclude_self`` masks exact zero-distance
    matches at identical index (only meaningful when queries is targets).
    """
    Q = queries.shape[0]
    N = targets.shape[0]
    tile = min(_TILE, Q)
    n_tiles = -(-Q // tile)
    pad_q = n_tiles * tile - Q
    q = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qm = jnp.pad(query_mask, (0, pad_q))

    t_sq = jnp.sum(targets * targets, axis=-1)
    t_invalid = jnp.where(target_mask, 0.0, jnp.inf)

    def one_tile(carry, inp):
        qt, qmt, base = inp
        q_sq = jnp.sum(qt * qt, axis=-1, keepdims=True)
        d2 = q_sq + t_sq[None, :] - 2.0 * jnp.dot(qt, targets.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(d2, 0.0) + t_invalid[None, :]
        if exclude_self:
            col = jax.lax.broadcasted_iota(jnp.int32, (tile, N), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (tile, N), 0) + base
            d2 = jnp.where(col == row, jnp.inf, d2)
        neg_d, idx = jax.lax.top_k(-d2, k)
        return carry, (idx.astype(jnp.int32), -neg_d)

    tiles_q = q.reshape(n_tiles, tile, 3)
    tiles_m = qm.reshape(n_tiles, tile)
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    _, (idx, d2) = jax.lax.scan(one_tile, None, (tiles_q, tiles_m, bases))
    idx = idx.reshape(-1, k)[:Q]
    d2 = d2.reshape(-1, k)[:Q]
    d2 = jnp.where(query_mask[:, None], d2, jnp.inf)
    idx = jnp.where(query_mask[:, None], idx, 0)
    return idx, d2


@partial(jax.jit, static_argnames=("k",))
def knn_self(points: jnp.ndarray, mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN graph of a cloud against itself, self-match included as
    neighbor 0 (matches the reference's find_neighbors semantics,
    preprocess/cloud_preprocessor.cpp:190-221)."""
    return knn_search(points, mask, points, mask, k=k, exclude_self=False)


def _morton_expand10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_code(coords: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) int32 voxel coords -> (...,) int32 Morton (Z-order) code.
    Coords are offset-shifted into [0, 1024) per axis (10 bits each)."""
    c = jnp.clip(coords + 512, 0, 1023)
    return (_morton_expand10(c[..., 0])
            | (_morton_expand10(c[..., 1]) << 1)
            | (_morton_expand10(c[..., 2]) << 2))


@partial(jax.jit, static_argnames=("k", "window"))
def knn_banded(points: jnp.ndarray, mask: jnp.ndarray, k: int,
               window: int = 64, cell: float = 0.25
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate self-kNN via Morton-order banding.

    Sort points along a Z-order curve (locality-preserving, unlike the voxel
    mixing hash), then search only a +-window/2 band in the sorted order —
    O(N window) instead of O(N^2). For the k~10 covariance neighborhoods of a
    dense scan this recovers almost the same neighbor sets as exact kNN at a
    fraction of the cost; self-match is included as in knn_self.
    """
    C = points.shape[0]
    coords = jnp.floor(points / cell).astype(jnp.int32)
    key = jnp.where(mask, morton_code(coords), jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)
    pts_s = points[order]

    offs = jnp.arange(window) - window // 2                      # includes 0
    idx = jnp.arange(C)[:, None] + offs[None, :]                 # (C, W)
    idx_c = jnp.clip(idx, 0, C - 1)
    cand = pts_s[idx_c]                                          # (C, W, 3)
    # After the sort the valid points are an exact PREFIX (invalid keys are
    # the int32-max sentinel; Morton codes are 30-bit so no valid key can
    # collide) — candidate validity is a range test, replacing a (C, W)
    # boolean gather that measured 8.4 ms of the preprocess program.
    n_valid = jnp.sum(mask)
    cand_ok = (idx >= 0) & (idx < jnp.minimum(n_valid, C))
    diff = cand - pts_s[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_ok, d2, jnp.inf)

    neg, jsel = jax.lax.top_k(-d2, k)                            # (C, k) within band
    nbr_sorted = jnp.take_along_axis(idx_c, jsel, axis=1)
    nbr = order[nbr_sorted]                                      # original indices
    d2k = -neg
    # Undo the sort on the output rows.
    inv = jnp.argsort(order)
    nbr = nbr[inv]
    d2k = d2k[inv]
    d2k = jnp.where(mask[:, None], d2k, jnp.inf)
    nbr = jnp.where(mask[:, None], nbr, 0)
    return nbr.astype(jnp.int32), d2k
