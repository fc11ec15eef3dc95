"""Pallas TPU kernel: streaming nearest-neighbor (k=1) search.

The GICP/CT-GICP correspondence search — nearest target point for every
source point — is the dominant cost of the point-matching path. The generic
XLA route (full (Q, N) distance matrix + lax.top_k) materializes the matrix
and runs a slow selection; this kernel streams target tiles through VMEM,
computes each distance block on the MXU, and folds a running (min_d2, argmin)
per query — O(TQ x TN) live values, no materialized matrix, no top_k.

Layout notes (TPU tiling): targets are carried TRANSPOSED as (3, N) so the
long axis sits on the 128-lane dimension — an (N, 3) VMEM block would pad
every row to 128 lanes (a 42x memory blowup that cannot fit). Scalars ride
as (1, N) / (Q, 1) 2-D arrays; 1-D refs don't lower cleanly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 256   # queries per program
TN = 2048  # target chunk streamed per loop step


def _nn_kernel(q_ref, t_ref, tsq_ref, out_idx_ref, out_d2_ref):
    """q_ref: (TQ, 3); t_ref: (3, N); tsq_ref: (1, N) |t|^2 (+inf invalid);
    outputs (TQ, 1)."""
    N = t_ref.shape[1]
    n_tiles = N // TN

    q = q_ref[:]                                           # (TQ, 3)
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)          # (TQ, 1)

    def body(j, carry):
        best_d2, best_idx = carry
        t = t_ref[:, pl.ds(j * TN, TN)]                    # (3, TN)
        tsq = tsq_ref[:, pl.ds(j * TN, TN)]                # (1, TN)
        d2 = q_sq + tsq - 2.0 * jnp.dot(
            q, t, preferred_element_type=jnp.float32)      # (TQ, TN)
        tile_min = jnp.min(d2, axis=-1, keepdims=True)     # (TQ, 1)
        tile_arg = jnp.argmin(d2, axis=-1).astype(jnp.int32)[:, None] + j * TN
        take = tile_min < best_d2
        return (jnp.where(take, tile_min, best_d2),
                jnp.where(take, tile_arg, best_idx))

    init = (jnp.full((TQ, 1), jnp.inf, jnp.float32),
            jnp.zeros((TQ, 1), jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(0, n_tiles, body, init)
    out_idx_ref[:] = best_idx
    out_d2_ref[:] = jnp.maximum(best_d2, 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def nn_search_pallas(queries: jnp.ndarray, query_mask: jnp.ndarray,
                     targets: jnp.ndarray, target_mask: jnp.ndarray,
                     interpret: bool = False):
    """Nearest target per query. Q must be a multiple of TQ and N of TN (the
    padded capacity classes guarantee this). Returns (idx (Q,), d2 (Q,)) with
    invalid queries mapped to (0, +inf)."""
    Q = queries.shape[0]
    N = targets.shape[0]
    assert Q % TQ == 0 and N % TN == 0, (Q, N)

    t_T = targets.T                                        # (3, N)
    t_sq = jnp.where(target_mask, jnp.sum(targets * targets, axis=-1),
                     jnp.inf)[None, :]                     # (1, N)

    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=(Q // TQ,),
        in_specs=[
            pl.BlockSpec((TQ, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Q, 1), jnp.int32),
                   jax.ShapeDtypeStruct((Q, 1), jnp.float32)],
        interpret=interpret,
    )(queries, t_T, t_sq)

    idx = idx[:, 0]
    d2 = d2[:, 0]
    d2 = jnp.where(query_mask, d2, jnp.inf)
    idx = jnp.where(query_mask, idx, 0)
    return idx, d2


def nn_search(queries, query_mask, targets, target_mask):
    """Backend-dispatching nearest-neighbor: the Pallas kernel on TPU (when
    the padded shapes satisfy the tile multiples), the XLA matmul+top_k
    fallback elsewhere (Pallas CPU runs interpret-only, far slower than the
    fallback). Safe to call inside jit: the dispatch is trace-time."""
    dev = str(jax.devices()[0]).lower()
    # VMEM bound: the kernel stages the whole transposed target array in
    # VMEM (~16 B/point padded); beyond ~512k points fall back to the tiled
    # XLA path rather than risk a Mosaic OOM.
    if ("tpu" in dev and queries.shape[0] % TQ == 0
            and targets.shape[0] % TN == 0 and targets.shape[0] <= 524288):
        return nn_search_pallas(queries, query_mask, targets, target_mask)
    from glim_tpu.ops.knn import knn_search
    idx, d2 = knn_search(queries, query_mask, targets, target_mask, k=1)
    return idx[:, 0], d2[:, 0]
