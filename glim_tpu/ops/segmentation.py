"""Point-cloud segmentation: min-cut and region growing.

Equivalents of the gtsam_points segmentation utilities used by the map editor
for object removal (reference usage: src/glim/viewer/editor/points_selector.cpp
— ``min_cut``, ``region_growing_init/update`` with MinCutParams /
RegionGrowingParams).

- Region growing runs ON DEVICE as iterative label propagation over the kNN
  graph (a few tens of masked gather/compare rounds instead of a sequential
  BFS — each round relabels the whole frontier at once).
- Min-cut builds the capacity graph on device (kNN + Gaussian edge weights)
  and solves max-flow on host via scipy (editor tooling, not a hot path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.ops.knn import knn_self


@dataclass
class RegionGrowingParams:
    k_neighbors: int = 10
    angle_threshold: float = 0.35        # rad between normals
    distance_threshold: float = 0.5      # m
    max_iterations: int = 100


@dataclass
class MinCutParams:
    k_neighbors: int = 10
    distance_sigma: float = 0.25
    foreground_radius: float = 3.0       # points beyond this lean background
    background_weight: float = 0.2


@dataclass
class RegionGrowingContext:
    """Incremental region-growing state (region_growing_init/update API)."""

    labels: jnp.ndarray        # (C,) bool — grown region
    neighbors: jnp.ndarray     # (C, k)
    ok: jnp.ndarray            # (C, k) — edge admissibility
    converged: bool = False


def region_growing_init(points: jnp.ndarray, normals: jnp.ndarray,
                        mask: jnp.ndarray, seed_index: int,
                        params: Optional[RegionGrowingParams] = None
                        ) -> RegionGrowingContext:
    p = params or RegionGrowingParams()
    nbr, d2 = knn_self(points, mask, p.k_neighbors)
    cos_thresh = float(np.cos(p.angle_threshold))
    n_dot = jnp.abs(jnp.einsum("ci,cki->ck", normals, normals[nbr]))
    ok = (mask[:, None] & mask[nbr]
          & (d2 < p.distance_threshold ** 2)
          & (n_dot > cos_thresh))
    labels = jnp.zeros(points.shape[0], bool).at[seed_index].set(True)
    return RegionGrowingContext(labels=labels, neighbors=nbr, ok=ok)


@jax.jit
def _propagate(labels, neighbors, ok):
    neigh_lab = labels[neighbors] & ok
    return labels | jnp.any(neigh_lab, axis=-1)


def region_growing_update(ctx: RegionGrowingContext,
                          rounds: int = 8) -> RegionGrowingContext:
    """Run up to `rounds` propagation rounds; sets ctx.converged when the
    region stops growing."""
    labels = ctx.labels
    for _ in range(rounds):
        new = _propagate(labels, ctx.neighbors, ctx.ok)
        if bool(jnp.all(new == labels)):
            return RegionGrowingContext(labels=new, neighbors=ctx.neighbors,
                                        ok=ctx.ok, converged=True)
        labels = new
    return RegionGrowingContext(labels=labels, neighbors=ctx.neighbors,
                                ok=ctx.ok, converged=False)


def region_growing(points, normals, mask, seed_index,
                   params: Optional[RegionGrowingParams] = None) -> np.ndarray:
    """Convenience: run region growing to convergence; returns bool mask."""
    p = params or RegionGrowingParams()
    ctx = region_growing_init(points, normals, mask, seed_index, p)
    for _ in range(p.max_iterations):
        ctx = region_growing_update(ctx)
        if ctx.converged:
            break
    return np.asarray(ctx.labels)


def min_cut(points: jnp.ndarray, mask: jnp.ndarray, seed_index: int,
            params: Optional[MinCutParams] = None) -> np.ndarray:
    """Foreground/background min-cut segmentation around a seed point.

    Returns a bool foreground mask over the padded cloud."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import maximum_flow

    p = params or MinCutParams()
    nbr, d2 = knn_self(points, mask, p.k_neighbors)
    pts = np.asarray(points)
    msk = np.asarray(mask)
    nbrn = np.asarray(nbr)
    d2n = np.asarray(d2)
    C = len(pts)
    seed_pt = pts[seed_index]

    # Edge capacities: Gaussian in distance (smoothness term), scaled to ints
    # for scipy's integer max-flow.
    SCALE = 1000.0
    rows, cols, caps = [], [], []
    w_edge = np.exp(-d2n / (2 * p.distance_sigma ** 2))
    for k in range(nbrn.shape[1]):
        j = nbrn[:, k]
        valid = msk & msk[j] & (j != np.arange(C)) & np.isfinite(d2n[:, k])
        rows.append(np.arange(C)[valid])
        cols.append(j[valid])
        caps.append((w_edge[valid, k] * SCALE).astype(np.int32) + 1)
    # Terminal edges (PCL-style min-cut priors): the SOURCE feeds the seed's
    # neighborhood with capacity decaying with distance (foreground prior —
    # source->seed-only would just saturate the seed's few kNN edges), and
    # every point drains to the SINK with capacity growing with distance
    # (background prior).
    dist_seed = np.linalg.norm(pts - seed_pt, axis=1)
    sigma_f = max(p.foreground_radius, 1e-6) / 2.0
    fg_w = np.exp(-(dist_seed / sigma_f) ** 2)
    bg = p.background_weight * (dist_seed / max(p.foreground_radius, 1e-6))
    vr = np.where(msk)[0]
    rows.append(np.full(len(vr), C))
    cols.append(vr)
    caps.append((fg_w[vr] * SCALE).astype(np.int32) + 1)
    rows.append(np.asarray([C]))
    cols.append(np.asarray([seed_index]))
    caps.append(np.asarray([np.int32(1e7)]))
    rows.append(vr)
    cols.append(np.full(len(vr), C + 1))
    caps.append((bg[vr] * SCALE).astype(np.int32) + 1)

    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    caps = np.concatenate(caps)
    graph = coo_matrix((caps, (rows, cols)), shape=(C + 2, C + 2)).tocsr()
    res = maximum_flow(graph, C, C + 1)
    # Foreground = reachable from source in the residual graph.
    residual = graph - res.flow
    from scipy.sparse.csgraph import breadth_first_order
    reach, _ = breadth_first_order(residual > 0, C, directed=True,
                                   return_predecessors=True)
    fg = np.zeros(C + 2, bool)
    fg[reach] = True
    return fg[:C] & msk
