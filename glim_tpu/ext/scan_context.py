"""ScanContext-style explicit loop detection extension.

Role model: glim_ext's scan_context_loop_detector (an explicit
place-recognition detector feeding loop candidates to the global mapping,
complementing the proximity-based implicit search). The descriptor follows
the ScanContext idea (Kim & Kim, IROS 2018): a polar ring x sector grid of
max point height, compared with a rotation-invariant (sector-shifted)
cosine distance, pre-filtered by a ring-key (per-ring occupancy) nearest
search.

TPU-first shape: the descriptor build is one jitted segment-max over the
padded point batch; the candidate distance evaluates ALL sector shifts at
once as a (S, R, S) broadcast — at 20x60 this is microscopic device work
riding alongside the mapping backend's dispatches.

Wiring: subscribes ``GlobalMappingCallbacks.on_new_submap``, fires
``request_to_add_loop(tgt, src)`` for accepted matches — serviced by
AsyncGlobalMapping for both backends (matching-cost: new matching factor;
pose_graph: registration-validated candidate).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from glim_tpu.mapping.callbacks import GlobalMappingCallbacks as GCB
from glim_tpu.utils.extension_module import ExtensionModule
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("scan_ctx")


@partial(jax.jit, static_argnames=("n_rings", "n_sectors"))
def scan_context_descriptor(points: jnp.ndarray, mask: jnp.ndarray,
                            max_range, *, n_rings: int = 20,
                            n_sectors: int = 60) -> jnp.ndarray:
    """(R, S) descriptor: max z per polar cell (0 where empty).

    ``points`` (N, 3) in the submap's local frame (approximately gravity
    aligned), ``mask`` (N,) validity. One segment-max over ring*sector ids.
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = jnp.sqrt(x * x + y * y)
    ring = jnp.clip((r / max_range * n_rings).astype(jnp.int32),
                    0, n_rings - 1)
    sector = jnp.clip(((jnp.arctan2(y, x) + jnp.pi) / (2 * jnp.pi)
                       * n_sectors).astype(jnp.int32), 0, n_sectors - 1)
    cell = ring * n_sectors + sector
    valid = mask & (r < max_range)
    # segment-max of z, empty cells at 0 (heights below the sensor clamp to
    # 0 as in the original descriptor's ground-level floor).
    zc = jnp.where(valid, jnp.maximum(z, 0.0), -1.0)
    cell = jnp.where(valid, cell, n_rings * n_sectors)
    desc = jax.ops.segment_max(zc, cell,
                               num_segments=n_rings * n_sectors + 1,
                               indices_are_sorted=False)[:-1]
    return jnp.maximum(desc, 0.0).reshape(n_rings, n_sectors)


@jax.jit
def sc_distance(d1: jnp.ndarray, d2: jnp.ndarray):
    """Rotation-invariant ScanContext distance: min over sector shifts of
    the mean column cosine distance. Returns (distance, best_shift)."""
    R, S = d1.shape
    shifts = jnp.arange(S)
    cols2 = jnp.stack([jnp.roll(d2, s, axis=1) for s in range(S)])  # (S,R,S)
    num = jnp.sum(d1[None] * cols2, axis=1)                          # (S,S)
    den = (jnp.linalg.norm(d1, axis=0)[None]
           * jnp.linalg.norm(cols2, axis=1) + 1e-9)                  # (S,S)
    # columns where either descriptor is empty are skipped (as in SC).
    occ = ((jnp.linalg.norm(d1, axis=0)[None] > 1e-6)
           & (jnp.linalg.norm(cols2, axis=1) > 1e-6))
    colsim = jnp.where(occ, num / den, 0.0)
    n_occ = jnp.maximum(jnp.sum(occ, axis=1), 1)
    dist = 1.0 - jnp.sum(colsim, axis=1) / n_occ                     # (S,)
    best = jnp.argmin(dist)
    return dist[best], shifts[best]


def ring_key(desc: np.ndarray) -> np.ndarray:
    """(R,) occupancy ratio per ring — the fast nearest-neighbour
    pre-filter key."""
    return (np.asarray(desc) > 1e-6).mean(axis=1)


class ScanContextLoopDetector(ExtensionModule):
    """Explicit loop detector over submaps (glim_ext analogue)."""

    def __init__(self, n_rings: int = 20, n_sectors: int = 60,
                 max_range: float = 80.0, distance_threshold: float = 0.25,
                 ring_key_candidates: int = 8, exclude_recent: int = 3):
        self.n_rings = n_rings
        self.n_sectors = n_sectors
        self.max_range = max_range
        self.distance_threshold = distance_threshold
        self.ring_key_candidates = ring_key_candidates
        self.exclude_recent = exclude_recent
        self.descriptors: List[np.ndarray] = []
        self.ring_keys: List[np.ndarray] = []
        self.submap_ids: List[int] = []
        self.matches: List[tuple] = []       # (tgt, src, dist) accepted
        self._handle = GCB.on_insert_submap.add(self._on_new_submap)

    def detach(self) -> None:
        if self._handle is not None:
            GCB.on_insert_submap.remove(self._handle)
            self._handle = None

    # -- detection --

    def _on_new_submap(self, submap) -> None:
        if submap.frame is None or submap.frame.points is None:
            return
        desc = np.asarray(scan_context_descriptor(
            submap.frame.points, submap.frame.mask,
            jnp.float32(self.max_range), n_rings=self.n_rings,
            n_sectors=self.n_sectors))
        cur = len(self.descriptors)
        self.descriptors.append(desc)
        self.ring_keys.append(ring_key(desc))
        self.submap_ids.append(int(submap.id))

        n_hist = cur - self.exclude_recent
        if n_hist <= 0:
            return
        # Ring-key nearest pre-filter (host: tiny L2 over (n_hist, R)).
        keys = np.stack(self.ring_keys[:n_hist])
        d_key = np.linalg.norm(keys - self.ring_keys[cur][None], axis=1)
        cands = np.argsort(d_key)[:self.ring_key_candidates]
        best: Optional[tuple] = None
        d1 = jnp.asarray(desc)
        for j in cands:
            dist, _shift = sc_distance(d1, jnp.asarray(self.descriptors[j]))
            dist = float(dist)
            if dist < self.distance_threshold and \
                    (best is None or dist < best[1]):
                best = (int(j), dist)
        if best is not None:
            tgt, dist = best
            logger.info("ScanContext loop %d -> %d (dist %.3f)",
                        self.submap_ids[tgt], self.submap_ids[cur], dist)
            self.matches.append((tgt, cur, dist))
            GCB.request_to_add_loop(self.submap_ids[tgt],
                                    self.submap_ids[cur])


@register_module("extension", "scan_context")
def create_extension_module(*args, **kwargs):
    from glim_tpu.utils.config import GlobalConfig
    kw = {}
    try:
        cfg = GlobalConfig.instance()
        g = lambda k, d: cfg.param("scan_context", k, d)
        kw = dict(n_rings=int(g("n_rings", 20)),
                  n_sectors=int(g("n_sectors", 60)),
                  max_range=float(g("max_range", 80.0)),
                  distance_threshold=float(g("distance_threshold", 0.25)),
                  ring_key_candidates=int(g("ring_key_candidates", 8)),
                  exclude_recent=int(g("exclude_recent", 3)))
    except Exception:
        pass
    return ScanContextLoopDetector(**kw)
