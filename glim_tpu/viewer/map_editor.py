"""Point-level map editor (headless API).

Equivalent capability to the reference's ``MapEditor`` + ``PointsSelector``
(reference: src/glim/viewer/map_editor.cpp:19-24,
viewer/editor/points_selector.cpp:8-56, editor/map_cell.cpp 2 m cells):
cell-partitioned map points, radius / box selection, statistical outlier
removal, min-cut and region-growing object segmentation, selection deletion,
and writing the edited submaps back to a dump. Selection state is index-based
so front-ends (CLI / notebook / rviz) can drive it interactively.
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

import jax.numpy as jnp
import numpy as np

from glim_tpu.io.dump import load_dump, save_dump
from glim_tpu.ops import covariance as cov_ops
from glim_tpu.ops import knn
from glim_tpu.ops import segmentation as seg
from glim_tpu.types import PointBatch, SubMap
from glim_tpu.utils.logging import create_module_logger

logger = create_module_logger("editor")

CELL_SIZE = 2.0  # reference map_cell.cpp cell size


class MapEditor:
    def __init__(self):
        self.submaps: List[SubMap] = []
        self.poses: List[np.ndarray] = []
        self._factors = None
        # Flattened world-frame view: (N, 3) + (N,) submap index + local index.
        self.points = np.zeros((0, 3))
        self.owner = np.zeros(0, np.int32)
        self.local_idx = np.zeros(0, np.int32)
        self.selected: Set[int] = set()
        self.deleted: Set[int] = set()
        self.cells: Dict[Tuple[int, int, int], np.ndarray] = {}

    # -- IO --

    def open(self, dump_path: str) -> None:
        self.submaps, self.poses, self._factors = load_dump(dump_path)
        pts, owner, lidx = [], [], []
        for k, (sm, T) in enumerate(zip(self.submaps, self.poses)):
            m = np.asarray(sm.frame.mask)
            local = np.asarray(sm.frame.points)[m]
            world = (np.asarray(T)[:3, :3] @ local.T).T + np.asarray(T)[:3, 3]
            pts.append(world)
            owner.append(np.full(len(world), k, np.int32))
            lidx.append(np.where(m)[0].astype(np.int32))
        self.points = np.concatenate(pts) if pts else np.zeros((0, 3))
        self.owner = np.concatenate(owner) if owner else np.zeros(0, np.int32)
        self.local_idx = np.concatenate(lidx) if lidx else np.zeros(0, np.int32)
        self._rebuild_cells()
        logger.info("map editor: %d points from %d submaps", len(self.points),
                    len(self.submaps))

    def save(self, dump_path: str) -> None:
        """Write edited submaps back (deleted points removed)."""
        deleted_by_sm: Dict[int, Set[int]] = {}
        for g in self.deleted | self.selected:
            deleted_by_sm.setdefault(int(self.owner[g]), set()).add(int(self.local_idx[g]))
        for k, sm in enumerate(self.submaps):
            dels = deleted_by_sm.get(k)
            if not dels:
                continue
            pts = np.asarray(sm.frame.points)
            mask = np.asarray(sm.frame.mask).copy()
            mask[list(dels)] = False
            sm.frame = PointBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask))
        save_dump(dump_path, self.submaps, self.poses, factors=self._factors)

    # -- cells (reference map_cell partitioning) --

    def _rebuild_cells(self) -> None:
        self.cells = {}
        keys = np.floor(self.points / CELL_SIZE).astype(np.int64)
        for i, k in enumerate(map(tuple, keys)):
            self.cells.setdefault(k, []).append(i)
        self.cells = {k: np.asarray(v) for k, v in self.cells.items()}

    def cells_near(self, center: np.ndarray, radius: float) -> np.ndarray:
        """Candidate point indices from cells within radius of center."""
        c0 = np.floor((np.asarray(center) - radius) / CELL_SIZE).astype(int)
        c1 = np.floor((np.asarray(center) + radius) / CELL_SIZE).astype(int)
        out = []
        for x in range(c0[0], c1[0] + 1):
            for y in range(c0[1], c1[1] + 1):
                for z in range(c0[2], c1[2] + 1):
                    idx = self.cells.get((x, y, z))
                    if idx is not None:
                        out.append(idx)
        return np.concatenate(out) if out else np.zeros(0, np.int64)

    # -- selection --

    def select_radius(self, center, radius: float) -> int:
        cand = self.cells_near(center, radius)
        if not len(cand):
            return 0
        d = np.linalg.norm(self.points[cand] - np.asarray(center), axis=1)
        sel = cand[d < radius]
        self.selected.update(int(i) for i in sel)
        return len(sel)

    def select_box(self, T_box: np.ndarray, extents) -> int:
        """Gizmo-box selection: T_box places a box of half-extents `extents`."""
        Ti = np.linalg.inv(np.asarray(T_box))
        local = (Ti[:3, :3] @ self.points.T).T + Ti[:3, 3]
        inside = np.all(np.abs(local) <= np.asarray(extents), axis=1)
        sel = np.where(inside)[0]
        self.selected.update(int(i) for i in sel)
        return len(sel)

    def select_outliers(self, k: int = 10, std_mul: float = 1.0,
                        cap: int = 131072) -> int:
        """Statistical outlier selection over the merged map."""
        n = min(len(self.points), cap)
        pts = np.zeros((cap, 3), np.float32)
        pts[:n] = self.points[:n]
        mask = np.zeros(cap, bool)
        mask[:n] = True
        _, d2 = knn.knn_self(jnp.asarray(pts), jnp.asarray(mask), k)
        keep = cov_ops.outlier_mask(d2, jnp.asarray(mask), std_mul)
        bad = np.where(np.asarray(mask) & ~np.asarray(keep))[0]
        self.selected.update(int(i) for i in bad)
        return len(bad)

    def select_segmentation(self, seed_point, method: str = "min_cut",
                            radius: float = 10.0, cap: int = 16384) -> int:
        """Object selection by segmentation around a clicked point."""
        cand = self.cells_near(seed_point, radius)
        if not len(cand):
            return 0
        cand = cand[:cap]
        n = len(cand)
        pts = np.zeros((cap, 3), np.float32)
        pts[:n] = self.points[cand]
        mask = np.zeros(cap, bool)
        mask[:n] = True
        d = np.linalg.norm(pts[:n] - np.asarray(seed_point), axis=1)
        seed_local = int(np.argmin(d))
        if method == "region_growing":
            nbr, _ = knn.knn_self(jnp.asarray(pts), jnp.asarray(mask), 10)
            _, normals = cov_ops.estimate_covariances(jnp.asarray(pts),
                                                      jnp.asarray(mask), nbr, "plane")
            lab = seg.region_growing(jnp.asarray(pts), normals, jnp.asarray(mask),
                                     seed_local)
        else:
            lab = seg.min_cut(jnp.asarray(pts), jnp.asarray(mask), seed_local)
        sel = cand[np.where(lab[:n])[0]]
        self.selected.update(int(i) for i in sel)
        return len(sel)

    def clear_selection(self) -> None:
        self.selected.clear()

    def num_selected(self) -> int:
        return len(self.selected)

    def delete_selected(self) -> int:
        """Mark selected points deleted (persisted on save; indices refer to
        the original flattened layout so owner/local maps stay aligned)."""
        n = len(self.selected)
        self.deleted |= self.selected
        self.selected = set()
        return n
