"""Offline tooling tests: manual loop close, bundle adjustment, offline
viewer, map editor."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from glim_tpu.io.dump import save_dump
from glim_tpu.ops import lie_np
from glim_tpu.types import EstimationFrame, PointBatch, SubMap
from glim_tpu.viewer.interactive_tools import (BundleAdjustment, ManualLoopClose,
                                               PlaneSelection)
from glim_tpu.viewer.map_editor import MapEditor
from glim_tpu.viewer.offline_viewer import OfflineViewer


def corner_submap(rng, sid, T_world=None, n=600, cap=1024, noise=0.01):
    pts = np.zeros((cap, 3), np.float32)
    k = n // 4
    pts[:k, :2] = rng.uniform(0, 8, (k, 2))
    pts[k:2 * k, 0] = rng.uniform(0, 8, k)
    pts[k:2 * k, 2] = rng.uniform(0, 4, k)
    pts[2 * k:3 * k, 1] = rng.uniform(0, 8, k)
    pts[2 * k:3 * k, 2] = rng.uniform(0, 4, k)
    # 3D clutter so FPFH has salient, matchable descriptors (pure planes are
    # descriptor-degenerate and leave in-plane ambiguity to the refinement).
    # Centers and sizes are deliberately asymmetric: near-symmetric layouts
    # give global registration a legitimate second mode (a flip).
    centers = np.array([[2.0, 0.8, 1.0], [6.5, 1.5, 0.4], [1.2, 5.5, 2.2],
                        [7.3, 6.8, 0.9], [4.1, 2.6, 1.6]])
    sizes = np.array([0.2, 0.5, 0.3, 0.15, 0.45])
    ci = rng.integers(0, len(centers), n - 3 * k)
    pts[3 * k:n] = centers[ci] + rng.normal(size=(n - 3 * k, 3)) * sizes[ci, None]
    pts[:n] += rng.normal(size=(n, 3)) * noise
    if T_world is not None:
        Ti = np.linalg.inv(T_world)
        pts[:n] = (Ti[:3, :3] @ pts[:n].T).T + Ti[:3, 3]
    mask = np.zeros(cap, bool)
    mask[:n] = True
    covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.02, (cap, 3, 3)).copy()
    sm = SubMap(id=sid, T_world_origin=np.eye(4) if T_world is None else T_world,
                frame=PointBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                                 covs=jnp.asarray(covs)))
    sm.frames = [EstimationFrame(id=sid, stamp=float(sid))]
    sm.odom_frames = [sm.frames[0].clone()]
    return sm


@pytest.mark.slow
class TestManualLoopClose:
    def test_align_recovers_transform(self, rng):
        target = corner_submap(rng, 0, n=2000, cap=2048)
        xi = np.array([0, 0, 0.4, 1.5, -1.0, 0.2])
        T_true = lie_np.se3_exp(xi)
        # Source observes the same corner from a displaced pose.
        source = corner_submap(rng, 1, T_world=T_true, n=2000, cap=2048)
        mlc = ManualLoopClose()
        res = mlc.align(target, source, method="GNC")
        err = lie_np.se3_log(np.linalg.inv(T_true) @ res.T_target_source)
        assert np.linalg.norm(err[3:]) < 0.1, err
        assert res.inlier_fraction > 0.7


class TestBundleAdjustment:
    def test_coplanarity_restored(self, rng):
        # Two submaps each selecting points from the SAME world plane z=0, but
        # submap 1's pose has a small z offset -> plane residual; BA fixes it.
        sel0 = rng.uniform(-5, 5, (60, 2))
        sel1 = rng.uniform(-5, 5, (60, 2))
        p0 = np.concatenate([sel0, np.zeros((60, 1))], axis=1)
        p1 = np.concatenate([sel1, np.zeros((60, 1))], axis=1)
        T0 = np.eye(4)
        T1 = np.eye(4)
        T1[2, 3] = 0.3      # erroneous elevation
        ba = BundleAdjustment(iterations=15)
        poses = ba.optimize([None, None], [T0, T1],
                            [[PlaneSelection(0, p0), PlaneSelection(1, p1)]])
        # After BA, the two selections should be coplanar: z offset removed.
        assert abs(poses[1][2, 3]) < 0.1, poses[1]


class TestOfflineViewer:
    def make_dump(self, rng, tmp_path, name, offset=0.0):
        submaps = []
        poses = []
        for i in range(2):
            T = np.eye(4)
            T[0, 3] = 2.0 * i + offset
            sm = corner_submap(rng, i, n=400, cap=512)
            sm.T_world_origin = T
            submaps.append(sm)
            poses.append(T)
        d = str(tmp_path / name)
        save_dump(d, submaps, poses,
                  factors=dict(i=[0], j=[1], Z=[np.eye(4)], info=[np.ones(6)],
                               huber=[-1.0]))
        return d

    def test_open_optimize_export(self, rng, tmp_path):
        d = self.make_dump(rng, tmp_path, "dump_a")
        ov = OfflineViewer()
        ov.open_map(d)
        assert len(ov.global_mapping.submaps) == 2
        ov.optimize()
        ply = str(tmp_path / "map.ply")
        ov.export_ply(ply)
        assert os.path.getsize(ply) > 1000
        out = str(tmp_path / "dump_out")
        ov.save(out)
        assert os.path.exists(os.path.join(out, "graph.txt"))

    def test_merge_two_sessions(self, rng, tmp_path):
        da = self.make_dump(rng, tmp_path, "dump_a")
        db = self.make_dump(rng, tmp_path, "dump_b", offset=1.0)
        ov = OfflineViewer()
        ov.open_map(da)
        ov.merge_map(db)
        assert len(ov.global_mapping.submaps) == 4
        assert ov.global_mapping.submaps[2].session_id == 1


class TestMapEditor:
    def make_dump(self, rng, tmp_path):
        sm = corner_submap(rng, 0, n=500, cap=512)
        # Plant an outlier blob far away.
        pts = np.asarray(sm.frame.points).copy()
        pts[490:500] = np.array([50.0, 50.0, 50.0]) + rng.normal(size=(10, 3))
        sm.frame = PointBatch(points=jnp.asarray(pts), mask=sm.frame.mask)
        d = str(tmp_path / "dump")
        save_dump(d, [sm], [np.eye(4)])
        return d

    def test_select_and_delete(self, rng, tmp_path):
        d = self.make_dump(rng, tmp_path)
        ed = MapEditor()
        ed.open(d)
        assert len(ed.points) == 500
        n = ed.select_radius(np.array([50.0, 50.0, 50.0]), 5.0)
        assert n == 10
        assert ed.delete_selected() == 10
        out = str(tmp_path / "edited")
        ed.save(out)
        ed2 = MapEditor()
        ed2.open(out)
        assert len(ed2.points) == 490

    def test_box_selection(self, rng, tmp_path):
        d = self.make_dump(rng, tmp_path)
        ed = MapEditor()
        ed.open(d)
        T_box = np.eye(4)
        T_box[:3, 3] = [50, 50, 50]
        n = ed.select_box(T_box, [5.0, 5.0, 5.0])
        assert n == 10

    def test_outlier_selection(self, rng, tmp_path):
        d = self.make_dump(rng, tmp_path)
        ed = MapEditor()
        ed.open(d)
        n = ed.select_outliers(k=8, std_mul=2.0, cap=512)
        sel = np.asarray(sorted(ed.selected))
        # The far blob should be among the outliers.
        assert (sel >= 490).sum() >= 5


class TestBackendStress:
    @pytest.mark.slow
    def test_small_ring(self):
        """Backend stress harness: a small drifting ring lap must close
        (final ATE bounded) and per-insert wall must stay bounded."""
        from glim_tpu.tools.backend_stress import run
        rows = run(n_submaps=12, interval=4)
        assert rows[-1]["submaps"] == 12
        assert rows[-1]["factors"] >= 12
        assert rows[-1]["ate_rmse_m"] < 0.5
