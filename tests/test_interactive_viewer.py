"""Interactive correction loop: manual loop closure on a drifted map must
pull the trajectory back toward ground truth (the reference
InteractiveViewer workflow — manual_loop_close_modal.cpp:38-64 aligns two
picked submaps and injects a BetweenFactor; interactive_viewer.cpp:405-418
inserts it and re-solves)."""

import numpy as np
import pytest

from glim_tpu.mapping.global_mapping import GlobalMapping, GlobalMappingParams
from glim_tpu.tools.backend_stress import _true_xy, make_submap, ring_world
from glim_tpu.ops import lie_np
from glim_tpu.utils.callbacks import CallbackSlot
from glim_tpu.viewer.interactive_viewer import (InteractiveViewer,
                                                execute_command)

N = 10
STEP = 6.0


def build_drifted_ring(drift_trans=0.09, drift_rot=4e-3, seed=3):
    """A lap of N submaps whose odometry chain drifts — and NO automatic
    loop factors (implicit-loop search disabled), so only a manual closure
    can fix the gap."""
    rng = np.random.default_rng(seed)
    radius = N * STEP / (2 * np.pi)
    world = ring_world(rng, radius, max(N, 8))
    gm = GlobalMapping(GlobalMappingParams(
        enable_optimization=False,
        submap_voxel_resolution=0.5, voxel_capacity=16384,
        max_implicit_loop_distance=0.0,     # no automatic loop factors
        use_device_mesh=False))
    drift = lie_np.se3_exp(np.array([0, 0, drift_rot, drift_trans, 0, 0]))
    T_true_prev = None
    T_odom = np.eye(4)
    for k in range(N):
        ang = 2 * np.pi * k / N
        T_true = np.eye(4)
        T_true[:2, 3] = radius * np.cos(ang), radius * np.sin(ang)
        yaw = ang + np.pi / 2
        T_true[:2, :2] = [[np.cos(yaw), -np.sin(yaw)],
                          [np.sin(yaw), np.cos(yaw)]]
        if T_true_prev is None:
            T_odom = T_true
        else:
            T_odom = T_odom @ np.linalg.inv(T_true_prev) @ T_true @ drift
        T_true_prev = T_true
        sm = make_submap(rng, k, world, T_true)
        sm.T_world_origin = T_odom
        gm.insert_submap(sm)
    return gm, radius


def _true_pose(k, radius):
    ang = 2 * np.pi * k / N
    T = np.eye(4)
    T[:2, 3] = radius * np.cos(ang), radius * np.sin(ang)
    yaw = ang + np.pi / 2
    T[:2, :2] = [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
    return T


def ring_ate(poses, radius):
    errs = [float(np.linalg.norm(np.asarray(poses[i])[:2, 3]
                                 - _true_xy(i, N, radius)))
            for i in range(len(poses))]
    return float(np.sqrt(np.mean(np.square(errs))))


@pytest.fixture(autouse=True)
def _clean_slots():
    yield
    CallbackSlot.clear_all()


class TestManualLoopClose:
    def test_correction_improves_drifted_dump(self, tmp_path):
        gm, radius = build_drifted_ring()
        dump = str(tmp_path / "drifted")
        gm.save(dump)

        viewer = InteractiveViewer.open(dump)
        assert len(viewer.gm.submaps) == N
        ate_before = ring_ate(viewer.gm.poses, radius)
        assert ate_before > 0.15            # the drift is material

        # The correction: close the lap between the first and last submap.
        res = viewer.loop_close(0, N - 1)
        assert res is not None
        assert res.inlier_fraction >= 0.3
        assert res.information is not None and res.information.shape == (6, 6)

        # One manual closure pins BOTH endpoints to truth and redistributes
        # the systematic odometry drift around the ring (the graph optimum:
        # pre-closure error grows linearly to the lap end; post-closure it
        # is parabolic with half the peak). Assert exactly that: the closed
        # pair's relative pose snaps to truth, and global ATE drops.
        ate_after = ring_ate(viewer.gm.poses, radius)
        assert ate_after < 0.85 * ate_before
        T_rel = np.linalg.inv(viewer.gm.poses[0]) @ viewer.gm.poses[N - 1]
        T_rel_true = np.linalg.inv(_true_pose(0, radius)) \
            @ _true_pose(N - 1, radius)
        gap = np.linalg.norm(T_rel[:3, 3] - T_rel_true[:3, 3])
        # pre-closure endpoint gap was the full accumulated drift (~0.4 m)
        assert gap < 0.06
        # The viewer surface reflects the new edge.
        assert viewer.factor_summary()["between"] == \
            len(viewer.gm.between_factors)

    def test_command_dispatcher(self, tmp_path):
        gm, radius = build_drifted_ring()
        viewer = InteractiveViewer(gm)
        out = execute_command(viewer, {"cmd": "list"})
        assert out["ok"] and len(out["submaps"]) == N
        out = execute_command(viewer, {"cmd": "factors"})
        assert out["ok"] and out["submaps"] == N
        out = execute_command(viewer, {"cmd": "loop_close",
                                       "target": 0, "source": N - 1})
        assert out["ok"] and out["inlier_fraction"] >= 0.3
        out = execute_command(viewer, {"cmd": "nonsense"})
        assert not out["ok"]

    def test_live_injection_via_request_slot(self):
        """A correction issued WHILE the async backend runs lands in the
        graph through request_to_add_between (the live-run path glim_runner
        --commands drives)."""
        from glim_tpu.mapping.async_global_mapping import AsyncGlobalMapping
        from glim_tpu.mapping.callbacks import GlobalMappingCallbacks as CB

        gm, radius = build_drifted_ring()
        n_between = len(gm.between_factors)
        async_gm = AsyncGlobalMapping(gm, optimization_interval=1e9)
        try:
            T = np.linalg.inv(gm.poses[0]) @ gm.poses[N - 1]
            CB.request_to_add_between(0, N - 1, T, np.eye(6) * 1e4)
            deadline = 50.0
            import time
            t0 = time.time()
            while len(gm.between_factors) == n_between \
                    and time.time() - t0 < deadline:
                time.sleep(0.05)
            assert len(gm.between_factors) == n_between + 1
            tgt, src, Z, info = gm.between_factors[-1]
            assert (tgt, src) == (0, N - 1)
            assert np.allclose(Z, T)
        finally:
            async_gm.join()
