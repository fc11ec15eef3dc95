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


class TestBundleAdjustCommand:
    """The bundle-adjustment correction issued through the command channel
    (reference BundleAdjustmentModal -> interactive_viewer.cpp:405-418;
    VERDICT r4 item 8): a region pick by center+radius flattens a plane
    warped by pose drift."""

    def _warped_plane_map(self, seed=8, n_sub=4, z_step=0.08):
        """n_sub submaps along x, all observing the SAME world ground
        plane (plus pillars for conditioning); the recorded poses carry a
        growing z error, so the assembled world plane is a staircase."""
        rng = np.random.default_rng(seed)
        from glim_tpu.types import PointBatch, SubMap
        import jax.numpy as jnp
        gm = GlobalMapping(GlobalMappingParams(
            enable_optimization=False, enable_imu=False,
            submap_voxel_resolution=0.5, voxel_capacity=8192,
            max_implicit_loop_distance=0.0,      # no automatic loop factors
            use_device_mesh=False))
        cap = 768
        for k in range(n_sub):
            T_true = np.eye(4)
            T_true[0, 3] = 2.0 * k
            # Ground-plane patch in WORLD coords around this submap.
            gxy = rng.uniform(-3, 3, (500, 2)) + [2.0 * k, 0]
            ground = np.concatenate([gxy, np.zeros((500, 1))], axis=1)
            # Pillars OUTSIDE the pick region (y = 4.5) so the spherical
            # region select below collects only the plane.
            pillar = np.stack([np.full(100, 2.0 * k + 1.0)
                               + rng.normal(0, 0.03, 100),
                               np.full(100, 4.5) + rng.normal(0, 0.03, 100),
                               rng.uniform(0, 2, 100)], axis=1)
            world_pts = np.concatenate([ground, pillar])
            Ti = np.linalg.inv(T_true)
            local = (Ti[:3, :3] @ world_pts.T).T + Ti[:3, 3]
            pts = np.zeros((cap, 3), np.float32)
            pts[:len(local)] = local + rng.normal(0, 0.004, local.shape)
            mask = np.zeros(cap, bool)
            mask[:len(local)] = True
            # Recorded (drifted) pose: growing z error warps the plane.
            T_bad = T_true.copy()
            T_bad[2, 3] = z_step * k
            gm.insert_submap(SubMap(
                id=k, T_world_origin=T_bad,
                frame=PointBatch(points=jnp.asarray(pts),
                                 mask=jnp.asarray(mask), covs=None)))
        return gm

    def test_flattens_warped_plane_via_command(self):
        gm = self._warped_plane_map()
        viewer = InteractiveViewer(gm, live=False)
        out = execute_command(viewer, {
            "cmd": "bundle_adjust", "center": [3.0, 0.0, 0.1],
            "radius": 4.0, "mode": "plane"})
        assert out["ok"], out
        assert out["thickness_after_m"] < 0.5 * out["thickness_before_m"], out
        assert out["factors_added"] >= 2
        # The graph absorbed the correction: the region's world-frame plane
        # (recomputed from the RE-OPTIMIZED graph poses, not the BA's
        # internal refinement) is flatter than the warped input. An EVM
        # plane factor fixes coplanarity, not the gauge — a compensating
        # tilt is a valid flat solution — so flatness, not pose z-spread,
        # is the contract (reference bundle_adjustment_modal.cpp:17-60).
        def region_thickness():
            world = []
            for k, sm in enumerate(gm.submaps):
                T = np.asarray(gm.poses[k], np.float64)
                pts = np.asarray(sm.frame.points)[np.asarray(sm.frame.mask)]
                w = pts @ T[:3, :3].T + T[:3, 3]
                keep = np.linalg.norm(w - [3.0, 0.0, 0.1], axis=1) < 4.0
                world.append(w[keep])
            world = np.concatenate(world)
            d = world - world.mean(axis=0)
            S = d.T @ d / len(world)
            return float(np.sqrt(max(np.linalg.eigvalsh(S)[0], 0.0)))

        flat = region_thickness()
        assert flat < 0.6 * out["thickness_before_m"], \
            (flat, out["thickness_before_m"])

    def test_region_with_one_submap_rejected(self):
        gm = self._warped_plane_map()
        viewer = InteractiveViewer(gm, live=False)
        out = execute_command(viewer, {
            "cmd": "bundle_adjust", "center": [100.0, 0.0, 0.0],
            "radius": 1.0})
        assert not out["ok"]


class TestRuntimeControls:
    """Live runtime controls (reference standard_viewer_ui.cpp enable/
    disable checkboxes + playback control): module toggles through the
    command channel, pause/resume/step through the runner's poller."""

    def test_set_enabled_toggles(self):
        gm, _ = build_drifted_ring()
        viewer = InteractiveViewer(gm, live=False)
        st = execute_command(viewer, {"cmd": "status"})
        # build_drifted_ring constructs with enable_optimization=False.
        assert st["ok"] and not st["global_optimization"] \
            and st["loop_detection"]

        out = execute_command(viewer, {"cmd": "set_enabled",
                                       "target": "global_optimization",
                                       "value": True})
        assert out["ok"] and out["previous"] is False
        assert gm.params.enable_optimization is True
        out = execute_command(viewer, {"cmd": "set_enabled",
                                       "target": "global_optimization",
                                       "value": False})
        assert out["ok"] and out["previous"] is True
        assert gm.params.enable_optimization is False
        out = execute_command(viewer, {"cmd": "set_enabled",
                                       "target": "loop_detection",
                                       "value": False})
        assert out["ok"]
        assert gm.loop_search_enabled is False
        st = execute_command(viewer, {"cmd": "status"})
        assert not st["global_optimization"] and not st["loop_detection"]
        assert not execute_command(viewer, {"cmd": "set_enabled",
                                            "target": "nope"})["ok"]

    def test_loop_search_disabled_only_chains_odometry(self):
        """With loop search off, a submap landing on top of an old one gets
        ONLY its odometry-neighbor factor (no implicit loop)."""
        rng = np.random.default_rng(9)
        radius = N * STEP / (2 * np.pi)
        world = ring_world(rng, radius, max(N, 8))
        gm = GlobalMapping(GlobalMappingParams(
            enable_optimization=False, submap_voxel_resolution=0.5,
            voxel_capacity=16384, max_implicit_loop_distance=1e9,
            min_implicit_loop_overlap=0.01, use_device_mesh=False))
        gm.loop_search_enabled = False
        for k in [0, 1, 0]:        # third submap revisits the first's spot
            sm = make_submap(rng, len(gm.submaps), world, _true_pose(k, radius))
            gm.insert_submap(sm)
        # Only consecutive pairs; the (0, 2) revisit is NOT linked.
        assert all(abs(t - s) == 1 for t, s in gm.matching_factors), \
            gm.matching_factors
        gm.loop_search_enabled = True
        sm = make_submap(rng, 3, world, _true_pose(0, radius))
        gm.insert_submap(sm)
        assert any(abs(t - s) > 1 for t, s in gm.matching_factors), \
            gm.matching_factors

    def test_playback_pause_step_resume(self, tmp_path):
        """The runner poller's playback-control protocol: pause blocks the
        feed gate, step grants one scan, resume unblocks."""
        import threading
        import time as _time

        from glim_tpu.tools.glim_runner import (_make_command_poller,
                                                _playback_gate)

        gm, _ = build_drifted_ring()

        class _Glim:      # poller only touches .global_mapping
            global_mapping = gm

        path = tmp_path / "commands.jsonl"
        controls = {"paused": False, "step": 0}
        poll = _make_command_poller(_Glim(), str(path), controls)

        with open(path, "a") as f:
            f.write('{"cmd": "pause"}\n')
        poll()
        assert controls["paused"]

        # A gated feed thread stays blocked until step/resume arrives.
        passed = []

        def feed():
            _playback_gate(controls, poll)
            passed.append(_time.monotonic())

        th = threading.Thread(target=feed)
        th.start()
        _time.sleep(0.25)
        assert not passed, "gate let a scan through while paused"
        with open(path, "a") as f:
            f.write('{"cmd": "step", "n": 1}\n')
        th.join(timeout=10.0)
        assert passed and controls["paused"] and controls["step"] == 0

        # resume: the gate no longer blocks at all.
        with open(path, "a") as f:
            f.write('{"cmd": "resume"}\n')
        poll()
        assert not controls["paused"]
        t0 = _time.monotonic()
        _playback_gate(controls, poll)
        assert _time.monotonic() - t0 < 0.2
