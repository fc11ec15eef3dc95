"""Auxiliary subsystem tests: IMU validation, data validator, viewer modules,
common-layer front-ends."""

import numpy as np

from glim_tpu.common.cloud_covariance_estimation import CloudCovarianceEstimation
from glim_tpu.common.cloud_deskewing import CloudDeskewing
from glim_tpu.common.imu_integration import IMUIntegration
from glim_tpu.common.imu_validation import IMUValidation, RunningStatistics
from glim_tpu.types import RawPoints
from glim_tpu.utils.data_validator import DataValidator
from glim_tpu.viewer.memory_monitor import MemoryMonitor, read_meminfo
from glim_tpu.viewer.standard_viewer import StandardViewer


class TestRunningStatistics:
    def test_moments(self, rng):
        xs = rng.normal(size=500) * 2.0 + 3.0
        st = RunningStatistics()
        for x in xs:
            st.add(float(x))
        assert abs(st.mean - xs.mean()) < 1e-9
        assert abs(st.var - xs.var(ddof=1)) < 1e-6
        assert st.min == xs.min() and st.max == xs.max()


class TestIMUValidation:
    def test_good_imu_wins(self):
        v = IMUValidation(report_interval=1000)
        T = np.eye(4)
        vel = np.array([1.0, 0, 0])
        for i in range(50):
            T_opt = T.copy()
            T_opt[0, 3] = 0.1 * i
            # IMU prediction exact; CV prediction lags on the first step.
            v.validate(T_opt, vel, T_opt, vel, dt=0.1)
        assert v.rot_wins.mean >= 0.99


class TestIMUIntegration:
    def test_queue_and_integration(self):
        integ = IMUIntegration(capacity=64)
        for i in range(50):
            integ.insert_imu(i * 0.01, [0, 0, 9.80665], [0, 0, 0])
        pre, n = integ.integrate_imu(0.0, 0.3, np.zeros(6))
        assert n >= 29
        assert abs(float(pre.dt) - 0.29) < 0.02
        integ.erase_imu_data(0.2)
        assert integ.find_imu_data(0.0, 0.19).shape[0] == 0

    def test_pose_rate_output(self):
        integ = IMUIntegration()
        for i in range(40):
            integ.insert_imu(i * 0.01, [0, 0, 9.80665], [0, 0, 0.5])
        out = integ.integrate_imu_rate_poses(np.eye(4), np.zeros(3), np.zeros(6),
                                             0.0, 0.35)
        assert out is not None
        stamps, Rs, ps = out
        assert len(stamps) >= 30
        # Yaw accumulates at 0.5 rad/s.
        yaw = np.arctan2(np.asarray(Rs)[-1][1, 0], np.asarray(Rs)[-1][0, 0])
        assert abs(yaw - 0.5 * (stamps[-1] - stamps[0])) < 0.02


class TestCommonFrontends:
    def test_deskew_and_cov(self, rng):
        import jax.numpy as jnp
        pts = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
        mask = jnp.ones(256, bool)
        times = jnp.zeros(256)
        d = CloudDeskewing()
        out = d.deskew_twist(pts, times, mask, np.zeros(6))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)

        from glim_tpu.ops import knn
        nbr, _ = knn.knn_self(pts, mask, 5)
        cce = CloudCovarianceEstimation()
        covs, normals = cce.estimate(pts, mask, nbr)
        assert covs.shape == (256, 3, 3)


class TestDataValidator:
    def test_detects_problems(self):
        dv = DataValidator(report_interval=1e9)
        dv.imu_callback(1.0, np.array([0, 0, 9.8]), np.zeros(3))
        dv.imu_callback(0.5, np.array([0, 0, 9.8]), np.zeros(3))   # rewind
        dv.imu_callback(0.6, np.array([0, 0, 0.1]), np.zeros(3))   # implausible acc
        pts = np.ones((10, 3))
        pts[2] = np.inf
        dv.points_callback(RawPoints(stamp=0.7, points=pts))
        assert dv.num_nonfinite == 1
        dv.timer_callback()


class TestViewerModules:
    def test_standard_viewer_aggregates(self, rng):
        from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks as CB
        from glim_tpu.types import EstimationFrame
        sv = StandardViewer(report_interval=1e9)
        try:
            for i in range(5):
                T = np.eye(4)
                T[0, 3] = float(i)
                CB.on_new_frame(EstimationFrame(id=i, stamp=0.1 * i, T_world_lidar=T))
            snap = sv.snapshot()
            assert len(snap["odom_poses"]) == 5
            np.testing.assert_allclose(snap["odom_poses"][4][0, 3], 4.0)
        finally:
            sv.detach()

    def test_viewer_stream_written_and_replayable(self, rng, tmp_path):
        """The watchable-run artifact: StandardViewer streams .jsonl lines
        (trajectory tail, submap poses, world-frame scan) that watch.html /
        tools/watch.py replay (reference StandardViewer drawables,
        standard_viewer_callbacks.cpp)."""
        import json
        import os

        import jax.numpy as jnp

        from glim_tpu.mapping.callbacks import SubMappingCallbacks
        from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks as CB
        from glim_tpu.types import EstimationFrame, PointBatch, SubMap

        stream = str(tmp_path / "run.jsonl")
        sv = StandardViewer(report_interval=1e9, stream_path=stream,
                            stream_interval=0.0)
        try:
            pts = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
            mask = jnp.ones(64, bool)
            for i in range(3):
                T = np.eye(4)
                T[0, 3] = float(i)
                CB.on_new_frame(EstimationFrame(
                    id=i, stamp=0.1 * i, T_world_lidar=T,
                    frame=PointBatch(points=pts, mask=mask)))
            SubMappingCallbacks.on_new_submap(
                SubMap(id=0, T_world_origin=np.eye(4),
                       frame=PointBatch(points=pts, mask=mask)))
            # Factor edges stream from the smoother-update hook (pose-graph
            # layer of watch.html).
            from glim_tpu.mapping.callbacks import GlobalMappingCallbacks

            class _FakeMapping:
                matching_factors = [(0, 1), (0, 3)]
                between_factors = [(0, 1, np.eye(4), np.eye(6))]
            GlobalMappingCallbacks.on_smoother_update(_FakeMapping(), None,
                                                      None)
            CB.on_new_frame(EstimationFrame(
                id=3, stamp=0.3, T_world_lidar=np.eye(4),
                frame=PointBatch(points=pts, mask=mask)))
        finally:
            sv.detach()
            sv.stream.close()
        lines = [json.loads(l) for l in open(stream) if l.strip()]
        assert len(lines) >= 4
        assert lines[0]["odom"] and len(lines[0]["odom"][0]) == 7
        assert "scan" in lines[0] and len(lines[0]["scan"][0]) == 3
        # The submap created between lines shows up in the later line.
        assert len(lines[-1]["submaps"]) == 1
        assert lines[-1]["stats"]["frames"] == 4
        # Map layer: the submap's origin-frame cloud streamed exactly once.
        cloud_lines = [l for l in lines if "clouds" in l]
        assert len(cloud_lines) == 1 and "0" in cloud_lines[0]["clouds"]
        assert len(cloud_lines[0]["clouds"]["0"][0]) == 3
        # Pose-graph layer: factor edges with matching/between tags.
        fac_lines = [l for l in lines if "factors" in l]
        assert fac_lines and [0, 1, "m"] in fac_lines[-1]["factors"]
        assert [0, 1, "b"] in fac_lines[-1]["factors"]
        # The replay page ships next to the stream writer.
        html = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "glim_tpu", "viewer", "watch.html")
        assert os.path.exists(html)
        assert "seek" in open(html).read()

    def test_watch_server_serves_stream(self, tmp_path):
        import threading
        import urllib.request

        stream = tmp_path / "s.jsonl"
        stream.write_text('{"t": 0.0, "seq": 0, "odom": [], "submaps": [], '
                          '"stats": {}}\n')
        import glim_tpu.tools.watch as watch
        import http.server
        srv_holder = {}

        orig = http.server.ThreadingHTTPServer

        class Grab(orig):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                srv_holder["srv"] = self

        http.server.ThreadingHTTPServer = Grab
        try:
            th = threading.Thread(
                target=watch.main,
                args=(["--stream", str(stream), "--port", "0"],), daemon=True)
            th.start()
            import time
            for _ in range(100):
                if "srv" in srv_holder:
                    break
                time.sleep(0.02)
            port = srv_holder["srv"].server_address[1]
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/watch.html", timeout=5).read()
            assert b"glim_tpu" in page
            data = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stream", timeout=5).read()
            assert b'"seq": 0' in data
        finally:
            http.server.ThreadingHTTPServer = orig
            if "srv" in srv_holder:
                srv_holder["srv"].shutdown()

    def test_memory_monitor(self):
        mm = MemoryMonitor(interval=0.05)
        import time
        time.sleep(0.15)
        assert mm.ok()
        mm.stop()
        info = read_meminfo()
        assert info.get("MemTotal", 0) > 0


class TestProfiling:
    def test_scopes_and_report(self):
        import time as _t

        from glim_tpu.utils.profiling import profile_scope, report
        with profile_scope("unit_test_scope"):
            _t.sleep(0.01)
        with profile_scope("unit_test_scope"):
            _t.sleep(0.01)
        out = report(reset=True)
        s = out["unit_test_scope"]
        assert s["n"] == 2 and s["mean_ms"] >= 9.0
