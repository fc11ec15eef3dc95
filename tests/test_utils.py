"""Tests for concurrency, callbacks, registry, time keeping, trajectory anchor."""

import threading
import time

import numpy as np

from glim_tpu.types import RawPoints
from glim_tpu.ops import lie_np
from glim_tpu.utils.callbacks import CallbackSlot
from glim_tpu.utils.concurrent import ConcurrentVector, DataStorePolicy
from glim_tpu.utils.interpolation import InterpolationHelper, InterpolationResult
from glim_tpu.utils.registry import canonical_name, load_module, register_module
from glim_tpu.utils.time_keeper import TimeKeeper
from glim_tpu.utils.trajectory_manager import TrajectoryManager


class TestConcurrentVector:
    def test_push_drain(self):
        q = ConcurrentVector()
        q.push_back(1)
        q.insert([2, 3])
        assert q.get_all_and_clear() == [1, 2, 3]
        assert q.empty()

    def test_bounded_drop_oldest(self):
        q = ConcurrentVector(DataStorePolicy.UPTO(2))
        q.insert([1, 2, 3, 4])
        assert q.get_all_and_clear() == [3, 4]

    def test_producer_consumer(self):
        q = ConcurrentVector()
        out = []

        def consumer():
            while True:
                items = q.get_all_and_clear_wait(timeout=0.5)
                out.extend(items)
                if q.end_of_data():
                    break

        t = threading.Thread(target=consumer)
        t.start()
        for i in range(100):
            q.push_back(i)
        q.submit_end_of_data()
        t.join(timeout=5)
        assert out == list(range(100))


class TestCallbacks:
    def test_add_remove_call(self):
        slot = CallbackSlot("test")
        seen = []
        h = slot.add(lambda x: seen.append(x))
        slot.call(1)
        slot(2)
        slot.remove(h)
        slot.call(3)
        assert seen == [1, 2]


class TestRegistry:
    def test_canonical_names(self):
        assert canonical_name("libodometry_estimation_gpu.so") == "odometry_estimation_gpu"
        assert canonical_name("libsub_mapping.so") == "sub_mapping"
        assert canonical_name("custom_thing") == "custom_thing"

    def test_register_and_load(self):
        @register_module("testkind", "mymod")
        def factory(v):
            return ("made", v)

        assert load_module("testkind", "mymod", 42) == ("made", 42)
        assert load_module("testkind", "libmymod.so", 1) == ("made", 1)


class TestTimeKeeper:
    def test_relative_times_passthrough(self):
        tk = TimeKeeper()
        pts = RawPoints(stamp=100.0, points=np.zeros((10, 3)),
                        times=np.linspace(0, 0.1, 10))
        assert tk.process(pts)
        assert pts.stamp == 100.0
        assert pts.times.max() <= 0.1 + 1e-9

    def test_absolute_times_converted(self):
        tk = TimeKeeper()
        base = 1700000000.0
        pts = RawPoints(stamp=0.0, points=np.zeros((10, 3)),
                        times=base + np.linspace(0, 0.1, 10))
        tk.process(pts)
        assert abs(pts.stamp - base) < 1e-6
        assert pts.times.max() <= 0.1 + 1e-9

    def test_nanosec_heuristic(self):
        tk = TimeKeeper()
        base_ns = 1.7e18
        pts = RawPoints(stamp=0.0, points=np.zeros((5, 3)),
                        times=base_ns + np.linspace(0, 1e8, 5))
        tk.process(pts)
        assert abs(pts.stamp - 1.7e9) < 1.0
        assert pts.times.max() <= 0.1 + 1e-6

    def test_rewind_detection(self):
        tk = TimeKeeper()
        p1 = RawPoints(stamp=10.0, points=np.zeros((3, 3)), times=np.zeros(3))
        p2 = RawPoints(stamp=9.0, points=np.zeros((3, 3)), times=np.zeros(3))
        assert tk.process(p1)
        assert not tk.process(p2)

    def test_synthesized_times(self):
        tk = TimeKeeper()
        for i in range(5):
            pts = RawPoints(stamp=float(i) * 0.1, points=np.zeros((100, 3)))
            tk.process(pts)
        # After a couple frames, scan duration estimated -> pseudo times rise.
        assert pts.times is not None
        assert pts.times[-1] > 0.0

    def test_imu_validation(self):
        tk = TimeKeeper()
        assert tk.validate_imu_stamp(1.0)
        assert tk.validate_imu_stamp(1.01)
        assert not tk.validate_imu_stamp(0.5)


class TestInterpolationHelper:
    def test_tristate(self):
        h = InterpolationHelper()
        for t in [1.0, 2.0, 3.0]:
            h.add(t, t * 10)
        st, lo, hi, _ = h.find(2.5)
        assert st == InterpolationResult.SUCCESS and lo[0] == 2.0 and hi[0] == 3.0
        assert h.find(0.5)[0] == InterpolationResult.FAILURE
        assert h.find(3.5)[0] == InterpolationResult.WAITING

    def test_erase(self):
        h = InterpolationHelper()
        for t in [1.0, 2.0, 3.0, 4.0]:
            h.add(t, t)
        h.erase_before(3.0, margin=1)
        assert h.leftmost_time() == 2.0


class TestTrajectoryManager:
    def test_anchor_update(self, rng):
        tm = TrajectoryManager()
        # Straight-line odometry along x.
        for i in range(10):
            T = np.eye(4)
            T[0, 3] = float(i)
            tm.add_odom(float(i), T)
        # Global correction says pose at t=5 is actually shifted +1 in y.
        T_corr = np.eye(4)
        T_corr[0, 3] = 5.0
        T_corr[1, 3] = 1.0
        tm.update_anchor(5.0, T_corr)
        cur = tm.current_pose()
        np.testing.assert_allclose(cur[:3, 3], [9.0, 1.0, 0.0], atol=1e-9)

    def test_interpolated_anchor(self):
        tm = TrajectoryManager()
        for i in range(4):
            T = lie_np.se3_exp(np.array([0, 0, 0.1 * i, float(i), 0, 0]))
            tm.add_odom(float(i), T)
        T_world = tm.odom2world(np.eye(4))
        np.testing.assert_allclose(T_world, np.eye(4))


class TestCameraModel:
    def _model(self):
        from glim_tpu.utils.camera import CameraModel
        import numpy as np
        return CameraModel(
            intrinsics=np.array([500.0, 510.0, 320.0, 240.0]),
            distortion_model="plumb_bob",
            distortion_coeffs=np.array([-0.02, 0.005, 0.001, -0.002, 0.0]),
            image_size=(640, 480))

    def test_project_unproject_roundtrip(self, rng):
        import numpy as np
        m = self._model()
        pts = np.stack([rng.uniform(-0.4, 0.4, 200),
                        rng.uniform(-0.3, 0.3, 200),
                        np.ones(200)], 1) * rng.uniform(1, 10, (200, 1))
        uv, valid = m.project(pts)
        assert valid.mean() > 0.9
        rays = m.unproject(uv[valid], depth=pts[valid, 2]
                           / m.unproject(uv[valid])[:, 2]
                           * np.linalg.norm(m.unproject(uv[valid]), axis=1))
        # simpler: unproject rays and compare direction
        d = m.unproject(uv[valid])
        d_true = pts[valid] / np.linalg.norm(pts[valid], axis=1, keepdims=True)
        np.testing.assert_allclose(d, d_true, atol=1e-6)

    def test_fisheye_and_none(self, rng):
        import numpy as np
        from glim_tpu.utils.camera import CameraModel
        m = self._model()
        m.distortion_model = "fisheye"
        m.distortion_coeffs = np.array([0.01, -0.002, 0.0005, 0.0])
        xn = rng.uniform(-0.5, 0.5, (100, 2))
        back = m.undistort(m.distort(xn), iters=30)
        np.testing.assert_allclose(back, xn, atol=1e-7)
        m2 = CameraModel(distortion_model="none")
        np.testing.assert_array_equal(m2.distort(xn), xn)

    def test_project_lidar_extrinsics(self, rng):
        import numpy as np
        m = self._model()
        # camera 10 cm ahead of lidar along x, looking same way as +z
        T = np.eye(4)
        T[0, 3] = 0.1
        m.T_lidar_camera = T
        pts_lidar = np.array([[0.1, 0.0, 5.0]])
        uv, valid = m.project_lidar(pts_lidar)
        assert valid[0]
        np.testing.assert_allclose(uv[0], [320.0, 240.0], atol=1e-6)

    def test_from_config(self, tmp_path):
        import numpy as np
        from glim_tpu.utils.camera import CameraModel
        from glim_tpu.utils.config import GlobalConfig, create_default_config_dir
        GlobalConfig.reset()
        d = create_default_config_dir(str(tmp_path / "cfg"))
        gc = GlobalConfig.instance(d, override=True)
        m = CameraModel.from_config(gc.get_config("config_sensors"))
        assert m.image_size == (640, 480)
        assert m.distortion_model == "plumb_bob"
        assert m.intrinsics.shape == (4,)
        GlobalConfig.reset()


class TestViewerRenderHints:
    def test_hints_from_config_in_snapshot(self, tmp_path):
        import json
        from glim_tpu.utils.config import Config
        from glim_tpu.viewer.standard_viewer import StandardViewer
        p = tmp_path / "viewer.json"
        p.write_text(json.dumps({"standard_viewer": {
            "point_size": 0.1, "points_alpha": 0.5,
            "default_z_range": [-1.0, 9.0]}}))
        v = StandardViewer(config=Config(str(p)))
        try:
            snap = v.snapshot()
            assert snap["render_hints"]["point_size"] == 0.1
            assert snap["render_hints"]["points_alpha"] == 0.5
            assert snap["render_hints"]["default_z_range"] == [-1.0, 9.0]
            assert snap["render_hints"]["viewer_width"] == 2560
        finally:
            v.detach()
