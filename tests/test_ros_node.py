"""Live ROS driver layer: message builders, GlimROSNode, rviz viewer,
imu_validator extension — all against a fake (duck-typed) node."""

import json
import os

import numpy as np
import pytest

from glim_tpu.ros import messages as rosmsg
from glim_tpu.ros.cloud_converter import extract_raw_points


class FakePublisher:
    def __init__(self, topic):
        self.topic = topic
        self.messages = []

    def publish(self, msg):
        self.messages.append(msg)


class FakeNode:
    """rclpy-node surface used by GlimROSNode (no create_timer: tests drive
    spin_once explicitly)."""

    def __init__(self):
        self.subscriptions = {}
        self.publishers = {}

    def create_subscription(self, msg_type, topic, callback, qos):
        self.subscriptions[topic] = callback
        return (msg_type, topic)

    def create_publisher(self, msg_type, topic, qos):
        pub = FakePublisher(topic)
        self.publishers[topic] = pub
        return pub


def make_imu_msg(t, acc, gyro):
    from types import SimpleNamespace
    return SimpleNamespace(
        header=SimpleNamespace(stamp=rosmsg.stamp_msg(t), frame_id="imu_link"),
        linear_acceleration=SimpleNamespace(x=acc[0], y=acc[1], z=acc[2]),
        angular_velocity=SimpleNamespace(x=gyro[0], y=gyro[1], z=gyro[2]))


class TestMessages:
    def test_pointcloud2_roundtrip(self, rng):
        pts = rng.normal(size=(100, 3))
        inten = rng.uniform(size=100)
        times = np.linspace(0.0, 0.1, 100)
        msg = rosmsg.make_pointcloud2(12.5, "lidar", pts, inten, times)
        assert msg.header.frame_id == "lidar"
        raw = extract_raw_points(msg)
        assert abs(raw.stamp - 12.5) < 1e-6
        np.testing.assert_allclose(raw.points, pts, atol=1e-5)
        np.testing.assert_allclose(raw.intensities, inten, atol=1e-6)
        np.testing.assert_allclose(raw.times, times, atol=1e-6)

    def test_odometry_msg_pose(self):
        from glim_tpu.ops import lie_np
        T = lie_np.se3_exp(np.array([0.1, -0.2, 0.3, 1.0, 2.0, 3.0]))
        m = rosmsg.make_odometry(1.0, "odom", "base", T)
        assert m.child_frame_id == "base"
        q = np.array([m.pose.pose.orientation.x, m.pose.pose.orientation.y,
                      m.pose.pose.orientation.z, m.pose.pose.orientation.w])
        R = lie_np.quat_to_rot(q) if hasattr(lie_np, "quat_to_rot") else None
        p = np.array([m.pose.pose.position.x, m.pose.pose.position.y,
                      m.pose.pose.position.z])
        np.testing.assert_allclose(p, T[:3, 3], atol=1e-9)
        if R is not None:
            np.testing.assert_allclose(R, T[:3, :3], atol=1e-6)

    def test_stamp_msg_carry(self):
        m = rosmsg.stamp_msg(4.9999999999)
        assert m.sec == 5 and m.nanosec == 0


@pytest.mark.slow
class TestGlimROSNode:
    def _config(self, tmp_path):
        from tests.test_pipeline import write_test_config
        cfg_dir = write_test_config(tmp_path)
        with open(os.path.join(cfg_dir, "config_ros.json")) as f:
            ros = json.load(f)
        ros["glim_ros"]["extension_modules"] = [
            "librviz_viewer.so", "libimu_validator.so"]
        ros["glim_ros"]["imu_topic"] = "/imu"
        ros["glim_ros"]["points_topic"] = "/points"
        with open(os.path.join(cfg_dir, "config_ros.json"), "w") as f:
            json.dump(ros, f)
        return cfg_dir

    def test_live_node_end_to_end(self, tmp_path):
        from glim_tpu.io.synthetic import generate_sequence
        from glim_tpu.ros.node import GRAVITY, GlimROSNode

        cfg_dir = self._config(tmp_path)
        node = FakeNode()
        gn = GlimROSNode(node, config_path=cfg_dir, async_mode=False)
        seq = generate_sequence(duration=2.0, scan_hz=10.0, n_scan_points=3000,
                                noise=0.01, seed=3, scene_points=30000)

        imu_cb = node.subscriptions["/imu"]
        pts_cb = node.subscriptions["/points"]
        imu_idx = 0
        # Feed accelerations in g-units: acc_scale=0 must auto-detect 9.80665.
        for raw in seq.scans:
            while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.1:
                r = seq.imu[imu_idx]
                imu_cb(make_imu_msg(r[0], r[1:4] / GRAVITY, r[4:7]))
                imu_idx += 1
            pts_cb(rosmsg.make_pointcloud2(raw.stamp, "os_lidar", raw.points,
                                           times=raw.times))
            gn.spin_once()

        assert gn._imu_cond.acc_scale == pytest.approx(GRAVITY)
        # Frame ids auto-detected from message headers.
        assert gn.params.imu_frame_id == "imu_link"
        assert gn.params.lidar_frame_id == "os_lidar"

        odom_msgs = node.publishers["/glim_ros/odom"].messages
        assert len(odom_msgs) >= 5
        tf_msgs = node.publishers["/tf"].messages
        assert tf_msgs, "TF must be published"
        frames = {(t.header.frame_id, t.child_frame_id)
                  for t in tf_msgs[-1].transforms}
        base = gn.params.base_frame_id or gn.params.imu_frame_id
        assert ("map", "odom") in frames
        assert ("odom", base) in frames
        assert ("imu_link", "os_lidar") in frames  # publish_imu2lidar

        # Odometry poses track the pipeline's estimates.
        est = gn.glim.odometry_estimates
        assert len(est) >= 5
        last = odom_msgs[-1]
        p = np.array([last.pose.pose.position.x, last.pose.pose.position.y,
                      last.pose.pose.position.z])
        T_est = est[-1].T_world_sensor()
        np.testing.assert_allclose(p, T_est[:3, 3], atol=1e-6)

        # rviz viewer published aligned clouds.
        rviz_ext = [e for e in gn.glim.extensions
                    if type(e).__name__ == "RvizViewer"]
        assert rviz_ext
        rviz_ext[0].spin_once()
        aligned = node.publishers["/glim_ros/aligned_points"].messages
        assert aligned and aligned[-1].width > 0

        # imu_validator extension consumed the callback stream.
        val_ext = [e for e in gn.glim.extensions
                   if type(e).__name__ == "IMUValidatorExtension"]
        assert val_ext
        assert val_ext[0].validation.frame_count >= 3

        gn.stop()
        for e in gn.glim.extensions:
            e.at_exit(str(tmp_path / "dump"))

    def test_backend_disable_flags(self, tmp_path):
        """enable_local_mapping=false selects the passthrough sub-mapper."""
        cfg_dir = self._config(tmp_path)
        with open(os.path.join(cfg_dir, "config_ros.json")) as f:
            ros = json.load(f)
        ros["glim_ros"]["enable_local_mapping"] = False
        ros["glim_ros"]["extension_modules"] = []
        with open(os.path.join(cfg_dir, "config_ros.json"), "w") as f:
            json.dump(ros, f)

        from glim_tpu.mapping.sub_mapping_passthrough import SubMappingPassthrough
        from glim_tpu.ros.node import GlimROSNode
        gn = GlimROSNode(FakeNode(), config_path=cfg_dir, async_mode=False)
        assert isinstance(gn.glim.sub_mapping, SubMappingPassthrough)
        gn.stop()
