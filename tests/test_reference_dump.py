"""Reference-dump interoperability.

The reference saves submap clouds via gtsam_points'
``PointCloudCPU::save_compact`` (sub_map.cpp:61) and text metadata via
Eigen stream output (sub_map.cpp:24-62); its graph.txt manifest lists
matching-cost factors (global_mapping.cpp:576-598). These tests write a
dump directory in the REFERENCE byte format with an independent fixture
writer and verify glim_tpu's loaders open it (load_submap, load_dump,
OfflineViewer open + PLY/TUM export).
"""

import os

import numpy as np
import pytest

from glim_tpu.io import gtsam_points_io as gpio
from glim_tpu.io.dump import load_dump, load_submap, save_dump, save_submap


def _eigen_matrix_str(M):
    # Eigen's default ostream output: rows of space-separated values with
    # column alignment (arbitrary whitespace — the reference reads it back
    # with `ifs >>` token extraction, so alignment is cosmetic).
    return "\n".join("  ".join(f"{x:.12g}" for x in row) for row in np.asarray(M))


def _write_reference_submap(path, sm_id, T_world_origin, points, covs=None,
                            compact=False, n_frames=2, stamp0=100.0):
    """Emit a submap dir byte-identical in structure to sub_map.cpp:24-62."""
    os.makedirs(path, exist_ok=True)
    T_lidar_imu = np.eye(4)
    T_lidar_imu[:3, 3] = [0.01, -0.02, 0.05]
    lines = [f"id: {sm_id}"]
    for name, M in [("T_world_origin", T_world_origin),
                    ("T_origin_endpoint_L", np.eye(4)),
                    ("T_origin_endpoint_R", np.eye(4)),
                    ("T_lidar_imu", T_lidar_imu)]:
        lines.append(f"{name}: ")
        lines.append(_eigen_matrix_str(M))
    lines.append("imu_bias: 0.001 -0.002 0.003 1e-05 2e-05 -3e-05")
    lines.append("frame_id: 2")  # reference writes the enum as int (IMU)
    lines.append(f"num_frames: {n_frames}")
    for i in range(n_frames):
        T = np.array(T_world_origin)
        T[:3, 3] += [0.1 * i, 0, 0]
        lines += [f"frame_{i}", f"id: {sm_id * 10 + i}",
                  f"stamp: {stamp0 + 0.1 * i:.9f}",
                  "T_odom_lidar: ", _eigen_matrix_str(T),
                  "T_world_lidar: ", _eigen_matrix_str(T),
                  "v_world_imu: 0.5 0 0"]
    with open(os.path.join(path, "data.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(path, "imu_rate.txt"), "w") as f:
        f.write("")
    if compact:
        gpio.save_point_cloud_compact(path, points, covs=covs)
    else:
        gpio.save_point_cloud_full(path, points, covs=covs)
    return T_lidar_imu


def _cloud(n=200, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 3.0
    covs = np.tile(np.eye(3, dtype=np.float32) * 0.01, (n, 1, 1))
    return pts, covs


class TestBinaryCloudRoundTrip:
    def test_compact(self, tmp_path):
        pts, covs = _cloud()
        normals = np.tile(np.array([0, 0, 1.0], np.float32), (len(pts), 1))
        times = np.linspace(0, 0.1, len(pts)).astype(np.float32)
        inten = np.arange(len(pts), dtype=np.float32)
        gpio.save_point_cloud_compact(str(tmp_path), pts, covs=covs,
                                      normals=normals, times=times,
                                      intensities=inten)
        # Byte layout: raw little-endian float32, 3 per point.
        raw = np.fromfile(tmp_path / "points_compact.bin", "<f4")
        assert raw.size == len(pts) * 3
        out = gpio.load_point_cloud(str(tmp_path))
        np.testing.assert_allclose(out["points"], pts, rtol=1e-6)
        np.testing.assert_allclose(out["covs"], covs, rtol=1e-6)
        np.testing.assert_allclose(out["normals"], normals)
        np.testing.assert_allclose(out["times"], times, rtol=1e-6)
        np.testing.assert_allclose(out["intensities"], inten)

    def test_full_f64(self, tmp_path):
        pts, covs = _cloud(seed=1)
        gpio.save_point_cloud_full(str(tmp_path), pts, covs=covs)
        # Vector4d homogeneous points, w == 1 (sub_map.cpp load validation).
        raw = np.fromfile(tmp_path / "points.bin", "<f8").reshape(-1, 4)
        assert np.allclose(raw[:, 3], 1.0)
        # Matrix4d covs with zero last row/col.
        c16 = np.fromfile(tmp_path / "covs.bin", "<f8").reshape(-1, 4, 4)
        assert np.allclose(c16[:, 3, :], 0) and np.allclose(c16[:, :, 3], 0)
        out = gpio.load_point_cloud(str(tmp_path))
        np.testing.assert_allclose(out["points"], pts, rtol=1e-6)
        np.testing.assert_allclose(out["covs"], covs, rtol=1e-6)

    def test_compact_preferred_over_full(self, tmp_path):
        pts_c, _ = _cloud(seed=2)
        pts_f, _ = _cloud(n=100, seed=3)
        gpio.save_point_cloud_compact(str(tmp_path), pts_c)
        gpio.save_point_cloud_full(str(tmp_path), pts_f)
        out = gpio.load_point_cloud(str(tmp_path))
        assert len(out["points"]) == len(pts_c)


class TestReferenceSubmapLoad:
    @pytest.mark.parametrize("compact", [False, True])
    def test_load(self, tmp_path, compact):
        pts, covs = _cloud()
        T = np.eye(4)
        T[:3, 3] = [5, 1, 0]
        T_lidar_imu = _write_reference_submap(str(tmp_path), 3, T, pts,
                                              covs=covs, compact=compact)
        sm = load_submap(str(tmp_path))
        assert sm.id == 3
        np.testing.assert_allclose(sm.T_world_origin, T)
        assert len(sm.frames) == 2 and len(sm.odom_frames) == 2
        fr = sm.frames[1]
        assert fr.id == 31 and abs(fr.stamp - 100.1) < 1e-9
        np.testing.assert_allclose(fr.T_lidar_imu, T_lidar_imu)
        np.testing.assert_allclose(fr.imu_bias,
                                   [0.001, -0.002, 0.003, 1e-5, 2e-5, -3e-5])
        np.testing.assert_allclose(fr.v_world_imu, [0.5, 0, 0])
        np.testing.assert_allclose(
            fr.T_world_imu, fr.T_world_lidar @ T_lidar_imu, atol=1e-9)
        mask = np.asarray(sm.frame.mask)
        np.testing.assert_allclose(np.asarray(sm.frame.points)[mask], pts,
                                   rtol=1e-5)

    def test_corrupt_covs_repaired(self, tmp_path):
        pts, covs = _cloud()
        covs[0] *= np.inf  # corrupted stored covariances
        _write_reference_submap(str(tmp_path), 0, np.eye(4), pts, covs=covs)
        sm = load_submap(str(tmp_path))
        c = np.asarray(sm.frame.covs)[np.asarray(sm.frame.mask)]
        assert np.isfinite(c).all()


class TestReferenceDumpOpen:
    def _write_dump(self, root, n_submaps=3, compact=True):
        os.makedirs(root, exist_ok=True)
        for i in range(n_submaps):
            pts, covs = _cloud(seed=i)
            pts = pts + np.array([4.0 * i, 0, 0], np.float32)
            T = np.eye(4)
            T[:3, 3] = [4.0 * i, 0, 0]
            _write_reference_submap(os.path.join(root, f"{i:06d}"), i, T,
                                    pts, covs=covs, compact=compact,
                                    stamp0=100.0 + i)
        with open(os.path.join(root, "graph.txt"), "w") as f:
            f.write(f"num_submaps: {n_submaps}\n")
            f.write(f"num_all_frames: {2 * n_submaps}\n")
            f.write("num_matching_cost_factors: 2\n")
            f.write("matching_cost vgicp 0 1\n")
            f.write("matching_cost vgicp_gpu 1 2\n")
        for name in ("odom_lidar.txt", "traj_lidar.txt",
                     "odom_imu.txt", "traj_imu.txt"):
            with open(os.path.join(root, name), "w") as f:
                f.write("100.0 0 0 0 0 0 0 1\n")

    def test_load_dump_manifest_only(self, tmp_path):
        root = str(tmp_path / "ref_dump")
        self._write_dump(root)
        submaps, poses, factors = load_dump(root)
        assert len(submaps) == 3
        assert factors is not None
        assert factors["matching"] == [(0, 1), (1, 2)]
        assert factors["i"] == []  # betweens live in boost graph.bin

    def test_offline_viewer_opens_reference_dump(self, tmp_path):
        root = str(tmp_path / "ref_dump")
        self._write_dump(root)
        from glim_tpu.viewer.offline_viewer import OfflineViewer
        v = OfflineViewer()
        v.open_map(root)
        gm = v.global_mapping
        assert len(gm.submaps) == 3
        assert (0, 1) in gm.matching_factors and (1, 2) in gm.matching_factors
        # recover_graph restores odometry chaining lost with graph.bin.
        gm.recover_graph()
        out_ply = str(tmp_path / "map.ply")
        v.export_ply(out_ply)
        assert os.path.getsize(out_ply) > 0

    def test_own_dump_graph_txt_is_reference_layout(self, tmp_path):
        # glim_tpu's own saves now carry the reference manifest tokens.
        from glim_tpu.types import PointBatch, SubMap
        pts, covs = _cloud()
        sm = SubMap()
        sm.id = 0
        sm.frame = PointBatch.from_numpy(pts, covs=covs)
        root = str(tmp_path / "own")
        save_dump(root, [sm], [np.eye(4)],
                  factors=dict(i=[], j=[], Z=[], info=[], huber=[],
                               matching=[(0, 1)], translation_priors=[]))
        txt = open(os.path.join(root, "graph.txt")).read()
        assert "num_matching_cost_factors: 1" in txt
        assert "matching_cost vgicp 0 1" in txt
        # And the submap payload is the reference compact byte format.
        assert os.path.exists(os.path.join(root, "000000",
                                           "points_compact.bin"))

    def test_round_trip_own_writer_reference_reader_shape(self, tmp_path):
        # save_submap -> load_submap through the compact binary path.
        from glim_tpu.types import PointBatch, SubMap
        pts, covs = _cloud(seed=7)
        sm = SubMap()
        sm.id = 4
        sm.T_world_origin = np.eye(4)
        sm.frame = PointBatch.from_numpy(pts, covs=covs)
        save_submap(str(tmp_path / "sm"), sm)
        back = load_submap(str(tmp_path / "sm"))
        mask = np.asarray(back.frame.mask)
        np.testing.assert_allclose(np.asarray(back.frame.points)[mask], pts,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(back.frame.covs)[mask], covs,
                                   rtol=1e-4, atol=1e-6)
