"""ROS conversion + CLI tool tests (ROS-free via duck typing)."""

import os
import types

import numpy as np
import pytest

from glim_tpu.ros.cloud_converter import extract_raw_points, to_sec


def make_pc2(rng, n=100, with_time=True, with_intensity=True, dtype=np.float32):
    """Duck-typed sensor_msgs/PointCloud2."""
    Field = lambda name, offset, datatype: types.SimpleNamespace(
        name=name, offset=offset, datatype=datatype, count=1)
    itemsize = np.dtype(dtype).itemsize
    code = 7 if dtype == np.float32 else 8
    fields = [Field("x", 0, code), Field("y", itemsize, code),
              Field("z", 2 * itemsize, code)]
    off = 3 * itemsize
    if with_time:
        fields.append(Field("time", off, 7))
        off += 4
    if with_intensity:
        fields.append(Field("intensity", off, 7))
        off += 4
    fields.append(Field("ring", off, 4))
    off += 2
    step = off + 2   # trailing pad

    pts = rng.uniform(-10, 10, (n, 3)).astype(dtype)
    times = np.linspace(0, 0.1, n).astype(np.float32)
    inten = rng.uniform(0, 255, n).astype(np.float32)
    rings = (np.arange(n) % 64).astype(np.uint16)

    buf = np.zeros((n, step), np.uint8)
    buf[:, :3 * itemsize] = pts.view(np.uint8).reshape(n, -1)
    o = 3 * itemsize
    if with_time:
        buf[:, o:o + 4] = times.view(np.uint8).reshape(n, 4)
        o += 4
    if with_intensity:
        buf[:, o:o + 4] = inten.view(np.uint8).reshape(n, 4)
        o += 4
    buf[:, o:o + 2] = rings.view(np.uint8).reshape(n, 2)

    header = types.SimpleNamespace(stamp=types.SimpleNamespace(sec=100, nanosec=500000000))
    return types.SimpleNamespace(fields=fields, width=n, height=1,
                                 point_step=step, data=buf.tobytes(),
                                 header=header), pts, times, inten, rings


class TestCloudConverter:
    def test_float32_extraction(self, rng):
        msg, pts, times, inten, rings = make_pc2(rng)
        raw = extract_raw_points(msg)
        assert raw is not None
        np.testing.assert_allclose(raw.points, pts.astype(np.float64), atol=1e-6)
        np.testing.assert_allclose(raw.times, times, atol=1e-6)
        np.testing.assert_allclose(raw.intensities, inten, atol=1e-4)
        np.testing.assert_array_equal(raw.rings, rings)
        assert raw.stamp == pytest.approx(100.5)

    def test_float64_points(self, rng):
        msg, pts, *_ = make_pc2(rng, dtype=np.float64)
        raw = extract_raw_points(msg)
        np.testing.assert_allclose(raw.points, pts, atol=1e-12)

    def test_missing_xyz_rejected(self, rng):
        msg, *_ = make_pc2(rng)
        msg.fields = [f for f in msg.fields if f.name != "z"]
        assert extract_raw_points(msg) is None

    def test_ros1_stamp(self):
        assert to_sec(types.SimpleNamespace(secs=10, nsecs=250000000)) == pytest.approx(10.25)


@pytest.mark.slow
class TestRunnerCLI:
    def test_dataset_runner(self, tmp_path, rng):
        # Build a tiny dataset from the synthetic generator.
        from glim_tpu.io.synthetic import generate_sequence
        seq = generate_sequence(duration=1.0, n_scan_points=1500, scene_points=15000)
        ds = tmp_path / "dataset"
        (ds / "scans").mkdir(parents=True)
        (ds / "times").mkdir()
        np.savetxt(ds / "imu.csv", seq.imu, delimiter=",")
        np.savetxt(ds / "stamps.csv", np.asarray(seq.stamps), delimiter=",")
        for i, s in enumerate(seq.scans):
            np.save(ds / "scans" / f"{i:06d}.npy", s.points)
            np.save(ds / "times" / f"{i:06d}.npy", s.times)

        from glim_tpu.tools.glim_runner import main
        dump = str(tmp_path / "dump")
        main([str(ds), "--dump", dump])
        assert os.path.exists(os.path.join(dump, "graph.txt"))
        from glim_tpu.utils.config import GlobalConfig
        GlobalConfig.reset()

    def test_offline_viewer_cli(self, tmp_path, rng):
        import jax.numpy as jnp

        from glim_tpu.io.dump import save_dump
        from glim_tpu.types import PointBatch, SubMap
        pts = rng.normal(size=(256, 3)).astype(np.float32) * 5
        sm = SubMap(id=0, T_world_origin=np.eye(4),
                    frame=PointBatch(points=jnp.asarray(pts),
                                     mask=jnp.ones(256, bool)))
        d = str(tmp_path / "dump")
        save_dump(d, [sm], [np.eye(4)])

        from glim_tpu.tools.offline_viewer import main
        ply = str(tmp_path / "out.ply")
        main(["open", d, "--ply", ply])
        assert os.path.getsize(ply) > 1000


class TestMapEditorCLI:
    def test_select_delete_save(self, tmp_path, rng):
        import jax.numpy as jnp

        from glim_tpu.io.dump import save_dump
        from glim_tpu.types import PointBatch, SubMap
        pts = rng.normal(size=(300, 3)).astype(np.float32) * 3
        pts[:40] += np.array([20.0, 0.0, 0.0], np.float32)  # removable blob
        sm = SubMap(id=0, T_world_origin=np.eye(4),
                    frame=PointBatch(points=jnp.asarray(pts),
                                     mask=jnp.ones(300, bool)))
        d = str(tmp_path / "dump")
        save_dump(d, [sm], [np.eye(4)])

        from glim_tpu.tools.map_editor import main
        out = str(tmp_path / "edited")
        ply = str(tmp_path / "edited.ply")
        assert main([d, "--select-radius", "20", "0", "0", "5",
                     "--save", out, "--ply", ply]) == 0
        from glim_tpu.native.loader import ply_read
        kept = ply_read(ply)
        assert len(kept) < 300
        assert np.all(np.linalg.norm(kept - [20, 0, 0], axis=1) >= 4.99)

    def test_dry_run_and_box(self, tmp_path, rng):
        import jax.numpy as jnp

        from glim_tpu.io.dump import save_dump
        from glim_tpu.types import PointBatch, SubMap
        pts = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        sm = SubMap(id=0, T_world_origin=np.eye(4),
                    frame=PointBatch(points=jnp.asarray(pts),
                                     mask=jnp.ones(200, bool)))
        d = str(tmp_path / "dump")
        save_dump(d, [sm], [np.eye(4)])
        from glim_tpu.tools.map_editor import main
        assert main([d, "--select-box", "0", "0", "0", "1", "1", "1",
                     "--dry-run"]) == 0
