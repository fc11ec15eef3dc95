"""Boost binary-archive codec: byte layout, round-trips, dump integration.

The reference writes graph.bin/values.bin with gtsam::serializeToBinaryFile
(global_mapping.cpp:572-574); these tests pin the layout our codec emits
(so writer and reader cannot silently co-drift) and assert exact round-trip
of measurements, noise models, and values through both directions.
"""

import os
import struct

import numpy as np
import pytest

from glim_tpu.io import boost_archive as ba


def _pose(tx=0.0, ty=0.0, yaw=0.0):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:2, :2] = [[c, -s], [s, c]]
    T[:3, 3] = [tx, ty, 0.1 * tx]
    return T


class TestByteLayout:
    """Hand-computed wire bytes — guards the PROTOCOL, not just symmetry."""

    def test_header(self):
        data = ba.write_values({})
        # std::string signature: 8-byte LE length + bytes
        assert struct.unpack_from("<Q", data, 0)[0] == 22
        assert data[8:30] == b"serialization::archive"
        # library version: uint16
        assert struct.unpack_from("<H", data, 30)[0] == ba.LIBRARY_VERSION

    def test_empty_values_exact(self):
        data = ba.write_values({})
        body = data[32:]
        # Values class info: tracking(0) + version u32(0);
        # ptr_map class info: tracking(0) + version u32(0); count size_t(0)
        assert body == bytes([0]) + b"\0\0\0\0" + bytes([0]) + b"\0\0\0\0" \
            + b"\0" * 8

    def test_single_pose_value_exact(self):
        T = _pose(1.0, 2.0, 0.3)
        key = ba.symbol("x", 0)
        data = ba.write_values({key: ba.make_generic_pose3(T)})
        off = 32
        off += 5 + 5      # Values + ptr_map class infos
        assert struct.unpack_from("<Q", data, off)[0] == 1   # count
        off += 8
        assert struct.unpack_from("<Q", data, off)[0] == key
        off += 8
        # pointer save: new class id (i16). Values and ptr_map consumed
        # ids 0 and 1 WITHOUT writing them (class_id_optional is a no-op
        # in binary archives), so the first pointer class gets id 2.
        assert struct.unpack_from("<h", data, off)[0] == 2
        off += 2
        # GUID string
        n = struct.unpack_from("<Q", data, off)[0]
        off += 8
        assert data[off:off + n] == b"gtsam::GenericValue<gtsam::Pose3>"
        off += n
        # class info: tracked(1) + version(0)
        assert data[off] == 1
        assert struct.unpack_from("<I", data, off + 1)[0] == 0
        off += 5
        # object id 0 (u32)
        assert struct.unpack_from("<I", data, off)[0] == 0
        off += 4
        # base Value class info (0, 0), Pose3 info, Rot3 info, 9 doubles,
        # Vector3 info, 3 doubles
        assert data[off:off + 5] == bytes(5)      # Value
        off += 5
        assert data[off:off + 5] == bytes(5)      # Pose3
        off += 5
        assert data[off:off + 5] == bytes(5)      # Rot3
        off += 5
        R = np.frombuffer(data[off:off + 72], "<f8").reshape(3, 3)
        np.testing.assert_allclose(R, T[:3, :3], atol=0)
        off += 72
        assert data[off:off + 5] == bytes(5)      # Vector3
        off += 5
        t = np.frombuffer(data[off:off + 24], "<f8")
        np.testing.assert_allclose(t, T[:3, 3], atol=0)
        assert off + 24 == len(data)

    def test_second_pose_uses_class_reference(self):
        vals = {ba.symbol("x", 0): ba.make_generic_pose3(_pose(1)),
                ba.symbol("x", 1): ba.make_generic_pose3(_pose(2))}
        data = ba.write_values(vals)
        # the second entry must be much smaller: class_id ref (2) +
        # object id (4) + 12 doubles + key — no GUID, no class infos.
        # Find the second key.
        k2 = struct.pack("<Q", ba.symbol("x", 1))
        idx = data.rindex(k2)
        rest = data[idx + 8:]
        assert struct.unpack_from("<h", rest, 0)[0] == 2     # class id ref
        assert struct.unpack_from("<I", rest, 2)[0] == 1     # object id 1
        assert len(rest) == 2 + 4 + 96                        # 12 doubles


class TestRoundTrip:
    def test_values_roundtrip(self):
        vals = {}
        rng = np.random.default_rng(3)
        for k in range(40):
            vals[ba.symbol("x", k)] = ba.make_generic_pose3(
                _pose(k * 0.5, -k, 0.05 * k))
        for k in range(10):
            vals[ba.symbol("v", k)] = ba.make_generic_vector3(
                rng.normal(size=3))
            vals[ba.symbol("b", k)] = ba.make_generic_bias(
                rng.normal(size=3) * 0.01, rng.normal(size=3) * 0.001)
        out = ba.read_values(ba.write_values(vals))
        assert set(out) == set(vals)
        for key, v in vals.items():
            got = out[key]
            assert got["_type"] == v["_type"]
            if v["_type"] == "GenericValue<Pose3>":
                np.testing.assert_array_equal(
                    ba.pose3_to_matrix(got["value"]),
                    ba.pose3_to_matrix(v["value"]))
            elif v["_type"] == "GenericValue<Vector3>":
                np.testing.assert_array_equal(got["value"], v["value"])
            else:
                np.testing.assert_array_equal(got["value"]["biasAcc"],
                                              v["value"]["biasAcc"])

    def test_graph_roundtrip_exact_measurements_and_noise(self):
        rng = np.random.default_rng(11)
        shared_noise = ba.make_isotropic_precision(6, 1e6)
        factors = [ba.make_prior_pose3(ba.symbol("x", 0), np.eye(4),
                                       shared_noise)]
        infos = []
        for k in range(12):
            A = rng.normal(size=(6, 6))
            info = A @ A.T + 6 * np.eye(6)
            infos.append(info)
            factors.append(ba.make_between_pose3(
                ba.symbol("x", k), ba.symbol("x", k + 1),
                _pose(1.0, 0.1 * k, 0.02 * k),
                ba.make_gaussian_information(info)))
        # two factors SHARING one noise model object (gtsam shares noise
        # models; exercises the object_reference path)
        factors.append(ba.make_between_pose3(
            ba.symbol("x", 0), ba.symbol("x", 5), _pose(3.0), shared_noise))
        factors.append(ba.make_between_pose3(
            ba.symbol("x", 1), ba.symbol("x", 6), _pose(3.5), shared_noise))

        parsed = ba.read_graph(ba.write_graph(factors))
        assert len(parsed) == len(factors)
        for k, info in enumerate(infos):
            f = parsed[k + 1]
            assert f["_type"] == "BetweenFactor<Pose3>"
            got_info, robust = ba.noise_information(f["base"]["noiseModel"])
            assert not robust
            np.testing.assert_allclose(got_info, info, rtol=1e-12)
            np.testing.assert_array_equal(
                ba.pose3_to_matrix(f["measured"]),
                _pose(1.0, 0.1 * k, 0.02 * k))
        # shared noise objects must come back as THE SAME parsed object
        assert parsed[-1]["base"]["noiseModel"] is \
            parsed[-2]["base"]["noiseModel"]
        assert parsed[-1]["base"]["noiseModel"] is \
            parsed[0]["base"]["noiseModel"]

    def test_robust_and_special_factors(self):
        huber = {"_type": "mEstimator::Huber", "base": {"reweight": 1},
                 "k": 1.345}
        inner = ba.make_isotropic_precision(6, 100.0)
        robust = {"_type": "noiseModel::Robust", "base": {"dim": 6},
                  "robust": huber, "noise": inner}
        damping = {"_type": "LinearDampingFactor",
                   "base": {"base": {"keys": np.array(
                       [ba.symbol("x", 0)], np.uint64)}},
                   "mu": np.full(6, 10.0)}
        rot = {"_type": "RotateVector3Factor",
               "base": {"base": {"base": {"keys": np.array(
                   [ba.symbol("x", 2), ba.symbol("v", 4)], np.uint64)}},
                   "noiseModel": ba.make_isotropic_precision(3, 1e4)},
               "v": np.array([0.0, 0.0, 9.81])}
        between = ba.make_between_pose3(ba.symbol("x", 0), ba.symbol("x", 1),
                                        _pose(2.0), robust)
        parsed = ba.read_graph(ba.write_graph([between, damping, rot]))
        info, is_robust = ba.noise_information(parsed[0]["base"]["noiseModel"])
        assert is_robust
        np.testing.assert_allclose(info, np.eye(6) * 100.0, rtol=1e-12)
        assert parsed[0]["base"]["noiseModel"]["robust"]["k"] == 1.345
        assert parsed[1]["_type"] == "LinearDampingFactor"
        np.testing.assert_array_equal(parsed[1]["mu"], np.full(6, 10.0))
        assert parsed[2]["_type"] == "RotateVector3Factor"
        np.testing.assert_array_equal(parsed[2]["v"], [0, 0, 9.81])

    def test_unknown_guid_raises(self):
        factors = [ba.make_prior_pose3(ba.symbol("x", 0), np.eye(4),
                                       ba.make_isotropic_precision(6, 1.0))]
        data = bytearray(ba.write_graph(factors))
        idx = data.index(b"gtsam::PriorFactor")
        data[idx:idx + 5] = b"gtsXm"
        with pytest.raises(ValueError, match="unknown class GUID"):
            ba.read_graph(bytes(data))

    def test_bad_signature_rejected(self):
        with pytest.raises(ValueError, match="not a boost binary archive"):
            ba.read_values(b"\x05\0\0\0\0\0\0\0hello" + b"\0" * 16)


class TestDumpIntegration:
    def _make_dump(self, tmp_path, n=4):
        from glim_tpu.io.dump import save_dump
        from glim_tpu.types import PointBatch, SubMap
        rng = np.random.default_rng(5)
        submaps, poses = [], []
        for k in range(n):
            pts = rng.normal(size=(128, 3)).astype(np.float32) * 3
            sm = SubMap(id=k, T_world_origin=_pose(2.0 * k),
                        frame=PointBatch.from_numpy(pts))
            submaps.append(sm)
            poses.append(_pose(2.0 * k, 0.01 * k))
        rng2 = np.random.default_rng(7)
        A = rng2.normal(size=(6, 6))
        info = A @ A.T + 6 * np.eye(6)
        factors = dict(i=[0, 1, 2], j=[1, 2, 3],
                       Z=[_pose(2.0), _pose(2.0, 0.01), _pose(2.0, -0.02)],
                       info=[info, 2 * info, np.eye(6) * 1e4],
                       huber=[False, False, False],
                       matching=[(0, 1), (1, 2)], translation_priors=[])
        save_dump(str(tmp_path), submaps, poses, factors=factors)
        return poses, factors

    def test_dump_writes_boost_archives(self, tmp_path):
        self._make_dump(tmp_path)
        assert os.path.exists(tmp_path / "graph.bin")
        assert os.path.exists(tmp_path / "values.bin")
        parsed = ba.read_graph(str(tmp_path / "graph.bin"))
        assert sum(f["_type"] == "BetweenFactor<Pose3>" for f in parsed) == 3
        vals = ba.read_values(str(tmp_path / "values.bin"))
        assert len(vals) == 4

    def test_reference_dump_loads_exact_graph(self, tmp_path):
        """Without graph.npz (a REFERENCE-style dump), the betweens must be
        restored exactly from graph.bin — not re-estimated."""
        from glim_tpu.io.dump import load_dump
        poses, factors = self._make_dump(tmp_path)
        os.unlink(tmp_path / "graph.npz")
        submaps, got_poses, got = load_dump(str(tmp_path))
        assert got is not None
        assert list(got["i"]) == [0, 1, 2]
        assert list(got["j"]) == [1, 2, 3]
        for Z, gZ in zip(factors["Z"], got["Z"]):
            np.testing.assert_allclose(gZ, Z, atol=1e-12)
        for info, ginfo in zip(factors["info"], got["info"]):
            np.testing.assert_allclose(
                ginfo, info + np.eye(6) * 1e-9 * max(np.trace(info), 1.0),
                rtol=1e-9, atol=1e-9)
        assert got["matching"] == [(0, 1), (1, 2)]
        # values.bin poses override the (identical here) data.txt poses
        for p, gp in zip(poses, got_poses):
            np.testing.assert_allclose(gp, p, atol=1e-12)

    def test_corrupt_graph_bin_falls_back(self, tmp_path):
        from glim_tpu.io.dump import load_dump
        self._make_dump(tmp_path)
        os.unlink(tmp_path / "graph.npz")
        with open(tmp_path / "graph.bin", "r+b") as f:
            f.seek(40)
            f.write(b"\xff" * 64)
        submaps, got_poses, got = load_dump(str(tmp_path))
        # manifest matching factors still available for recover_graph
        assert got is not None and got["matching"] == [(0, 1), (1, 2)]
        assert got["i"] == []


class _QuatModeWriter(ba.BoostBinaryWriter):
    """Emits Rot3 in GTSAM_USE_QUATERNIONS=ON layout (test double for a
    quaternion-mode gtsam build): the Quaternion sub-object's class-info
    preamble once, then 4 doubles (w, x, y, z)."""

    def __init__(self, with_preamble=True):
        super().__init__()
        self._with_preamble = with_preamble
        self._quat_seen = False

    def _field(self, ftype, v):
        if ftype == "rot3":
            m = np.asarray(v, np.float64).reshape(3, 3)
            # matrix -> (w, x, y, z)
            w = np.sqrt(max(1.0 + np.trace(m), 0.0)) / 2.0
            x = (m[2, 1] - m[1, 2]) / (4 * w)
            y = (m[0, 2] - m[2, 0]) / (4 * w)
            z = (m[1, 0] - m[0, 1]) / (4 * w)
            if self._with_preamble and not self._quat_seen:
                self._quat_seen = True
                self.ctx.register_class("Quaternion")
                self.w.u8(0)
                self.w.u32(0)
            self.w.f64s(np.array([w, x, y, z]))
            return
        super()._field(ftype, v)


class TestQuaternionModeRead:
    """GTSAM_USE_QUATERNIONS=ON archives load (read-side support matrix:
    {matrix, quaternion}; VERDICT r4 item 7)."""

    @pytest.mark.parametrize("with_preamble", [True, False])
    def test_values_quaternion_mode(self, with_preamble):
        poses = {ba.symbol("x", i): _pose(1.0 * i, 0.5, 0.3 * i)
                 for i in range(4)}
        wr = _QuatModeWriter(with_preamble)
        wr.save_value("Values", {"values": {
            k: ba.make_generic_pose3(T) for k, T in sorted(poses.items())}})
        vals = ba.read_values(wr.bytes_())
        assert set(vals) == set(poses)
        for k, T in poses.items():
            np.testing.assert_allclose(ba.pose3_to_matrix(vals[k]["value"]),
                                       T, atol=1e-12)

    def test_graph_quaternion_mode(self, ):
        noise = ba.make_isotropic_precision(6, 100.0)
        factors = [ba.make_between_pose3(ba.symbol("x", 0), ba.symbol("x", 1),
                                         _pose(1.0, 0.2, 0.1), noise),
                   ba.make_prior_pose3(ba.symbol("x", 0), _pose(), noise)]
        wr = _QuatModeWriter()
        wr.save_value("NonlinearFactorGraph", {"base": {"factors": factors}})
        out = ba.read_graph(wr.bytes_())
        assert len(out) == 2
        np.testing.assert_allclose(
            ba.pose3_to_matrix(out[0]["measured"]), _pose(1.0, 0.2, 0.1),
            atol=1e-12)

    def test_matrix_mode_still_discriminated(self):
        data = ba.write_values({ba.symbol("x", 0):
                                ba.make_generic_pose3(_pose(2.0))})
        rd = ba.BoostBinaryReader(data)
        rd.load_value("Values")
        assert rd._rot3_mode == "matrix"


class TestAdversarialStreams:
    """Property/fuzz coverage beyond self-consistency (VERDICT r4 item 7):
    randomized graphs with SHARED noise models (object-id back-references),
    truncated and bit-flipped streams must raise cleanly, and large dynamic
    matrices round-trip."""

    def _random_graph(self, rng, n_factors=12):
        # Three shared noise model OBJECTS across many factors — gtsam
        # shares noise models, so the object_reference path is live.
        noises = [ba.make_isotropic_precision(6, 10.0 ** rng.integers(0, 4))
                  for _ in range(3)]
        factors = []
        for i in range(n_factors):
            nz = noises[int(rng.integers(0, 3))]
            if rng.random() < 0.5:
                factors.append(ba.make_between_pose3(
                    ba.symbol("x", i), ba.symbol("x", i + 1),
                    _pose(float(rng.normal()), float(rng.normal()),
                          float(rng.normal(0, 0.5))), nz))
            else:
                factors.append(ba.make_prior_pose3(
                    ba.symbol("x", i), _pose(float(rng.normal())), nz))
        return factors, noises

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_shared_noise_objects_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        factors, noises = self._random_graph(rng)
        data = ba.write_graph(factors)
        out = ba.read_graph(data)
        assert len(out) == len(factors)
        # Shared writer objects must come back as shared reader objects
        # (object-id back-references, not re-serialized copies).
        ids = {}
        for f_in, f_out in zip(factors, out):
            nid_in = id(f_in["base"]["noiseModel"])
            nid_out = id(f_out["base"]["noiseModel"])
            if nid_in in ids:
                assert ids[nid_in] == nid_out, "shared noise not deduped"
            ids[nid_in] = nid_out
        assert len(set(ids.values())) == len(noises)
        for f_in, f_out in zip(factors, out):
            info_in, _ = ba.noise_information(f_in["base"]["noiseModel"])
            info_out, _ = ba.noise_information(f_out["base"]["noiseModel"])
            np.testing.assert_allclose(info_in, info_out, rtol=1e-12)

    def test_truncated_streams_raise(self):
        rng = np.random.default_rng(3)
        factors, _ = self._random_graph(rng, n_factors=6)
        data = ba.write_graph(factors)
        for frac in (0.1, 0.5, 0.9, 0.99):
            cut = data[:int(len(data) * frac)]
            with pytest.raises((ValueError, struct.error, KeyError,
                                IndexError)):
                ba.read_graph(cut)

    def test_bitflipped_streams_fail_cleanly(self):
        """Every single-byte corruption either raises a clean error or
        yields a parse (flips inside float payloads are undetectable by
        ANY codec) — never hangs, never crashes the interpreter."""
        rng = np.random.default_rng(4)
        factors, _ = self._random_graph(rng, n_factors=4)
        data = bytearray(ba.write_graph(factors))
        for _ in range(200):
            i = int(rng.integers(0, len(data)))
            bit = 1 << int(rng.integers(0, 8))
            data[i] ^= bit
            try:
                ba.read_graph(bytes(data))
            except (ValueError, struct.error, KeyError, IndexError,
                    OverflowError, MemoryError, UnicodeDecodeError):
                pass
            data[i] ^= bit          # restore

    def test_large_dynamic_matrix_roundtrip(self):
        """Gaussian sqrt_information is a DYNAMIC Eigen matrix; pin the
        [rows][cols][column-major raw] layout at a non-trivial size."""
        rng = np.random.default_rng(5)
        A = rng.normal(size=(24, 24))
        info = A @ A.T + np.eye(24) * 1e-3
        noise = ba.make_gaussian_information(info)
        # PoseTranslationPrior carries a 6-dof noise normally; use a raw
        # Gaussian here purely to exercise the matrix path at 24x24.
        wr = ba.BoostBinaryWriter()
        wr.save_value("noiseModel::Gaussian", noise)
        rd = ba.BoostBinaryReader(wr.bytes_())
        out = rd.load_value("noiseModel::Gaussian")
        np.testing.assert_allclose(out["sqrt_information"],
                                   noise["sqrt_information"], rtol=1e-15)
        got = out["sqrt_information"].T @ out["sqrt_information"]
        np.testing.assert_allclose(got, info, rtol=1e-9)
