"""Native runtime tests (with automatic fallback parity)."""

import numpy as np

from glim_tpu.native import available, pack_scan_i16, ply_read, ply_write
from glim_tpu.native.loader import pack_scan_i16 as _pack


class TestNative:
    def test_builds(self):
        # The toolchain is present in this environment; the native path should
        # actually load (the numpy fallback keeps other environments alive).
        assert available()

    def test_pack_roundtrip(self, rng):
        n, cap = 500, 1024
        pts = rng.uniform(-50, 50, (n, 3))
        times = rng.uniform(0, 0.1, n)
        times.sort()
        out, n_used = pack_scan_i16(pts, times, cap, 0.005, 0.1 / 32000.0)
        assert n_used == n
        assert out.shape == (cap, 4)
        rec = out[:n, :3].astype(np.float64) * 0.005
        np.testing.assert_allclose(rec, pts, atol=0.0026)
        rec_t = out[:n, 3].astype(np.float64) * (0.1 / 32000.0)
        np.testing.assert_allclose(rec_t, times, atol=1e-4)
        # Padding stays zero.
        assert (out[n:] == 0).all()

    def test_pack_nonfinite_clamped(self):
        pts = np.array([[np.nan, 1.0, 2.0], [np.inf, 0.0, 0.0], [1.0, 2.0, 3.0]])
        out, n = pack_scan_i16(pts, None, 8, 0.005, 0.0)
        assert n == 3
        assert out[0, 0] == -32767       # NaN clamps low
        assert out[1, 0] == 32767        # inf clamps high
        assert out[2, 0] == round(1.0 / 0.005)

    def test_ply_roundtrip(self, rng, tmp_path):
        pts = rng.normal(size=(1000, 3)).astype(np.float32) * 10
        p = str(tmp_path / "cloud.ply")
        ply_write(p, pts)
        back = ply_read(p)
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_ply_reads_dump_export(self, rng, tmp_path):
        from glim_tpu.io.dump import export_ply
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        p = str(tmp_path / "e.ply")
        export_ply(p, pts)
        back = ply_read(p)
        np.testing.assert_allclose(back, pts, atol=1e-6)
