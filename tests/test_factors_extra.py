"""Translation-prior and rotate-vector3 analytic factors + RGBA color
extraction in the PointCloud2 converter."""

import types

import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import factors, lie, lie_np, solver
from glim_tpu.ros.cloud_converter import extract_raw_points


class TestTranslationPrior:
    def test_pulls_translation_only(self):
        T = jnp.eye(4)[None]
        t_meas = jnp.asarray([[1.0, 2.0, 3.0]])
        si = jnp.ones((1, 3))
        H, b, err = factors.translation_prior_linearize(T, t_meas, si)
        delta = np.asarray(solver.solve_damped(H[0], b[0], jnp.float32(0.0)))
        # GN step lands exactly on the measured translation, zero rotation.
        np.testing.assert_allclose(delta[3:], [1.0, 2.0, 3.0], atol=1e-5)
        np.testing.assert_allclose(delta[:3], 0.0, atol=1e-6)
        assert float(err[0]) > 0


class TestRotateVector3:
    def test_aligns_gravity(self):
        # Pose rotated 0.3 rad about x; the factor should rotate it back so
        # that R @ ez == ez, leaving translation untouched.
        T0 = lie_np.se3_exp(np.array([0.3, 0.0, 0.0, 0, 0, 0])).astype(np.float32)
        ez = jnp.asarray([[0.0, 0.0, 1.0]])
        si = jnp.ones((1, 3)) * 10.0

        T = jnp.asarray(T0)[None]
        for _ in range(10):
            H, b, err = factors.rotate_vector3_linearize(T, ez, ez, si)
            delta = solver.solve_damped(H[0] + jnp.eye(6) * 1e-3, b[0],
                                        jnp.float32(0.0))
            T = (T[0] @ lie.se3_exp(delta))[None]
        R = np.asarray(T[0][:3, :3], np.float64)
        np.testing.assert_allclose(R @ [0, 0, 1], [0, 0, 1], atol=1e-4)
        np.testing.assert_allclose(np.asarray(T[0][:3, 3]), 0.0, atol=1e-5)


class TestPointCloud2Colors:
    def test_rgba_unpacking(self):
        n = 8
        dtype = np.dtype([("x", np.float32), ("y", np.float32),
                          ("z", np.float32), ("rgba", np.uint32)])
        arr = np.zeros(n, dtype)
        arr["x"] = np.arange(n, dtype=np.float32)
        # A=255, R=16, G=32, B=64
        arr["rgba"] = (255 << 24) | (16 << 16) | (32 << 8) | 64

        pf = []
        codes = {np.dtype(np.float32): 7, np.dtype(np.uint32): 6}
        for name in dtype.names:
            pf.append(types.SimpleNamespace(
                name=name, datatype=codes[dtype.fields[name][0]],
                offset=dtype.fields[name][1], count=1))
        msg = types.SimpleNamespace(fields=pf, data=arr.tobytes(),
                                    point_step=dtype.itemsize, width=n,
                                    height=1, is_bigendian=False,
                                    header=None)
        rp = extract_raw_points(msg)
        assert rp.colors is not None and rp.colors.shape == (n, 4)
        np.testing.assert_allclose(rp.colors[0],
                                   [16 / 255, 32 / 255, 64 / 255, 1.0],
                                   atol=1e-6)
