"""GlobalMapping IMU endpoint-chain factor tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from glim_tpu.mapping.global_mapping import GlobalMapping, GlobalMappingParams
from glim_tpu.types import EstimationFrame, PointBatch, SubMap


def make_submap_with_frames(rng, sid, T_world, t0, world_pts, cap=1024):
    """Submap observing a shared structured world, with endpoint frames."""
    Ti = np.linalg.inv(T_world)
    local = (Ti[:3, :3] @ world_pts.T).T + Ti[:3, 3]
    n = len(local)
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = local
    mask = np.zeros(cap, bool)
    mask[:n] = True
    covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.05, (cap, 3, 3)).copy()
    sm = SubMap(id=sid, T_world_origin=np.asarray(T_world, np.float64),
                frame=PointBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                                 covs=jnp.asarray(covs)))
    # Two frames at the endpoints (stationary submap for simplicity).
    for k, dt in enumerate([0.0, 0.4]):
        fr = EstimationFrame(id=10 * sid + k, stamp=t0 + dt,
                             T_world_lidar=np.asarray(T_world, np.float64))
        fr.v_world_imu = np.zeros(3)
        sm.frames.append(fr)
        sm.odom_frames.append(fr.clone())
    return sm


@pytest.mark.slow
class TestGlobalMappingIMU:
    def test_imu_chain_created_and_stable(self, rng):
        world = rng.uniform(-10, 10, size=(700, 3))
        world[:, 2] = np.abs(world[:, 2]) * 0.3

        gm = GlobalMapping(GlobalMappingParams(
            enable_imu=True, enable_optimization=True,
            submap_voxel_resolution=0.5, voxel_capacity=16384))

        # Static platform: gravity-only IMU between submaps.
        t = 0.0
        for k in range(3):
            # 1 s of 200 Hz IMU before each submap.
            for i in range(200):
                gm.insert_imu(t + i * 0.005, np.array([0, 0, 9.80665]), np.zeros(3))
            t += 1.0
            T = np.eye(4)
            gm.insert_submap(make_submap_with_frames(rng, k, T, t - 0.5, world))

        assert len(gm.imu_factors) == 2
        assert len(gm.junction_states) == 2
        # A static, consistent setup must stay at identity after optimization
        # (the IMU chain must not fight the matching factors).
        for k in range(3):
            np.testing.assert_allclose(gm.poses[k][:3, 3], 0.0, atol=0.05)
        # Junction velocities stay near zero.
        for js in gm.junction_states:
            assert np.linalg.norm(js[:6]) < 0.3

    def test_no_imu_no_factors(self, rng):
        world = rng.uniform(-10, 10, size=(500, 3))
        gm = GlobalMapping(GlobalMappingParams(enable_imu=True,
                                               enable_optimization=False,
                                               voxel_capacity=16384))
        for k in range(2):
            T = np.eye(4)
            gm.insert_submap(make_submap_with_frames(rng, k, T, float(k), world))
        assert len(gm.imu_factors) == 0   # no IMU data buffered
