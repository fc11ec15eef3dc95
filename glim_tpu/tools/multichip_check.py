"""Production-scale multi-device parity check for the global backend.

The 3-submap dryrun leg of earlier rounds could not catch shard-boundary
bugs (padding rows crossing shard edges, psum of masked blocks); this
builds a drifting ring at >= 64 submaps / >= 300 matching factors through
the REAL GlobalMapping insert path, then runs the exact same padded
argument set through ``global_gn`` with the factor axis sharded over the
mesh AND single-device, asserting the resulting poses match (VERDICT r4
item 4). Used by both __graft_entry__.dryrun_multichip and the slow-tier
test in tests/test_parallel.py.
"""

from __future__ import annotations

import numpy as np


def backend_parity_check(mesh, n_submaps: int = 64, step: float = 2.5,
                         atol: float = 5e-4) -> dict:
    """Build the ring through GlobalMapping, then compare sharded vs
    single-device global_gn on the identical padded args. Returns a stats
    dict (submaps, factors, max pose delta); raises on mismatch."""
    import jax.numpy as jnp

    from glim_tpu.mapping.global_factors import global_gn
    from glim_tpu.mapping.global_mapping import (GlobalMapping,
                                                 GlobalMappingParams)
    from glim_tpu.ops import lie_np
    from glim_tpu.types import PointBatch, SubMap

    rng = np.random.default_rng(7)
    radius = n_submaps * step / (2 * np.pi)
    # Structured world: wall segments + pillars around the ring (planar
    # geometry gives VGICP full-rank constraints; random blobs do not).
    pts_w = []
    for k in range(max(n_submaps // 2, 8)):
        ang = 2 * np.pi * k / max(n_submaps // 2, 8)
        cx, cy = radius * np.cos(ang), radius * np.sin(ang)
        u = rng.uniform(-3, 3, 80)
        z = rng.uniform(0, 3, 80)
        c, s = np.cos(ang), np.sin(ang)
        pts_w.append(np.stack([cx + u * c, cy + u * s, z], 1))
        pts_w.append(np.stack([cx - u * s + 1.0, cy + u * c, z], 1))
        p0 = np.array([cx, cy]) + rng.uniform(-4, 4, 2)
        pts_w.append(np.stack([np.full(30, p0[0]) + rng.normal(0, 0.04, 30),
                               np.full(30, p0[1]) + rng.normal(0, 0.04, 30),
                               rng.uniform(0, 3, 30)], 1))
    world = np.concatenate(pts_w)

    drift = lie_np.se3_exp(np.array([0, 0, 2e-4, 2e-3, 0, 0]))
    gm = GlobalMapping(GlobalMappingParams(
        enable_imu=False, voxel_capacity=4096, matching_points=256,
        submap_voxelmap_levels=1, lm_iterations=3,
        min_implicit_loop_overlap=0.03, max_implicit_loop_distance=radius,
        enable_optimization=False, enable_precompile=False,
        use_device_mesh=False))
    gm.defer_optimization = True
    T_true_prev, T_odom = None, np.eye(4)
    cap = 512
    for k in range(n_submaps):
        ang = 2 * np.pi * k / n_submaps
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
        d = np.linalg.norm(world[:, :2] - T_true[:2, 3], axis=1)
        vis = world[d < 8.0]
        if len(vis) > cap:
            vis = vis[rng.choice(len(vis), cap, replace=False)]
        Ti = np.linalg.inv(T_true)
        local = (Ti[:3, :3] @ vis.T).T + Ti[:3, 3]
        pts = np.zeros((cap, 3), np.float32)
        pts[:len(local)] = local + rng.normal(0, 0.004, local.shape)
        mask = np.zeros(cap, bool)
        mask[:len(local)] = True
        gm.insert_submap(SubMap(id=k, T_world_origin=T_odom.copy(),
                                frame=PointBatch(points=jnp.asarray(pts),
                                                 mask=jnp.asarray(mask),
                                                 covs=None)))
    F = len(gm.matching_factors)
    assert F >= 300, f"only {F} factors; the parity check needs >= 300"

    args, dims = gm._padded_args()
    iters = gm.params.lm_iterations
    T_sh, _, err_sh, _ = global_gn(**args, **dims, iters=iters,
                                   shard_mesh=mesh)
    T_1d, _, err_1d, _ = global_gn(**args, **dims, iters=iters,
                                   shard_mesh=None)
    T_sh = np.asarray(T_sh)[:n_submaps]
    T_1d = np.asarray(T_1d)[:n_submaps]
    assert np.all(np.isfinite(T_sh)) and np.all(np.isfinite(T_1d))
    delta = float(np.max(np.abs(T_sh - T_1d)))
    np.testing.assert_allclose(T_sh, T_1d, atol=atol)
    return dict(submaps=n_submaps, factors=F, factor_rows=dims["Fp"],
                max_pose_delta=delta, err_sharded=float(err_sh),
                err_single=float(err_1d))
