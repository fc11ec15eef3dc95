"""Batched stacked correspondence / overlap kernels vs their per-factor
equivalents, and the GlobalMapping refresh fast path that uses them.

The global backend's correspondence refresh runs as ONE stacked device
program per voxelmap level (ops/gicp.py::vgicp_lookup_stacked,
ops/voxelmap.py::voxelmap_overlap_stacked); these tests pin exact
equality against the single-map kernels the rest of the codebase uses
(reference behavior: the per-factor correspondence searches inside
gtsam_points' VGICP factors, used by glim global_mapping.cpp:430-544).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from glim_tpu.ops import gicp
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.ops.lie_np import se3_exp as se3_exp_np


def _make_world(rng, n=4, m=512):
    """n submap clouds on a line with overlap, plus voxelmaps and poses."""
    base = rng.normal(0, 3.0, (2048, 3)).astype(np.float32)
    poses, pts, masks, vms = [], [], [], []
    for i in range(n):
        T = np.eye(4)
        T[:3, 3] = [i * 1.5, 0, 0]
        T[:3, :3] = se3_exp_np(np.concatenate([rng.normal(0, 0.05, 3),
                                               np.zeros(3)]))[:3, :3]
        poses.append(T)
        local = (np.linalg.inv(T)[:3, :3] @ base.T).T + np.linalg.inv(T)[:3, 3]
        sel = rng.permutation(len(local))[:m]
        p = local[sel].astype(np.float32)
        mask = np.ones(m, bool)
        mask[-7:] = False
        pts.append(jnp.asarray(p))
        masks.append(jnp.asarray(mask))
        covs = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 0.01, (m, 1, 1))
        vm = vmx.empty_gaussian_voxelmap(4096, 0.5 + 0.1 * i)
        vms.append(vmx.voxelmap_insert(vm, pts[-1], masks[-1], covs,
                                       jnp.int32(0)))
    return poses, pts, masks, vms


def _stacks(poses, pts, masks, vms, Sp=8):
    tabs = [vmx.gaussian_lookup_table(vm) for vm in vms]
    V = vms[0].capacity
    from glim_tpu.mapping.global_factors import pad_stack
    keys = pad_stack([k for k, _ in tabs], Sp,
                     np.full((V, 2), vmx.INVALID_HASH, np.int32))
    stats = pad_stack([s for _, s in tabs], Sp, np.zeros((V, 12), np.float32))
    res = pad_stack([vm.resolution for vm in vms], Sp, np.float32(1.0))
    sm_pts = pad_stack(pts, Sp, np.zeros(pts[0].shape, np.float32))
    sm_mask = pad_stack(masks, Sp, np.zeros(masks[0].shape, bool))
    T_all = pad_stack([np.asarray(T, np.float32) for T in poses], Sp,
                      np.eye(4, dtype=np.float32))
    return T_all, sm_pts, sm_mask, keys, stats, res


def test_vgicp_lookup_stacked_matches_single():
    rng = np.random.default_rng(3)
    poses, pts, masks, vms = _make_world(rng)
    T_all, sm_pts, sm_mask, keys, stats, res = _stacks(poses, pts, masks, vms)
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (3, 0), (1, 1)]
    R = 8
    tgt = jnp.asarray(np.array([t for t, _ in pairs] + [0, 0], np.int32))
    src = jnp.asarray(np.array([s for _, s in pairs] + [0, 0], np.int32))
    mu_b, ct_b, hit_b = gicp.vgicp_lookup_stacked(
        T_all, tgt, src, sm_pts, sm_mask, keys, stats, res)
    assert mu_b.shape == (R,) + pts[0].shape
    for k, (t, s) in enumerate(pairs):
        mu1, ct1, hit1 = gicp.vgicp_lookup(
            jnp.asarray(poses[t], jnp.float32),
            jnp.asarray(poses[s], jnp.float32), pts[s], masks[s], vms[t])
        np.testing.assert_array_equal(np.asarray(hit_b[k]), np.asarray(hit1))
        h = np.asarray(hit1)
        np.testing.assert_allclose(np.asarray(mu_b[k])[h],
                                   np.asarray(mu1)[h], rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(ct_b[k])[h],
                                   np.asarray(ct1)[h], rtol=0, atol=0)
        assert np.asarray(hit1).sum() > 50   # the test world really overlaps


def test_voxelmap_overlap_stacked_matches_single():
    rng = np.random.default_rng(4)
    poses, pts, masks, vms = _make_world(rng)
    T_all, sm_pts, sm_mask, keys, stats, res = _stacks(poses, pts, masks, vms)
    pairs = [(0, 1), (2, 1), (3, 0), (1, 3)]
    R = 8
    T_rel = np.stack([np.linalg.inv(poses[t]) @ poses[s] for t, s in pairs]
                     + [np.eye(4)] * (R - len(pairs))).astype(np.float32)
    tgt = jnp.asarray(np.array([t for t, _ in pairs] + [0] * 4, np.int32))
    src = jnp.asarray(np.array([s for _, s in pairs] + [0] * 4, np.int32))
    ovs = vmx.voxelmap_overlap_stacked(jnp.asarray(T_rel), tgt, src,
                                       sm_pts, sm_mask, keys, res)
    for k, (t, s) in enumerate(pairs):
        ov1 = vmx.voxelmap_overlap(
            vms[t], pts[s], masks[s],
            jnp.asarray(np.linalg.inv(poses[t]) @ poses[s], jnp.float32))
        np.testing.assert_allclose(float(ovs[k]), float(ov1), atol=1e-6)
        assert float(ov1) > 0.2


@pytest.mark.parametrize("defer", [False, True])
def test_global_mapping_batched_refresh_consistency(defer):
    """End-to-end: a small drifting chain optimized with the batched
    refresh converges, and the match-stack fast path stays byte-consistent
    with a from-scratch stack rebuild."""
    from glim_tpu.mapping.global_mapping import (GlobalMapping,
                                                 GlobalMappingParams)
    from glim_tpu.types import PointBatch, SubMap

    rng = np.random.default_rng(11)
    world = rng.normal(0, 4.0, (4096, 3)).astype(np.float32)
    gm = GlobalMapping(GlobalMappingParams(
        enable_imu=False, submap_voxel_resolution=0.4,
        voxel_capacity=8192, min_implicit_loop_overlap=0.1,
        max_implicit_loop_distance=50.0,
        optimization_interval_submaps=3))
    gm.defer_optimization = defer
    T_true, T_odom = [], []
    drift = se3_exp_np(np.array([0, 0, 1e-3, 6e-3, 0, 0]))
    cur = np.eye(4)
    for k in range(6):
        T = np.eye(4)
        T[:3, 3] = [k * 1.2, 0.3 * np.sin(k), 0]
        T_true.append(T)
        cur = cur @ (np.linalg.inv(T_true[k - 1]) @ T if k else T) \
            @ (drift if k else np.eye(4))
        T_odom.append(cur.copy())
        local = (np.linalg.inv(T)[:3, :3] @ world.T).T \
            + np.linalg.inv(T)[:3, 3]
        keep = np.linalg.norm(local, axis=1) < 6.0
        m = 1024
        pts = np.zeros((m, 3), np.float32)
        sel = np.where(keep)[0][:m]
        pts[:len(sel)] = local[sel] + rng.normal(0, 0.004, (len(sel), 3))
        mask = np.zeros(m, bool)
        mask[:len(sel)] = True
        sm = SubMap(id=k, T_world_origin=cur.copy(),
                    frame=PointBatch(points=jnp.asarray(pts),
                                     mask=jnp.asarray(mask), covs=None))
        gm.insert_submap(sm)
    gm.defer_optimization = False
    gm.optimize()
    # Consistency of the scatter fast path vs a clean rebuild. A rebuild
    # re-searches at the CURRENT poses (rows are no longer pinned per
    # pair), so first force a full refresh at the current poses — after
    # that, fast-path rows and rebuild rows come from identical searches
    # and must match byte-for-byte.
    shove = se3_exp_np(np.array([0, 0, 0, 1.0, 0, 0]))  # 1 m >> threshold
    for pair in list(gm._f_cache):
        gm._f_cache[pair]["T_rel"] = gm._f_cache[pair]["T_rel"] @ shove
    assert gm._refresh_stale_factors() == len(gm.matching_factors)
    st = gm._match_stack
    assert st is not None
    gm._padded_args()                      # drain any pending rows
    st = gm._match_stack
    fast = (np.asarray(st["f_mu"]).copy(), np.asarray(st["f_ct"]).copy(),
            np.asarray(st["f_hit"]).copy())
    gm._match_stack = None
    mu2, ct2, hit2 = gm._match_stacks(st["Fp"], st["L"],
                                      int(gm._m_pts[0].shape[0]))
    np.testing.assert_array_equal(fast[2], np.asarray(hit2))
    np.testing.assert_allclose(fast[0], np.asarray(mu2), atol=0)
    np.testing.assert_allclose(fast[1], np.asarray(ct2), atol=0)
    # And the chain actually pulled back toward truth.
    errs = [np.linalg.norm(gm.poses[k][:3, 3] - T_true[k][:3, 3])
            for k in range(6)]
    drift_errs = [np.linalg.norm(T_odom[k][:3, 3] - T_true[k][:3, 3])
                  for k in range(6)]
    assert np.sqrt(np.mean(np.square(errs))) \
        < 0.8 * np.sqrt(np.mean(np.square(drift_errs)))
