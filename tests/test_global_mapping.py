"""Matching-cost GlobalMapping tests: implicit loops, drift correction,
save/load, multi-session merge, graph recovery."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from glim_tpu.mapping.global_mapping import GlobalMapping, GlobalMappingParams
from glim_tpu.ops import lie_np
from glim_tpu.types import PointBatch, SubMap


def structured_world(rng, n=1200):
    """Walls + floor (registration-friendly structure)."""
    pts = np.zeros((n, 3))
    k = n // 3
    pts[:k, 0] = rng.uniform(-15, 15, k)
    pts[:k, 1] = rng.uniform(-15, 15, k)
    pts[k:2 * k, 0] = rng.uniform(-15, 15, k)
    pts[k:2 * k, 2] = rng.uniform(0, 5, k)
    pts[k:2 * k, 1] = 15.0
    pts[2 * k:, 1] = rng.uniform(-15, 15, n - 2 * k)
    pts[2 * k:, 2] = rng.uniform(0, 5, n - 2 * k)
    pts[2 * k:, 0] = 15.0
    return pts


def submap_observing(rng, sid, world_pts, T_world_true, cap=2048):
    Ti = np.linalg.inv(T_world_true)
    local = (Ti[:3, :3] @ world_pts.T).T + Ti[:3, 3]
    n = len(local)
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = local + rng.normal(size=local.shape) * 0.005
    mask = np.zeros(cap, bool)
    mask[:n] = True
    covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.02, (cap, 3, 3)).copy()
    return SubMap(id=sid, T_world_origin=np.eye(4),
                  frame=PointBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                                   covs=jnp.asarray(covs)))


class TestGlobalMapping:
    def build(self, rng, drift_xi=None, n_submaps=4, step=2.0, **param_kw):
        world = structured_world(rng)
        true_poses = []
        for k in range(n_submaps):
            T = np.eye(4)
            T[0, 3] = step * k
            true_poses.append(T)
        drift = lie_np.se3_exp(np.zeros(6) if drift_xi is None else drift_xi)
        odom = [true_poses[0]]
        for k in range(1, n_submaps):
            dT = np.linalg.inv(true_poses[k - 1]) @ true_poses[k]
            odom.append(odom[-1] @ dT @ drift)

        gm = GlobalMapping(GlobalMappingParams(
            submap_voxel_resolution=0.5, voxel_capacity=16384,
            min_implicit_loop_overlap=0.2, **param_kw))
        for k in range(n_submaps):
            sm = submap_observing(rng, k, world, true_poses[k])
            sm.T_world_origin = odom[k]
            gm.insert_submap(sm)
        return gm, true_poses, odom

    def test_implicit_loop_factors_created(self, rng):
        gm, *_ = self.build(rng, n_submaps=3)
        # All submaps overlap heavily (same world): factors to every prior.
        assert len(gm.matching_factors) >= 3

    def test_drift_corrected(self, rng):
        drift = np.array([0, 0, 0.005, 0.08, 0.05, 0.0])
        gm, true_poses, odom = self.build(rng, drift_xi=drift, n_submaps=4)
        err_odom = np.linalg.norm(odom[-1][:3, 3] - true_poses[-1][:3, 3])
        err_opt = np.linalg.norm(gm.poses[-1][:3, 3] - true_poses[-1][:3, 3])
        assert err_opt < err_odom * 0.5, (err_odom, err_opt)

    def test_save_load_merge(self, rng, tmp_path):
        gm, *_ = self.build(rng, n_submaps=3, create_between_factors=True)
        d = str(tmp_path / "dump")
        gm.save(d)
        assert os.path.exists(os.path.join(d, "graph.npz"))

        gm2 = GlobalMapping(GlobalMappingParams(enable_optimization=False,
                                                voxel_capacity=16384))
        gm2.load(d)
        assert len(gm2.submaps) == 3
        assert len(gm2.matching_factors) == len(gm.matching_factors)
        # Multi-session merge: load the same dump again with an offset.
        gm2.load(d, session_offset=1)
        assert len(gm2.submaps) == 6
        assert gm2.submaps[3].session_id == 1
        # Factor indices were rekeyed past the first session.
        assert max(f[1] for f in gm2.between_factors) >= 4

    def test_recover_graph(self, rng):
        gm, *_ = self.build(rng, n_submaps=3, enable_optimization=False)
        # Orphan submap 2 by dropping its factors.
        gm.matching_factors = [f for f in gm.matching_factors if 2 not in f]
        gm.between_factors = [f for f in gm.between_factors if f[1] != 2]
        gm.recover_graph()
        # Overlap re-evaluation re-creates matching-cost factors (all
        # submaps observe the same world here), so the orphan reconnects
        # through the implicit-loop path, not just an odometry re-chain.
        assert any(2 in f for f in gm.matching_factors) \
            or any(f[1] == 2 for f in gm.between_factors)

    def test_recover_graph_repairs_broken_pose(self, rng):
        gm, _, odom = self.build(rng, n_submaps=3, enable_optimization=False)
        gm.poses[1] = np.full((4, 4), np.nan)
        gm.recover_graph()
        assert np.all(np.isfinite(gm.poses[1]))
        # Re-chained from odometry through the intact neighbor.
        dZ_exp = np.linalg.inv(gm.odom_poses[0]) @ gm.odom_poses[1]
        np.testing.assert_allclose(gm.poses[1], gm.poses[0] @ dZ_exp,
                                   atol=1e-9)

    def test_recover_graph_from_corrupted_dump(self, rng, tmp_path):
        """Reference-depth recovery (global_mapping.cpp:918-1049): corrupt a
        saved graph (drop >30% of factors, including every factor touching
        one submap), reload, recover, re-optimize — accuracy lands within 2x
        of the uncorrupted run."""
        drift = np.array([0, 0, 0.005, 0.08, 0.05, 0.0])
        gm, true_poses, odom = self.build(rng, drift_xi=drift, n_submaps=4,
                                          create_between_factors=True)
        err_clean = np.linalg.norm(gm.poses[-1][:3, 3] - true_poses[-1][:3, 3])
        d = str(tmp_path / "dump")
        gm.save(d)

        # Corrupt graph.npz in place: drop every factor touching submap 2
        # plus enough of the rest to exceed 30% total loss.
        import os as _os
        gp = _os.path.join(d, "graph.npz")
        z = dict(np.load(gp, allow_pickle=True))
        keep_b = [k for k in range(len(z["i"]))
                  if z["i"][k] != 2 and z["j"][k] != 2][:1]
        matching = [p for p in z["matching"] if 2 not in p]
        n_before = len(z["i"]) + len(z["matching"])
        matching = matching[:max(len(matching) - 2, 0)]
        for key, sel in (("i", keep_b), ("j", keep_b), ("Z", keep_b),
                         ("info", keep_b), ("huber", keep_b)):
            z[key] = np.asarray(z[key])[sel]
        z["matching"] = np.asarray(matching, np.int32).reshape(-1, 2)
        n_after = len(z["i"]) + len(z["matching"])
        assert n_after <= 0.7 * n_before
        np.savez(gp, **z)

        gm2 = GlobalMapping(GlobalMappingParams(
            submap_voxel_resolution=0.5, voxel_capacity=16384,
            min_implicit_loop_overlap=0.2, enable_optimization=False))
        gm2.load(d)
        assert not any(2 in f for f in gm2.matching_factors)
        gm2.recover_graph()
        # Submap 2's matching factors were re-created from overlap
        # re-evaluation (everything observes the same world).
        assert any(2 in f for f in gm2.matching_factors)
        gm2.params.enable_optimization = True
        # Poses reloaded from the dump are already optimized; re-seed them
        # with the drifted odometry chain so the re-optimization has real
        # work to redo on the recovered graph.
        for k in range(4):
            gm2.poses[k] = odom[k].copy()
        gm2._new_loop_since_opt = True
        gm2.optimize()
        err_rec = np.linalg.norm(gm2.poses[-1][:3, 3] - true_poses[-1][:3, 3])
        assert err_rec <= max(err_clean * 2.0, 0.02), (err_clean, err_rec)

    def test_find_overlapping_submaps(self, rng):
        gm, *_ = self.build(rng, n_submaps=3, enable_optimization=False)
        before = len(gm.matching_factors)
        gm.matching_factors = []
        gm.find_overlapping_submaps(0.2)
        assert len(gm.matching_factors) >= before

    def test_session_gravity_alignment(self, rng, tmp_path):
        # Append a second session whose odometry poses are tilted 5 deg about
        # x; the gravity-anchor factor should pull the session's up-direction
        # back toward world +z during optimization.
        gm, *_ = self.build(rng, n_submaps=2, create_between_factors=True)
        d = str(tmp_path / "dump")
        gm.save(d)

        gm2 = GlobalMapping(GlobalMappingParams(
            submap_voxel_resolution=0.5, voxel_capacity=16384,
            min_implicit_loop_overlap=0.2, enable_optimization=False))
        gm2.load(d)
        assert gm2.gravity_anchors == []          # first session: no anchor
        gm2.load(d, session_offset=1)
        assert gm2.gravity_anchors == [2]

        tilt = lie_np.se3_exp(np.array([0.087, 0, 0, 0, 0, 0]))
        for k in (2, 3):
            gm2.poses[k] = tilt @ gm2.poses[k]
            gm2.submaps[k].T_world_origin = gm2.poses[k].copy()
        up0 = gm2.poses[2][:3, :3] @ [0, 0, 1]
        gm2.optimize()
        up1 = gm2.poses[2][:3, :3] @ [0, 0, 1]
        assert np.arccos(np.clip(up1[2], -1, 1)) < np.arccos(np.clip(up0[2], -1, 1)) * 0.5, (up0, up1)

    def test_indeterminant_recovery(self, rng, monkeypatch):
        # First solve returns NaN poses -> recovery damps and retries; the
        # retried (real) solve must land on finite poses.
        gm, true_poses, _ = self.build(
            rng, drift_xi=np.array([0, 0, 0.003, 0.05, 0, 0]), n_submaps=3)

        import glim_tpu.mapping.global_mapping as gmod
        real_gn = gmod.global_gn
        calls = {"n": 0}

        def flaky_gn(*args, **kw):
            calls["n"] += 1
            T, junc, err, md = real_gn(*args, **kw)
            if calls["n"] == 1:
                T = T.at[1].set(jnp.nan)
                md = md.at[1].set(jnp.nan)
            return T, junc, err, md

        monkeypatch.setattr(gmod, "global_gn", flaky_gn)
        gm.optimize()
        assert calls["n"] >= 2                      # retried after damping
        assert gm.recovery_damping == {}            # cleared after recovery
        # Selective: the retry damped only the offending pose (index 1),
        # which the flaky solve flagged via its non-finite diagonal.
        assert all(np.all(np.isfinite(T)) for T in gm.poses)
