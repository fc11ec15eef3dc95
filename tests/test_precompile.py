"""Background bucket precompilation (mapping/precompile.py).

The live backend must never stall on an XLA compile: padding-bucket
program variants are compiled ahead of time on a worker thread
(VERDICT r4 #1; the reference's iSAM2 increments never stall,
global_mapping.cpp:492-544). These tests pin

  * aval equivalence: the dummy arguments the worker compiles against hit
    the SAME jit-cache entry as the live `_padded_args` assembly (shapes,
    dtypes, weak types, pytree structure), for both the IMU-less and the
    IMU (Jp > 0) signatures;
  * the worker machinery itself (dedup, wait_idle/wait_for, stop);
  * the end-to-end guarantee: inserting across a bucket crossing with
    realistic lead time (the worker is allowed to finish between inserts,
    as a real submap cadence allows) records ZERO live-thread compile
    misses.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glim_tpu.mapping.global_factors import bucket, global_gn
from glim_tpu.mapping.global_mapping import GlobalMapping, GlobalMappingParams
from glim_tpu.mapping.precompile import Precompiler, dummy_gn_args
from glim_tpu.types import PointBatch, SubMap


def _make_submap(rng, sid, offset, m=512):
    pts = rng.uniform(-6, 6, (m, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) * 0.5
    T = np.eye(4)
    T[:3, 3] = offset
    return SubMap(id=sid, T_world_origin=T,
                  frame=PointBatch(points=jnp.asarray(pts),
                                   mask=jnp.ones(m, bool), covs=None))


def _gm(**kw):
    kw.setdefault("enable_imu", False)
    kw.setdefault("voxel_capacity", 8192)
    kw.setdefault("submap_voxelmap_levels", 1)
    kw.setdefault("matching_points", 512)
    kw.setdefault("enable_precompile", False)
    return GlobalMapping(GlobalMappingParams(**kw))


def _avals(tree):
    return jax.tree_util.tree_map(
        lambda x: None if x is None else jax.api_util.shaped_abstractify(x),
        tree, is_leaf=lambda x: x is None)


class TestDummyArgEquivalence:
    def test_avals_match_real_assembly(self):
        rng = np.random.default_rng(3)
        gm = _gm()
        gm.defer_optimization = True
        for i in range(3):
            gm.insert_submap(_make_submap(rng, i, np.array([2.0 * i, 0, 0])))
        args, dims = gm._padded_args()
        M = int(gm._m_pts[0].shape[0])
        dummy = dummy_gn_args(dims, M, gm.params.matching_weight)
        assert set(args) == set(dummy)
        real_avals = _avals(args)
        dummy_avals = _avals(dummy)
        for k in args:
            assert real_avals[k] == dummy_avals[k], \
                f"aval mismatch for {k}: {real_avals[k]} vs {dummy_avals[k]}"

    def test_avals_match_with_imu_junctions(self):
        """The Jp > 0 signature: junction states + preintegration pytrees
        must match the live assembly's dtypes leaf-for-leaf."""
        from glim_tpu.common.imu_integration import IMUIntegration
        rng = np.random.default_rng(4)
        gm = _gm()
        gm.defer_optimization = True
        for i in range(2):
            gm.insert_submap(_make_submap(rng, i, np.array([2.0 * i, 0, 0])))
        integ = IMUIntegration()
        for t in np.arange(0.0, 0.3, 0.01):
            integ.insert_imu(t, np.array([0.0, 0.0, 9.81]),
                             np.array([0.0, 0.0, 0.01]))
        pre, n = integ.integrate_imu(0.0, 0.25, np.zeros(6))
        assert n >= 2
        gm.imu_factors.append(dict(i=0, j=1, pre=pre,
                                   A_R=np.eye(4, dtype=np.float32),
                                   A_L=np.eye(4, dtype=np.float32),
                                   junction=0))
        gm.junction_states.append(np.zeros(12))
        args, dims = gm._padded_args()
        assert dims["Jp"] > 0
        M = int(gm._m_pts[0].shape[0])
        dummy = dummy_gn_args(dims, M, gm.params.matching_weight)
        real_avals = _avals(args)
        dummy_avals = _avals(dummy)
        for k in args:
            assert real_avals[k] == dummy_avals[k], \
                f"aval mismatch for {k}: {real_avals[k]} vs {dummy_avals[k]}"

    def test_dummy_call_warms_real_cache(self):
        """Calling global_gn on the dummy args must leave the jit cache in
        a state where the REAL call adds no new entry (zero recompile)."""
        rng = np.random.default_rng(5)
        gm = _gm()
        gm.defer_optimization = True
        for i in range(3):
            gm.insert_submap(_make_submap(rng, i, np.array([2.0 * i, 0, 0])))
        args, dims = gm._padded_args()
        M = int(gm._m_pts[0].shape[0])
        dummy = dummy_gn_args(dims, M, gm.params.matching_weight)
        kw = dict(dims, iters=gm.params.lm_iterations, shard_mesh=gm._mesh)
        jax.block_until_ready(global_gn(**dummy, **kw))
        n0 = global_gn._cache_size()
        jax.block_until_ready(global_gn(**args, **kw))
        assert global_gn._cache_size() == n0, \
            "real call recompiled despite dummy warmup"


class TestPrecompilerWorker:
    def test_dedup_and_wait(self):
        pc = Precompiler(name="test-pc")
        try:
            calls = []
            assert pc.submit("a", lambda: calls.append("a"))
            # duplicate signature is dropped (queued or already done)
            pc.submit("a", lambda: calls.append("dup"))
            assert pc.submit("b", lambda: calls.append("b"))
            assert pc.wait_idle(timeout=10.0)
            assert calls in (["a", "b"], ["b", "a"])
            assert pc.ready("a") and pc.ready("b")
            assert not pc.ready("c")
            assert pc.submit("a", lambda: None) is False   # done -> dropped
        finally:
            pc.stop()

    def test_error_does_not_kill_worker(self):
        pc = Precompiler(name="test-pc-err")
        try:
            pc.submit("boom", lambda: 1 / 0)
            pc.submit("ok", lambda: None)
            assert pc.wait_idle(timeout=10.0)
            assert not pc.ready("boom")
            assert pc.ready("ok")
            assert pc.stats["errors"] == 1
        finally:
            pc.stop()

    def test_wait_for(self):
        import time
        pc = Precompiler(name="test-pc-wait")
        try:
            pc.submit("slow", lambda: time.sleep(0.2))
            assert pc.wait_for("slow", timeout=10.0)
            assert pc.ready("slow")
            # never-submitted signature: returns promptly, not ready
            assert pc.wait_for("ghost", timeout=0.5) is False
        finally:
            pc.stop()


class TestLivePipelineNoStall:
    @pytest.mark.slow
    def test_bucket_crossing_zero_misses(self):
        """Insert across the 8->16 submap/factor bucket crossing with the
        worker given realistic lead time (wait_idle between inserts, as a
        real multi-second submap cadence allows): the live thread must
        never compile a global_gn variant itself (misses == 0), and every
        optimize after the first must find its program ready."""
        rng = np.random.default_rng(6)
        gm = _gm(enable_precompile=True, optimization_interval_submaps=1,
                 max_implicit_loop_distance=10.0,
                 min_implicit_loop_overlap=0.05)
        assert gm.precompiler is not None
        for i in range(12):
            gm.insert_submap(_make_submap(rng, i, np.array([1.5 * i, 0, 0])))
            # Realistic cadence: the worker finishes before the next submap.
            gm.precompiler.wait_idle(timeout=300.0)
        assert len(gm.submaps) == 12
        assert bucket(len(gm.submaps)) == 16      # crossed 8 -> 16
        stats = gm.precompile_stats
        assert stats["misses"] == 0, f"live-thread compiles: {stats}"
        assert stats["hits"] >= 1
        # Sanity: the map stayed consistent through the crossing.
        assert all(np.all(np.isfinite(T)) for T in gm.poses)


class TestInsertPathWarmup:
    def test_insert_path_hits_warm_cache(self):
        """After the tick's insert-path predictions are compiled, further
        inserts (overlap sweep, correspondence lookup, match-stack scatter)
        must add ZERO new jit-cache entries — the on-chip stress run showed
        2.5 s opt.args / 1.7 s matching-factor means in the first window
        from exactly these programs compiling inline."""
        from glim_tpu.ops import gicp
        from glim_tpu.ops import voxelmap as vmx

        class _InlinePC:    # runs submissions synchronously, records sigs
            def __init__(self):
                self.sigs = []

            def ready(self, s):
                return s in self.sigs

            def pending_for(self, s):
                return False

            def submit(self, sig, thunk):
                self.sigs.append(sig)
                thunk()

        rng = np.random.default_rng(7)
        gm = _gm(submap_voxelmap_levels=2,
                 max_implicit_loop_distance=10.0,
                 min_implicit_loop_overlap=0.05,
                 optimization_interval_submaps=1)
        gm.precompiler = _InlinePC()
        gm.insert_submap(_make_submap(rng, 0, np.array([0.0, 0, 0])))
        kinds = {s[0] for s in gm.precompiler.sigs}
        assert {"gn", "lookup", "overlap", "scatter"} <= kinds, kinds

        # Wrap the LIVE call paths: each must find its program already in
        # the jit cache (the tick's predictions — which legitimately add
        # NEW entries as buckets grow — run inside pc.submit, outside
        # these wrappers, so any growth seen here is a live inline
        # compile).
        inline = []
        orig_lk, orig_ov = gm._lookup_rows, gm._batch_overlaps

        def lk_rows(pairs, L):
            n0 = gicp.vgicp_lookup_stacked._cache_size()
            out = orig_lk(pairs, L)
            d = gicp.vgicp_lookup_stacked._cache_size() - n0
            if d:
                inline.append(("lookup", len(pairs), d))
            return out

        def b_ov(pairs):
            n0 = vmx.voxelmap_overlap_stacked._cache_size()
            out = orig_ov(pairs)
            d = vmx.voxelmap_overlap_stacked._cache_size() - n0
            if d:
                inline.append(("overlap", len(pairs), d))
            return out

        gm._lookup_rows, gm._batch_overlaps = lk_rows, b_ov
        for i in range(1, 6):
            gm.insert_submap(_make_submap(rng, i, np.array([1.5 * i, 0, 0])))
        assert not inline, f"live-path inline compiles: {inline}"
