"""Fixed-capacity voxel maps: Gaussian-statistics (VGICP target) and
point-container (GICP / iVox-style target).

TPU-native re-design of gtsam_points' ``GaussianVoxelMapCPU/GPU`` and
``iVox`` / ``IncrementalVoxelMap<FlatContainer>`` (reference usage:
src/glim/odometry/odometry_estimation_gpu.cpp:96-107,
odometry/odometry_estimation_cpu.cpp:58-67, mapping/sub_mapping.cpp:383-419).

The CUDA versions are bucketed hash tables with atomics; here a voxel map is a
**sorted table**: int32 mixing-hash keys (ties broken by exact int32 coords)
sorted ascending, so

- insertion  = concat(existing-as-weighted-entries, new points) → lexsort →
  segment-reduce (no atomics, deterministic),
- lookup     = vectorized binary search + tiny fixed probe window for hash
  collisions,
- LRU        = top-k on an age counter when over capacity.

Everything is a pytree of fixed-shape arrays; resolution is carried as a
traced scalar so adaptive-resolution maps (reference:
odometry_estimation_gpu.cpp:89-93) do not trigger recompilation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from glim_tpu.ops.pointops import (INVALID_HASH, hash_coords, hash_coords2,
                                   voxel_coords)

_PROBE = 4  # max entries scanned past the binary-search hit. The window only
# needs to cover runs of EQUAL hash_coords values in the sorted table (the
# probe compares the (h1, h2) double hash, so anything else terminates the
# run): ~131k entries yield an expected 4 colliding h1 pairs (birthday bound
# C(n,2)/2^31), i.e. run lengths of 2-3 at the tail. Each probe is one row
# gather, so halving the window halves the lookup's dominant gather cost.


def _sort_by_hash_pair(h1, h2, *payloads):
    """ONE composite-key sort by the (h1, h2) double hash: equal coordinates
    share both hashes, so they land adjacent (double-collision probability
    ~2^-62 per pair) — replaces a 4-key lexsort, i.e. 4 stable sort passes,
    with a single lax.sort. Returns (h1_sorted, h2_sorted, *payloads_sorted).
    Payloads are co-sorted via an iota permutation + gathers."""
    n = h1.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    h1_s, h2_s, order = jax.lax.sort((h1, h2, iota), num_keys=2)
    return (h1_s, h2_s) + tuple(p[order] for p in payloads)


@jax.tree_util.register_dataclass
@dataclass
class GaussianVoxelMap:
    """Sorted-table Gaussian voxel map (VGICP target).

    Per-voxel: mean of inserted points, mean of inserted point covariances
    (the VGICP distribution-to-distribution model), point count, LRU age.
    """

    hash: jnp.ndarray    # (V,) int32, sorted; INVALID_HASH for empty slots
    coords: jnp.ndarray  # (V, 3) int32
    mean: jnp.ndarray    # (V, 3) f32
    cov: jnp.ndarray     # (V, 3, 3) f32
    count: jnp.ndarray   # (V,) f32
    age: jnp.ndarray     # (V,) int32 — higher = more recently updated
    resolution: jnp.ndarray  # () f32

    @property
    def capacity(self) -> int:
        return int(self.hash.shape[0])

    @property
    def valid(self) -> jnp.ndarray:
        return self.hash != INVALID_HASH

    def num_voxels(self) -> jnp.ndarray:
        return jnp.sum(self.valid)


def empty_gaussian_voxelmap(capacity: int, resolution) -> GaussianVoxelMap:
    return GaussianVoxelMap(
        hash=jnp.full((capacity,), INVALID_HASH, jnp.int32),
        coords=jnp.zeros((capacity, 3), jnp.int32),
        mean=jnp.zeros((capacity, 3), jnp.float32),
        cov=jnp.zeros((capacity, 3, 3), jnp.float32),
        count=jnp.zeros((capacity,), jnp.float32),
        age=jnp.zeros((capacity,), jnp.int32),
        resolution=jnp.asarray(resolution, jnp.float32),
    )


def _sorted_reduce(hashes, hashes2, coords, weights, w_mean, w_cov, ages,
                   capacity):
    """Sort entries by the (hash, hash2) pair and segment-reduce weighted
    Gaussian stats into at most ``capacity`` voxels.

    w_mean is weight*mean (sum of points); w_cov is weight*cov (sum of covs).
    The output is ALREADY hash-sorted: segments appear in key order and the
    unused suffix carries INVALID_HASH (the int32 max), so callers need no
    re-sort before binary-search lookups.
    """
    h_s, h2_s, c_s, w_s, wm_s, wc_s, a_s = _sort_by_hash_pair(
        hashes, hashes2, coords, weights, w_mean, w_cov, ages)

    valid = h_s != INVALID_HASH
    same = (h_s[1:] == h_s[:-1]) & (h2_s[1:] == h2_s[:-1])
    starts = jnp.concatenate([valid[:1], ~same]) & valid
    seg_id = jnp.cumsum(starts) - 1                 # non-decreasing
    num_segs = jnp.sum(starts)
    seg_id = jnp.where(valid, seg_id, capacity)  # invalid -> dropped bucket

    # TWO fused segment reductions (one f32 sum over a 13-wide payload, one
    # int32 max over a 5-wide payload) instead of six separate segment ops —
    # scatter-based segment reductions are the insert's hot spot on TPU, so
    # fewer scatter fusions is a direct win. (A scatter-free variant with
    # searchsorted + associative scans measured ~2.6x SLOWER on the chip:
    # searchsorted lowers to a 17-iteration while loop.)
    n_out = capacity + 1
    payload = jnp.concatenate([w_s[:, None], wm_s, wc_s.reshape(-1, 9)], axis=1)
    seg_sum = jax.ops.segment_sum(payload, seg_id, num_segments=n_out)[:capacity]
    sum_w = seg_sum[:, 0]
    sum_wm = seg_sum[:, 1:4]
    sum_wc = seg_sum[:, 4:13]

    imax = jnp.iinfo(jnp.int32).min
    ipayload = jnp.where(valid[:, None],
                         jnp.concatenate([h_s[:, None], c_s, a_s[:, None]],
                                         axis=1), imax)
    seg_imax = jax.ops.segment_max(ipayload, seg_id, num_segments=n_out)[:capacity]
    seg_hash = seg_imax[:, 0]
    seg_coords = seg_imax[:, 1:4]
    seg_age = seg_imax[:, 4]

    slot_valid = jnp.arange(capacity) < num_segs
    seg_hash = jnp.where(slot_valid, seg_hash, INVALID_HASH)
    seg_age = jnp.where(slot_valid, seg_age, -1)
    return (seg_hash, seg_coords, sum_w, sum_wm,
            sum_wc.reshape(-1, 3, 3), seg_age)


@jax.jit
def voxelmap_insert(vm: GaussianVoxelMap, points: jnp.ndarray, mask: jnp.ndarray,
                    covs: jnp.ndarray, step: jnp.ndarray) -> GaussianVoxelMap:
    """Merge a padded point batch (+covs) into the map. ``step`` is the LRU
    stamp for the touched voxels. If the merged voxel count exceeds capacity,
    the least-recently-updated voxels are dropped."""
    V = vm.capacity
    C = points.shape[0]
    inv_res = 1.0 / vm.resolution

    p_coords = voxel_coords(points, inv_res)
    p_hash = jnp.where(mask, hash_coords(p_coords), INVALID_HASH)
    p_hash2 = jnp.where(mask, hash_coords2(p_coords), INVALID_HASH)
    p_w = mask.astype(jnp.float32)
    p_wm = jnp.where(mask[:, None], points, 0.0)
    p_wc = jnp.where(mask[:, None, None], covs, 0.0)
    p_age = jnp.where(mask, step, -1)

    e_valid = vm.valid
    e_hash = vm.hash
    e_hash2 = jnp.where(e_valid, hash_coords2(vm.coords), INVALID_HASH)
    e_w = vm.count
    e_wm = vm.mean * vm.count[:, None]
    e_wc = vm.cov * vm.count[:, None, None]

    hashes = jnp.concatenate([e_hash, p_hash])
    hashes2 = jnp.concatenate([e_hash2, p_hash2])
    coords = jnp.concatenate([vm.coords, p_coords])
    weights = jnp.concatenate([e_w, p_w])
    w_mean = jnp.concatenate([e_wm, p_wm])
    w_cov = jnp.concatenate([e_wc, p_wc])
    ages = jnp.concatenate([jnp.where(e_valid, vm.age, -1), p_age])

    seg = _sorted_reduce(hashes, hashes2, coords, weights, w_mean, w_cov,
                         ages, V + C)
    s_hash, s_coords, s_w, s_wm, s_wc, s_age = seg
    n_merged = jnp.sum(s_hash != INVALID_HASH)

    def no_evict(_):
        # Common case: merged voxels fit in capacity. The reduced arrays are
        # already hash-sorted with all valid segments in the prefix — just
        # truncate. No top_k, no second sort.
        return (s_hash[:V], s_coords[:V], s_w[:V], s_wm[:V], s_wc[:V], s_age[:V])

    def evict(_):
        # Overflow: keep the V most recently updated voxels, then re-sort
        # (top_k scrambles order) so lookup's binary search stays valid.
        # keep_idx doubles as the (hash, hash2)-order tiebreak: s_* is
        # already key-sorted, so sorting kept entries by (hash, index)
        # restores the exact composite order with a single 2-key sort.
        score = jnp.where(s_hash != INVALID_HASH, s_age, jnp.iinfo(jnp.int32).min)
        _, keep_idx = jax.lax.top_k(score, V)
        k_hash = s_hash[keep_idx]
        _, keep2 = jax.lax.sort((k_hash, keep_idx.astype(jnp.int32)), num_keys=2)
        return (s_hash[keep2], s_coords[keep2], s_w[keep2], s_wm[keep2],
                s_wc[keep2], s_age[keep2])

    k_hash, k_coords, k_w, k_wm, k_wc, k_age = jax.lax.cond(
        n_merged <= V, no_evict, evict, None)

    safe_w = jnp.maximum(k_w, 1.0)
    return GaussianVoxelMap(
        hash=k_hash,
        coords=k_coords,
        mean=k_wm / safe_w[:, None],
        cov=k_wc / safe_w[:, None, None],
        count=k_w,
        age=jnp.maximum(k_age, 0),
        resolution=vm.resolution,
    )


def lookup_table(vm: GaussianVoxelMap) -> jnp.ndarray:
    """(V, 2) double-hash key table for lookup_keys.

    Probe identity is the (h1, h2) double hash — the SAME key the insert
    segment-reduces by, so lookup is exactly as exact as the map's own
    notion of a voxel (joint collision ~2^-62). Packing both hashes into
    one (V, 2) row turns each probe into a single gather where comparing
    hash + 3 raw coords needed two; the pack itself is elementwise over
    the table and CSE'd once per compiled program however many lookup
    sites share the map. Random-access gathers from the HBM-resident
    table are the lookup's dominant cost on TPU (measured ~3 ms per
    10k-query site at _PROBE=8 with per-probe hash+coord gathers)."""
    t_h2 = jnp.where(vm.valid, hash_coords2(vm.coords), INVALID_HASH)
    return jnp.stack([vm.hash, t_h2], axis=1)        # (V, 2)


@jax.jit
def gaussian_lookup_table(vm: GaussianVoxelMap):
    """Precomputed per-submap search payload for STACKED batched lookups
    (global mapping keeps one of these per submap per level): the (V, 2)
    key table plus the fused (V, 12) mean|cov stats rows."""
    stats = jnp.concatenate([vm.mean, vm.cov.reshape(-1, 9)], axis=1)
    return lookup_table(vm), stats


def lookup_keys(keys: jnp.ndarray, resolution, points: jnp.ndarray,
                method: str = "sort") -> jnp.ndarray:
    """(Q, 3) query points against a precomputed (V, 2) key table ->
    (Q,) voxel index or -1.

    ``method`` is jnp.searchsorted's strategy: "sort" co-sorts
    (table, queries) — fastest for ONE map (on TPU the binary-search loop
    costs ~2 ms per 16k-query lookup while same-size sorts run in ~0.2 ms,
    profiler-traced) but re-sorts the table per vmapped row; batched
    multi-map callers pass "scan_unrolled" (unrolled binary search whose
    per-step gathers index the stacked table without materializing it)."""
    q_coords = voxel_coords(points, 1.0 / resolution)
    q_hash = hash_coords(q_coords)
    q_h2 = hash_coords2(q_coords)
    base = jnp.searchsorted(keys[:, 0], q_hash, method=method)
    found = jnp.full(q_hash.shape, -1, jnp.int32)
    V = keys.shape[0]
    for w in range(_PROBE):
        idx = jnp.minimum(base + w, V - 1)
        kr = keys[idx]
        hit = (kr[:, 0] == q_hash) & (kr[:, 1] == q_h2)
        found = jnp.where((found < 0) & hit, idx.astype(jnp.int32), found)
    return found


@jax.jit
def voxelmap_lookup(vm: GaussianVoxelMap, points: jnp.ndarray) -> jnp.ndarray:
    """(Q, 3) query points -> (Q,) voxel index or -1."""
    return lookup_keys(lookup_table(vm), vm.resolution, points)


@jax.jit
def voxelmap_overlap(vm: GaussianVoxelMap, points: jnp.ndarray, mask: jnp.ndarray,
                     T: jnp.ndarray) -> jnp.ndarray:
    """Fraction of valid points whose T-transformed position hits an occupied
    voxel (gtsam_points::overlap / overlap_gpu equivalent, used for keyframe
    management: reference odometry_estimation_gpu.cpp:212-295)."""
    p = points @ T[:3, :3].T + T[:3, 3]
    idx = voxelmap_lookup(vm, p)
    hits = (idx >= 0) & mask
    return jnp.sum(hits) / jnp.maximum(jnp.sum(mask), 1)


@partial(jax.jit, static_argnames=("stride",))
def voxelmap_overlap_stacked(T_rel, tgt, src, sm_pts, sm_mask, keys, res,
                             stride: int = 1):
    """Batched voxelmap_overlap over (tgt, src) pair rows against STACKED
    per-submap tables: row r scores submap src[r]'s cloud, transformed by
    T_rel[r], against submap tgt[r]'s key table. Replaces the global
    mapping's per-candidate overlap dispatch loop — on a remoted chip every
    dispatch pays tunnel latency, so N candidates cost N round-trips where
    this costs one (reference analogue: the overlap checks inside
    global_mapping.cpp:430-484's implicit-loop search).

    ``stride`` subsamples the scored cloud: the overlap fraction is a GATE
    compared against thresholds of 0.05-0.2, and a 1-in-4 sample estimates
    it to ~±2% at M=2048 — the gather/binary-search cost (the whole
    program, measured 233-295 ms of every submap insert at 64-128 submaps)
    drops by the same factor. Pass 1 for the exact fraction.

    T_rel: (R, 4, 4) f32; tgt/src: (R,) int32; sm_pts: (S, M, 3);
    sm_mask: (S, M); keys: (S, V, 2) int32; res: (S,) f32 -> (R,) f32."""
    def one(T, t, s):
        pts = sm_pts[s][::stride]
        msk = sm_mask[s][::stride]
        q = pts @ T[:3, :3].T + T[:3, 3]
        found = lookup_keys(keys[t], res[t], q, method="scan_unrolled")
        hits = (found >= 0) & msk
        return jnp.sum(hits) / jnp.maximum(jnp.sum(msk), 1)

    R = T_rel.shape[0]
    CH = 64
    if R <= CH or R % CH != 0:
        return jax.vmap(one)(T_rel, tgt, src)
    args = (T_rel.reshape(R // CH, CH, 4, 4), tgt.reshape(R // CH, CH),
            src.reshape(R // CH, CH))
    out = jax.lax.map(lambda a: jax.vmap(one)(*a), args)
    return out.reshape(R)


# ---------------------------------------------------------------------------
# Point-container voxel map (iVox equivalent): bounded model point cloud with
# per-subvoxel dedup and LRU age eviction; NN queries go brute-force through
# glim_tpu.ops.knn (MXU distance matmuls replace pointer-chasing).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class PointVoxelMap:
    points: jnp.ndarray   # (M, 3) f32
    covs: jnp.ndarray     # (M, 3, 3) f32
    mask: jnp.ndarray     # (M,) bool
    age: jnp.ndarray      # (M,) int32
    min_dist: jnp.ndarray  # () f32 — sub-voxel size (one point kept per cell)
    # () int32 — entries untouched for this many steps expire on the next
    # insert (iVox lru_thresh horizon; reference odometry_estimation_cpu.cpp
    # iVox lru settings). Default effectively infinite.
    lru_horizon: jnp.ndarray = None

    @property
    def capacity(self) -> int:
        return int(self.points.shape[0])

    def num_points(self) -> jnp.ndarray:
        return jnp.sum(self.mask)


def empty_point_voxelmap(capacity: int, min_dist,
                         lru_horizon: int = 2**30) -> PointVoxelMap:
    return PointVoxelMap(
        points=jnp.zeros((capacity, 3), jnp.float32),
        covs=jnp.zeros((capacity, 3, 3), jnp.float32),
        mask=jnp.zeros((capacity,), bool),
        age=jnp.zeros((capacity,), jnp.int32),
        min_dist=jnp.asarray(min_dist, jnp.float32),
        lru_horizon=jnp.asarray(lru_horizon, jnp.int32),
    )


@jax.jit
def pointmap_insert(pm: PointVoxelMap, points: jnp.ndarray, mask: jnp.ndarray,
                    covs: jnp.ndarray, step: jnp.ndarray) -> PointVoxelMap:
    """Insert new points, keeping at most one point per min_dist sub-voxel
    (existing points win, as in iVox's FlatContainer min-dist policy) and the
    most recently inserted `capacity` points overall (LRU)."""
    M = pm.capacity
    inv = 1.0 / pm.min_dist

    all_pts = jnp.concatenate([pm.points, points])
    all_cov = jnp.concatenate([pm.covs, covs])
    all_mask = jnp.concatenate([pm.mask, mask])
    all_age = jnp.concatenate([jnp.where(pm.mask, pm.age, -1),
                               jnp.where(mask, step, -1)])
    # Existing points get priority 0, new ones 1 — the first entry in each
    # sub-voxel after the sort is the survivor.
    prio = jnp.concatenate([jnp.zeros(M, jnp.int32), jnp.ones(points.shape[0], jnp.int32)])

    coords = voxel_coords(all_pts, inv)
    h = jnp.where(all_mask, hash_coords(coords), INVALID_HASH)
    h2 = jnp.where(all_mask, hash_coords2(coords), INVALID_HASH)
    iota = jnp.arange(h.shape[0], dtype=jnp.int32)
    # Single 3-key sort replaces the 5-key lexsort: (hash, hash2) groups
    # equal sub-voxels (double-collision ~2^-62), prio keeps existing points
    # ahead of new ones within a sub-voxel.
    h_s, _, _, order = jax.lax.sort((h, h2, prio, iota), num_keys=3)
    c_s = coords[order]
    valid_s = all_mask[order]

    h2_s = h2[order]
    same = (h_s[1:] == h_s[:-1]) & (h2_s[1:] == h2_s[:-1])
    first = jnp.concatenate([valid_s[:1], ~same]) & valid_s

    # LRU refresh-on-touch: a surviving (existing) point adopts the NEWEST
    # age in its sub-voxel, so re-observed structure is not evicted while
    # the sensor is looking at it (iVox touch semantics).
    seg_id = jnp.cumsum(first) - 1
    n_seg = M + points.shape[0] + 1
    age_s_raw = all_age[order]
    seg_max_age = jax.ops.segment_max(
        jnp.where(valid_s, age_s_raw, -1),
        jnp.where(valid_s, seg_id, n_seg - 1), num_segments=n_seg)
    age_s = jnp.where(valid_s, seg_max_age[seg_id], -1)
    # LRU horizon: sub-voxels not touched within lru_horizon steps expire
    # (iVox lru_thresh semantics), independent of the capacity eviction.
    first = first & (age_s >= step.astype(jnp.int32) - pm.lru_horizon)
    score = jnp.where(first, age_s, jnp.iinfo(jnp.int32).min)
    _, keep = jax.lax.top_k(score, M)
    new_mask = first[keep]
    return PointVoxelMap(
        points=all_pts[order][keep],
        covs=all_cov[order][keep],
        mask=new_mask,
        age=jnp.where(new_mask, age_s[keep], 0),
        min_dist=pm.min_dist,
        lru_horizon=pm.lru_horizon,
    )
