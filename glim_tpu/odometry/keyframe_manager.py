"""Odometry keyframe management (OVERLAP / DISPLACEMENT / ENTROPY).

TPU redesign of the reference's explicit keyframe machinery
(reference: src/glim/odometry/odometry_estimation_gpu.cpp:208-412):

* The reference keeps up to ``max_num_keyframes`` keyframes, each with its
  own GPU voxelmap, and creates one VGICP factor per keyframe every scan.
  Here the MATCHING TARGET stays the accumulated multi-resolution Gaussian
  voxel map (one sorted-table lookup covers all keyframes at once — the
  union map gives each scan point its correspondence in whichever keyframe
  voxel it lands, replacing K per-keyframe factor evaluations), and the
  keyframe set controls what that map CONTAINS:

    - insertion strategies gate which frames contribute points;
    - eviction removes a keyframe's contribution by REBUILDING the map
      from the surviving keyframes' stored world points (eviction is rare
      — at most once per keyframe insertion — so the rebuild cost is off
      the per-scan path).

* Per-keyframe mini voxel maps are kept ONLY for the overlap scoring the
  eviction strategies need (reference overlap_gpu calls); they are stacked
  along a leading axis so all K overlaps come from one vmapped lookup.

Strategy parity (same formulas as the reference):
  OVERLAP       insert when overlap(new, all keyframes) <= keyframe_max_overlap;
                evict keyframes with overlap(kf_i, new) < keyframe_min_overlap,
                then the min of  score_i = overlap(kf_i, new) * (1 - overlap(kf_i, others))
                                                    (odometry_estimation_gpu.cpp:212-295)
  DISPLACEMENT  insert when delta_trans/rot from the last keyframe exceed
                thresholds; evict first keyframe with overlap < 0.01, else
                max of  score_i = sqrt(dist(kf_i, new)) * sum_j 1/(dist_ij+eps)
                with the two oldest protected  (odometry_estimation_gpu.cpp:301-362)
  ENTROPY       insert when logdet(H_match) falls below the running average
                x keyframe_entropy_thresh; evict the oldest
                                                    (odometry_estimation_gpu.cpp:368-412)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import voxelmap as vmx
from glim_tpu.utils.logging import create_module_logger

logger = create_module_logger("odom")


@jax.tree_util.register_dataclass
@dataclass
class KeyframeStore:
    """Device-resident keyframe set (slot-addressed, unordered)."""

    pts: jnp.ndarray     # (K, C, 3) world-frame deskewed points
    covs: jnp.ndarray    # (K, C, 3, 3) world-frame covariances
    mask: jnp.ndarray    # (K, C) bool
    T: jnp.ndarray       # (K, 4, 4) T_world_imu at insertion
    order: jnp.ndarray   # (K,) int32 insertion counter; -1 = empty slot
    vm: vmx.GaussianVoxelMap   # stacked (K, ...) per-keyframe mini maps


def empty_keyframe_store(K: int, C: int, mini_capacity: int,
                         resolution: float) -> KeyframeStore:
    mini = jax.vmap(
        lambda _: vmx.empty_gaussian_voxelmap(mini_capacity, resolution)
    )(jnp.arange(K))
    return KeyframeStore(
        pts=jnp.zeros((K, C, 3), jnp.float32),
        covs=jnp.zeros((K, C, 3, 3), jnp.float32),
        mask=jnp.zeros((K, C), bool),
        T=jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1)),
        order=jnp.full((K,), -1, jnp.int32),
        vm=mini)


@partial(jax.jit, donate_argnums=(0,))
def kf_write(store: KeyframeStore, slot, pts_l, covs_l, mask, T_wl, T_wi,
             order_id) -> KeyframeStore:
    """Write one keyframe into ``slot``: transform the lidar-frame scan to
    world, store it, and build its mini overlap map."""
    R, t = T_wl[:3, :3], T_wl[:3, 3]
    pts_w = pts_l @ R.T + t
    covs_w = jnp.einsum("ij,cjk,lk->cil", R, covs_l, R)
    mini0 = jax.tree_util.tree_map(lambda x: x[0], store.vm)
    empty = vmx.empty_gaussian_voxelmap(mini0.hash.shape[0],
                                        mini0.resolution)
    mini = vmx.voxelmap_insert(empty, pts_w, mask, covs_w, jnp.int32(0))
    upd = lambda buf, val: buf.at[slot].set(val)
    return KeyframeStore(
        pts=upd(store.pts, pts_w),
        covs=upd(store.covs, covs_w),
        mask=upd(store.mask, mask),
        T=upd(store.T, T_wi),
        order=upd(store.order, jnp.int32(order_id)),
        vm=jax.tree_util.tree_map(
            lambda buf, val: buf.at[slot].set(val)
            if buf.ndim > 0 else buf, store.vm, mini))


@jax.jit
def kf_overlaps_with_points(store: KeyframeStore, pts_w: jnp.ndarray,
                            mask: jnp.ndarray) -> jnp.ndarray:
    """(K,) overlap of the given world points vs each keyframe's mini map
    (reference overlap_gpu(keyframe->voxelmap, new_frame, delta))."""
    eye = jnp.eye(4, dtype=jnp.float32)
    ovs = jax.vmap(lambda vm: vmx.voxelmap_overlap(vm, pts_w, mask, eye))(store.vm)
    return jnp.where(store.order >= 0, ovs, 0.0)


@jax.jit
def kf_overlap_vs_others(store: KeyframeStore,
                         exclude: jnp.ndarray) -> jnp.ndarray:
    """(K,) fraction of each keyframe's points that land in ANY other
    keyframe's map (slots in ``exclude`` — e.g. the newest — are ignored
    both as sources and as targets)."""
    K = store.pts.shape[0]
    active = (store.order >= 0) & ~exclude

    def hits_vs_map(vm_valid, vm):
        h = jax.vmap(lambda p: vmx.voxelmap_lookup(vm, p) >= 0)(store.pts)
        return h & vm_valid                       # (K_src, C)

    # (K_tgt, K_src, C): does src point land in tgt's map?
    hits = jax.vmap(hits_vs_map)(active, store.vm)
    not_self = ~jnp.eye(K, dtype=bool)            # [tgt, src]: exclude own map
    any_other = jnp.any(hits & not_self[:, :, None], axis=0) & store.mask
    frac = jnp.sum(any_other, axis=1) / jnp.maximum(jnp.sum(store.mask, axis=1), 1)
    return jnp.where(active, frac, 0.0)


@partial(jax.jit, static_argnames=("capacity",))
def rebuild_level(store: KeyframeStore, capacity: int, resolution,
                  step) -> vmx.GaussianVoxelMap:
    """Rebuild one accumulated model level from all surviving keyframes."""
    K, C = store.mask.shape
    valid_kf = (store.order >= 0)[:, None]
    pts = store.pts.reshape(K * C, 3)
    covs = store.covs.reshape(K * C, 3, 3)
    mask = (store.mask & valid_kf).reshape(K * C)
    empty = vmx.empty_gaussian_voxelmap(capacity, resolution)
    return vmx.voxelmap_insert(empty, pts, mask, covs, step)


class KeyframeManager:
    """Host-side strategy driver over the device KeyframeStore.

    Decisions use the lagged status scalars from the fused odometry step
    (overlap / displacement / matching-entropy of the frame being decided),
    so the per-scan hot loop stays sync-free; the occasional eviction does
    fetch K small scores."""

    def __init__(self, strategy: str, max_num_keyframes: int,
                 min_overlap: float, max_overlap: float,
                 delta_trans: float, delta_rot: float,
                 entropy_thresh: float,
                 C: int, model_capacities: List[int],
                 model_resolutions: List[float],
                 mini_capacity: int = 16384):
        self.strategy = strategy.upper()
        self.max_num = max_num_keyframes
        self.min_overlap = min_overlap
        self.max_overlap = max_overlap
        self.delta_trans = delta_trans
        self.delta_rot = delta_rot
        self.entropy_thresh = entropy_thresh
        self.model_capacities = model_capacities
        self.model_resolutions = model_resolutions
        # Traced per-level resolutions used for model REBUILDS: adaptive
        # resolution (reference odometry_estimation_gpu.cpp:89-93 re-derives
        # it from each frame's median distance) updates these device scalars
        # per keyframe insert; the rebuild re-inserts every surviving
        # keyframe at the new scale, and because resolution is a traced
        # pytree leaf the change never recompiles. Between rebuilds the
        # fast-path merge keeps the accumulated map's own (old) resolution —
        # mixing scales inside one table would corrupt the keys.
        self.model_res_dev = [jnp.float32(r) for r in model_resolutions]
        K = max_num_keyframes + 1          # room for insert-then-evict
        self.store = empty_keyframe_store(K, C,  mini_capacity,
                                          model_resolutions[-1])
        # Host mirrors (poses/order) for the pose-only score arithmetic.
        self.h_T: List[Optional[np.ndarray]] = [None] * K
        self.h_order = np.full(K, -1, np.int64)
        self.next_order = 0
        self.last_kf_T_wi = None           # device (4,4), passed to the step
        self._entropy_avg = 0.0
        self._entropy_n = 0
        self.marginalized_callback = None  # set by the odometry module

    def set_model_resolutions(self, res_dev: List) -> None:
        """Update the traced per-level rebuild resolutions (device scalars
        or floats). Takes effect at the next eviction-triggered rebuild."""
        self.model_res_dev = [jnp.asarray(r, jnp.float32) for r in res_dev]

    # -- queries ---------------------------------------------------------

    @property
    def count(self) -> int:
        return int((self.h_order >= 0).sum())

    def _free_slot(self) -> int:
        return int(np.argmin(self.h_order >= 0))

    # -- decision --------------------------------------------------------

    def should_insert(self, overlap: float, d_trans: float, d_rot: float,
                      neg_entropy: float) -> bool:
        if self.count == 0:
            return True
        if self.strategy == "OVERLAP":
            return overlap <= self.max_overlap
        if self.strategy == "DISPLACEMENT":
            return (d_trans >= self.delta_trans) or (d_rot >= self.delta_rot)
        if self.strategy == "ENTROPY":
            self._entropy_n += 1
            self._entropy_avg += (neg_entropy - self._entropy_avg) / self._entropy_n
            if neg_entropy > self._entropy_avg * self.entropy_thresh:
                return False
            self._entropy_n = 0
            self._entropy_avg = 0.0
            return True
        raise ValueError(f"unknown keyframe strategy {self.strategy}")

    # -- mutation --------------------------------------------------------

    def insert(self, pts_l, covs_l, mask, T_wl_dev, T_wi_dev,
               T_wi_host: np.ndarray, model: Tuple[vmx.GaussianVoxelMap, ...],
               step_id: int) -> Tuple[vmx.GaussianVoxelMap, ...]:
        """Insert a keyframe; evict per strategy if over capacity. Returns
        the (possibly rebuilt) accumulated model maps."""
        slot = self._free_slot()
        self.store = kf_write(self.store, jnp.int32(slot), pts_l, covs_l,
                              mask, T_wl_dev, T_wi_dev, self.next_order)
        self.h_T[slot] = np.asarray(T_wi_host, np.float64)
        self.h_order[slot] = self.next_order
        self.next_order += 1
        self.last_kf_T_wi = T_wi_dev

        evicted = []
        if self.count > self.max_num:
            evicted = self._evict(slot)

        if evicted:
            # Rebuild every model level from the surviving keyframes.
            model = tuple(
                rebuild_level(self.store, cap, res, jnp.int32(step_id))
                for cap, res in zip(self.model_capacities, self.model_res_dev))
            if self.marginalized_callback is not None:
                self.marginalized_callback(evicted)
        else:
            # Fast path: merge the new keyframe into the accumulated maps.
            R, t = T_wl_dev[:3, :3], T_wl_dev[:3, 3]
            pts_w = pts_l @ R.T + t
            covs_w = jnp.einsum("ij,cjk,lk->cil", R, covs_l, R)
            model = tuple(
                vmx.voxelmap_insert(vm, pts_w, mask, covs_w, jnp.int32(step_id))
                for vm in model)
        return model

    def _evict(self, new_slot: int) -> List[int]:
        """Strategy-specific eviction. Returns evicted insertion orders."""
        K = len(self.h_order)
        valid = self.h_order >= 0
        evicted: List[int] = []

        def clear(slot: int):
            evicted.append(int(self.h_order[slot]))
            self.store = KeyframeStore(
                pts=self.store.pts, covs=self.store.covs,
                mask=self.store.mask.at[slot].set(False),
                T=self.store.T,
                order=self.store.order.at[slot].set(-1), vm=self.store.vm)
            self.h_order[slot] = -1
            self.h_T[slot] = None

        if self.strategy == "ENTROPY":
            olds = np.where(valid, self.h_order, np.iinfo(np.int64).max)
            olds[new_slot] = np.iinfo(np.int64).max
            clear(int(np.argmin(olds)))
            return evicted

        # Both OVERLAP and DISPLACEMENT need overlap(kf_i, new keyframe).
        new_pts = self.store.pts[new_slot]
        new_mask = self.store.mask[new_slot]
        ov_new = np.array(kf_overlaps_with_points(self.store, new_pts,
                                                  new_mask))
        ov_new[new_slot] = np.inf            # never evict the newest

        if self.strategy == "OVERLAP":
            # Phase 1: drop keyframes with (almost) no overlap to the newest.
            for i in np.where(valid & (ov_new < self.min_overlap))[0]:
                if i != new_slot:
                    clear(int(i))
            if self.count <= self.max_num:
                return evicted
            # Phase 2: min score = overlap_latest * (1 - overlap_others).
            exclude = jnp.asarray(np.arange(K) == new_slot)
            ov_others = np.asarray(kf_overlap_vs_others(self.store, exclude))
            valid = self.h_order >= 0
            scores = np.where(valid, ov_new * (1.0 - ov_others), np.inf)
            scores[new_slot] = np.inf
            clear(int(np.argmin(scores)))
            return evicted

        # DISPLACEMENT
        low = np.where(valid & (ov_new < 0.01))[0]
        low = low[low != new_slot]
        if len(low):
            clear(int(low[0]))
            return evicted
        # Protect the two oldest; evict max sqrt(d0) * sum 1/(dist+eps).
        orders = np.where(valid, self.h_order, np.iinfo(np.int64).max)
        orders[new_slot] = np.iinfo(np.int64).max
        protected = set(np.argsort(orders)[:2].tolist())
        t_new = self.h_T[new_slot][:3, 3]
        scores = np.full(K, -np.inf)
        for i in range(K):
            if not valid[i] or i == new_slot or i in protected:
                continue
            t_i = self.h_T[i][:3, 3]
            s = 0.0
            for j in range(K):
                if j == i or not valid[j] or j == new_slot:
                    continue
                s += 1.0 / (np.linalg.norm(t_i - self.h_T[j][:3, 3]) + 1e-3)
            scores[i] = np.sqrt(np.linalg.norm(t_i - t_new)) * s
        if np.isfinite(scores).any() and scores.max() > -np.inf:
            clear(int(np.argmax(scores)))
        return evicted
