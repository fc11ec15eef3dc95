"""Masked padded point-batch primitives: voxel keys, downsampling, filters.

TPU-native equivalents of the gtsam_points point ops used by the reference
(reference usage sites: src/glim/preprocess/cloud_preprocessor.cpp:104-167,
mapping/sub_mapping.cpp:383-419 — ``voxelgrid_sampling``,
``randomgrid_sampling``, ``random_sampling``, ``filter``, ``transform``,
``merge_frames``, ``median_distance``, ``fast_floor``).

Design: everything operates on fixed-capacity (C, ...) arrays with a validity
mask. Grouping by voxel is sort + segment-reduce (deterministic, no atomics).
Voxel identity is an exact int32 coordinate triple; a 32-bit mixing hash gives
a single monotone sort/lookup key and ties are broken by the exact coords, so
equal coords are always adjacent after the sort and hash collisions stay
correct. Compaction never changes array sizes — "removed" points just have
mask=False, and ``compact`` re-packs valid lanes to the front so downstream
fixed-size ops see a stable prefix.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Coordinate offset keeps quantized voxel coords positive-ish and bounded.
COORD_OFFSET = 1 << 20

# Large sentinel so invalid lanes sort to the end of any key ordering.
INVALID_HASH = jnp.iinfo(jnp.int32).max


def fast_floor(x: jnp.ndarray) -> jnp.ndarray:
    """float -> int32 floor (gtsam_points::fast_floor equivalent)."""
    return jnp.floor(x).astype(jnp.int32)


def voxel_coords(points: jnp.ndarray, inv_resolution) -> jnp.ndarray:
    """(..., 3) f32 -> (..., 3) int32 quantized voxel coordinates."""
    return fast_floor(points * inv_resolution)


def hash_coords(coords: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) int32 -> (...,) int32 mixing hash (Vector3iHash equivalent).

    Uses the standard large-prime XOR mix; result is non-negative and
    clamped strictly below INVALID_HASH.
    """
    c = coords.astype(jnp.uint32)
    h = (c[..., 0] * jnp.uint32(73856093)) ^ (c[..., 1] * jnp.uint32(19349669)) ^ (
        c[..., 2] * jnp.uint32(83492791))
    # Clamp to 0x7FFFFFFE: 0x7FFFFFFF IS the INVALID_HASH sentinel, and a
    # real voxel hashing onto it would silently vanish from the map.
    return jnp.minimum(h & jnp.uint32(0x7FFFFFFF),
                       jnp.uint32(0x7FFFFFFE)).astype(jnp.int32)


def hash_coords2(coords: jnp.ndarray) -> jnp.ndarray:
    """Second independent mixing hash, used as a sort tiebreak: sorting by
    the (hash_coords, hash_coords2) PAIR groups equal coordinates adjacently
    with collision probability ~2^-62 per pair — one composite-key lax.sort
    replaces a 4-key lexsort (4 stable sort passes) in the voxel-map hot
    paths.

    Deliberately an ADDITIVE combination + murmur3 finalizer, not a second
    XOR-multiply: every hash of the form a*x ^ b*y ^ c*z maps the symmetric
    pair (x, y, z) / (-x, y, -z) with odd x, z to the same value
    ((-p) ^ (-q) == p ^ q whenever p, q are odd), so two XOR-multiply hashes
    collide JOINTLY on those pairs; the additive form breaks the symmetry."""
    c = coords.astype(jnp.uint32)
    h = (c[..., 0] * jnp.uint32(2654435761) + c[..., 1] * jnp.uint32(805459861)
         + c[..., 2] * jnp.uint32(3674653429))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return jnp.minimum(h & jnp.uint32(0x7FFFFFFF),
                       jnp.uint32(0x7FFFFFFE)).astype(jnp.int32)


def _order_by(hash_keys: jnp.ndarray, coords: jnp.ndarray, *tiebreak: jnp.ndarray) -> jnp.ndarray:
    """Sort order: (hash, cx, cy, cz, *tiebreak) lexicographic.

    Equal coords share a hash, so they end up adjacent; distinct coords with
    colliding hashes are separated by the coord tie-break.
    """
    keys = list(tiebreak)[::-1] + [coords[..., 2], coords[..., 1], coords[..., 0], hash_keys]
    return jnp.lexsort(tuple(keys))


def _segment_starts(hash_keys: jnp.ndarray, coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Boundary flags for sorted-by-voxel arrays: True where a new voxel begins."""
    same = (hash_keys[1:] == hash_keys[:-1]) & jnp.all(coords[1:] == coords[:-1], axis=-1)
    starts = jnp.concatenate([jnp.ones((1,), bool), ~same])
    return starts & valid


@partial(jax.jit, static_argnames=("out_capacity",))
def voxelgrid_sampling(points: jnp.ndarray, mask: jnp.ndarray, resolution,
                       out_capacity: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Voxel-grid downsampling: one centroid per occupied voxel.

    Returns (out_points (C', 3), out_mask (C',)); C' = out_capacity or C.
    """
    C = points.shape[0]
    out_c = out_capacity or C
    coords = voxel_coords(points, 1.0 / resolution)
    h = jnp.where(mask, hash_coords(coords), INVALID_HASH)
    order = _order_by(h, coords)
    pts_s = points[order]
    coords_s = coords[order]
    h_s = h[order]
    valid_s = mask[order]

    starts = _segment_starts(h_s, coords_s, valid_s)
    seg_id = jnp.cumsum(starts) - 1  # 0-based segment index per point
    num_segs = jnp.sum(starts)

    seg_sum = jax.ops.segment_sum(jnp.where(valid_s[:, None], pts_s, 0.0), seg_id, num_segments=out_c)
    seg_cnt = jax.ops.segment_sum(valid_s.astype(jnp.float32), seg_id, num_segments=out_c)
    out_pts = seg_sum / jnp.maximum(seg_cnt[:, None], 1.0)
    out_mask = (jnp.arange(out_c) < num_segs) & (seg_cnt > 0)
    return out_pts, out_mask


def voxelgrid_sampling_covs(points: jnp.ndarray, covs: jnp.ndarray,
                            mask: jnp.ndarray, resolution,
                            out_capacity: Optional[int] = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Voxel-grid downsampling that carries per-point covariances: one
    centroid per occupied voxel with the voxel-mean covariance (the
    gtsam_points ``merge_frames`` semantics — points AND covs are averaged
    per voxel, reference mapping/sub_mapping.cpp:454-500 merged submap).

    Returns (out_points (C', 3), out_covs (C', 3, 3), out_mask (C',)).
    """
    C = points.shape[0]
    out_c = out_capacity or C
    coords = voxel_coords(points, 1.0 / resolution)
    h = jnp.where(mask, hash_coords(coords), INVALID_HASH)
    order = _order_by(h, coords)
    pts_s = points[order]
    covs_s = covs[order]
    coords_s = coords[order]
    h_s = h[order]
    valid_s = mask[order]

    starts = _segment_starts(h_s, coords_s, valid_s)
    seg_id = jnp.cumsum(starts) - 1
    num_segs = jnp.sum(starts)

    # One fused 13-wide payload: [1, p(3), C(9)].
    payload = jnp.concatenate([jnp.ones_like(pts_s[:, :1]), pts_s,
                               covs_s.reshape(-1, 9)], axis=1)
    payload = jnp.where(valid_s[:, None], payload, 0.0)
    seg = jax.ops.segment_sum(payload, seg_id, num_segments=out_c)
    cnt = jnp.maximum(seg[:, 0], 1.0)
    out_pts = seg[:, 1:4] / cnt[:, None]
    out_covs = seg[:, 4:13].reshape(-1, 3, 3) / cnt[:, None, None]
    out_mask = (jnp.arange(out_c) < num_segs) & (seg[:, 0] > 0)
    return out_pts, out_covs, out_mask


@jax.jit
def randomgrid_sampling(points: jnp.ndarray, mask: jnp.ndarray, resolution,
                        target, rng: jax.Array
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Voxel-bucketed random sampling to ~``target`` points.

    Spatially uniform sampling (the reference's preferred downsampler,
    config_preprocess.json "use_random_grid_downsampling"): each occupied
    voxel contributes up to ceil(target / #voxels) randomly-chosen points,
    then a global random trim brings the count to <= target.

    Returns (points, mask, src_idx) where src_idx maps each output lane back
    to the input lane it was sampled from (for carrying times/intensities).
    """
    C = points.shape[0]
    coords = voxel_coords(points, 1.0 / resolution)
    h = jnp.where(mask, hash_coords(coords), INVALID_HASH)
    prio = jax.random.uniform(rng, (C,))
    order = _order_by(h, coords, prio)
    pts_s = points[order]
    coords_s = coords[order]
    h_s = h[order]
    valid_s = mask[order]

    starts = _segment_starts(h_s, coords_s, valid_s)
    num_segs = jnp.maximum(jnp.sum(starts), 1)
    # Rank of each point within its voxel (0 for the voxel's first point).
    idx = jnp.arange(C)
    start_idx = jnp.where(starts, idx, 0)
    seg_start = jax.lax.cummax(start_idx)
    rank = idx - seg_start

    budget = jnp.ceil(target / num_segs).astype(jnp.int32)
    keep = valid_s & (rank < budget)

    # Global trim to exactly <= target: order kept points first by fresh
    # random priority, drop the tail.
    prio2 = jax.random.uniform(jax.random.fold_in(rng, 1), (C,))
    trim_order = jnp.lexsort((prio2, ~keep))  # kept points first, random within
    kept_sorted = pts_s[trim_order]
    kept_mask = keep[trim_order] & (jnp.arange(C) < target)
    return kept_sorted, kept_mask, order[trim_order]


@jax.jit
def random_sampling(points: jnp.ndarray, mask: jnp.ndarray, target: int,
                    rng: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform random sampling of up to ``target`` valid points.

    Returns (points, mask, src_idx)."""
    C = points.shape[0]
    prio = jax.random.uniform(rng, (C,))
    order = jnp.lexsort((prio, ~mask))
    pts_s = points[order]
    n_valid = jnp.sum(mask)
    out_mask = jnp.arange(C) < jnp.minimum(n_valid, target)
    return pts_s, out_mask, order


@jax.jit
def sample(points: jnp.ndarray, mask: jnp.ndarray,
           indices: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select points by index (gtsam_points::sample role): output lane k is
    input lane indices[k]; negative indices mark invalid output lanes."""
    idx = jnp.maximum(indices, 0)
    return points[idx], (indices >= 0) & mask[idx]


@jax.jit
def distance_filter(points: jnp.ndarray, mask: jnp.ndarray, near, far) -> jnp.ndarray:
    """Mask update: keep finite points with near <= |p| <= far
    (reference behavior: preprocess/cloud_preprocessor.cpp:118-129)."""
    d = jnp.linalg.norm(points, axis=-1)
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    return mask & finite & (d >= near) & (d <= far)


@jax.jit
def cropbox_filter(points: jnp.ndarray, mask: jnp.ndarray, T_frame_lidar: jnp.ndarray,
                   bbox_min: jnp.ndarray, bbox_max: jnp.ndarray) -> jnp.ndarray:
    """Mask update: REMOVE points inside the box (in the box's frame)."""
    p = points @ T_frame_lidar[:3, :3].T + T_frame_lidar[:3, 3]
    inside = jnp.all((p >= bbox_min) & (p <= bbox_max), axis=-1)
    return mask & ~inside


@jax.jit
def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    return points @ T[:3, :3].T + T[:3, 3]


@jax.jit
def compact(points: jnp.ndarray, mask: jnp.ndarray, *extras: jnp.ndarray):
    """Stable re-pack: valid lanes first, preserving order.

    Returns (points, mask, *extras) with the same capacity. Extras are
    permuted identically.
    """
    order = jnp.argsort(~mask, stable=True)
    out = [points[order], mask[order]]
    for e in extras:
        out.append(e[order])
    return tuple(out)


@jax.jit
def median_distance(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Approximate median range of valid points (gtsam_points::median_distance).

    Sorts distances with invalid lanes pushed to +inf and picks the
    (n_valid // 2)-th entry.
    """
    d = jnp.where(mask, jnp.linalg.norm(points, axis=-1), jnp.inf)
    d_s = jnp.sort(d)
    n = jnp.sum(mask)
    return d_s[jnp.maximum(n // 2, 0)]


def merge_point_batches(points_list, masks_list, out_capacity: int):
    """Concatenate padded batches then compact to one padded batch."""
    pts = jnp.concatenate(points_list, axis=0)
    msk = jnp.concatenate(masks_list, axis=0)
    pts, msk = compact(pts, msk)
    return pts[:out_capacity], msk[:out_capacity]
