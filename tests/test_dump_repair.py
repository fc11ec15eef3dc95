"""Submap load-time corruption repair (reference mapping/sub_map.cpp:149-199)."""

import os

import jax.numpy as jnp
import numpy as np

from glim_tpu.io.dump import load_submap, repair_submap, save_submap
from glim_tpu.types import PointBatch, SubMap


def make_submap(rng, n=500, cap=512):
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = rng.uniform(-5, 5, (n, 3))
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return SubMap(id=3, T_world_origin=np.eye(4),
                  frame=PointBatch(points=jnp.asarray(pts),
                                   mask=jnp.asarray(mask)))


def test_corrupted_points_dropped_and_covs_estimated(tmp_path, rng):
    sm = make_submap(rng)
    # Corrupt some points.
    pts = np.asarray(sm.frame.points).copy()
    pts[5] = np.nan
    pts[17, 0] = np.inf
    sm.frame.points = jnp.asarray(pts)
    d = os.path.join(tmp_path, "000003")
    os.makedirs(d)
    save_submap(d, sm)

    loaded = load_submap(d)
    mask = np.asarray(loaded.frame.mask)
    assert not mask[5] and not mask[17]
    assert mask.sum() == 498
    lp = np.asarray(loaded.frame.points)[mask]
    assert np.isfinite(lp).all()
    # Covariances re-estimated for the valid points.
    assert loaded.frame.covs is not None
    c = np.asarray(loaded.frame.covs)[mask]
    assert np.isfinite(c).all()
    assert (np.trace(c, axis1=1, axis2=2) > 0).all()


def test_invalid_covs_reestimated(rng):
    sm = make_submap(rng)
    covs = np.broadcast_to(np.eye(3, dtype=np.float32), (512, 3, 3)).copy()
    covs[7] = np.nan
    sm.frame.covs = jnp.asarray(covs)
    repair_submap(sm)
    c = np.asarray(sm.frame.covs)[np.asarray(sm.frame.mask)]
    assert np.isfinite(c).all()


def test_clean_submap_untouched(tmp_path, rng):
    sm = make_submap(rng)
    before = np.asarray(sm.frame.points).copy()
    d = os.path.join(tmp_path, "000003")
    os.makedirs(d)
    save_submap(d, sm)
    loaded = load_submap(d)
    assert np.asarray(loaded.frame.mask).sum() == 500
    assert np.allclose(np.asarray(loaded.frame.points)[:500], before[:500],
                       atol=1e-5)
