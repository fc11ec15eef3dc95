"""Multi-chip sharding of the registration hot path.

The reference's device story is CUDA streams on one GPU (SURVEY.md §5
"distributed communication backend: none"); the TPU-native scale-out is SPMD
over an ICI mesh: factor linearization is data-parallel over source POINTS
(and, in global mapping, over FACTORS), so we shard the point batch across
devices with ``shard_map``, accumulate each shard's 6x6/6 GN contributions
locally, and ``psum`` the tiny systems over the mesh — bandwidth cost is a
few hundred bytes per factor, all compute stays local.

Works identically on a real v5e mesh and on the CPU `--xla_force_host_platform
_device_count` mesh used in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from glim_tpu.ops import gicp, lie, solver
from glim_tpu.ops.voxelmap import GaussianVoxelMap


def make_mesh(n_devices: Optional[int] = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def sharded_vgicp_linearize(mesh: Mesh, T_target, T_source, src_pts, src_covs,
                            src_mask, vm: GaussianVoxelMap) -> gicp.FactorSystem:
    """VGICP linearization with source points sharded over the mesh.

    The voxel map is replicated (it is the lookup table every shard probes);
    per-shard partial systems are psum'd over ICI.
    """

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P("points"), P("points"), P("points"), P()),
             out_specs=P())
    def _run(T_t, T_s, pts, covs, mask, vm_rep):
        sys = gicp.vgicp_linearize(T_t, T_s, pts, covs, mask, vm_rep)
        return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, "points"), sys)

    return _run(T_target, T_source, src_pts, src_covs, src_mask, vm)


def sharded_gicp_linearize(mesh: Mesh, T_target, T_source, src_pts, src_covs,
                           src_mask, tgt_pts, tgt_covs, tgt_mask, max_dist
                           ) -> gicp.FactorSystem:
    """GICP linearization with source points sharded, target replicated."""

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P("points"), P("points"), P("points"),
                       P(), P(), P(), P()),
             out_specs=P())
    def _run(T_t, T_s, pts, covs, mask, tp, tc, tm, md):
        sys = gicp.gicp_linearize(T_t, T_s, pts, covs, mask, tp, tc, tm, md)
        return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, "points"), sys)

    return _run(T_target, T_source, src_pts, src_covs, src_mask,
                tgt_pts, tgt_covs, tgt_mask, jnp.float32(max_dist))


def sharded_factor_linearize(mesh: Mesh, T_t, T_s, pts, covs, masks, vms_stacked
                             ) -> gicp.FactorSystem:
    """Global-mapping fan-out: VGICP matching-cost factors sharded over the
    FACTOR axis (each device linearizes its slice of submap pairs against its
    slice of target voxel maps; results come back as stacked per-factor
    blocks to scatter into the pose-graph system).

    Args (F = number of factors, padded to a multiple of mesh size):
      T_t, T_s:     (F, 4, 4) target/source submap poses
      pts/covs/masks: (F, C, ...) source submap clouds
      vms_stacked:  GaussianVoxelMap pytree with leading dim (F, ...)
    """

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("points"), P("points"), P("points"), P("points"),
                       P("points"), P("points")),
             out_specs=P("points"))
    def _run(T_t_l, T_s_l, pts_l, covs_l, masks_l, vms_l):
        def one(T_t1, T_s1, p1, c1, m1, vm1):
            return gicp.vgicp_linearize(T_t1, T_s1, p1, c1, m1, vm1)

        return jax.vmap(one)(T_t_l, T_s_l, pts_l, covs_l, masks_l, vms_l)

    return _run(T_t, T_s, pts, covs, masks, vms_stacked)


def sharded_odometry_step(mesh: Mesh, T_init, src_pts, src_covs, src_mask,
                          vm: GaussianVoxelMap, iters: int = 8):
    """One full odometry registration solve with the point batch sharded over
    the mesh: GN iterations with psum'd normal equations — the multi-chip
    "training step" of this framework."""

    def linearize(T):
        sys = sharded_vgicp_linearize(mesh, jnp.eye(4), T, src_pts, src_covs,
                                      src_mask, vm)
        return sys.H_ss, sys.b_s, sys.error

    def step(T, _):
        H, b, err = linearize(T)
        delta = solver.solve_damped(H, b, jnp.float32(1e-6))
        return T @ lie.se3_exp(delta), err

    return jax.lax.scan(step, T_init, None, length=iters)
