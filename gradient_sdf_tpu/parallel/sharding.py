"""Sharded tracking + fusion steps (shard_map over the device mesh).

Parallelization of the two hot loops (SURVEY.md §3.1):

  * Tracking residual pass: pixels are sharded over the `rays` axis; each
    device runs the gather/VPU pass on its pixel shard against a replicated
    grid and the (E, g, H, count) accumulators are `psum`-reduced over the
    mesh — the SPMD analog of the reference's OpenMP custom reductions
    (`RigidPointOptimizerOmp.cpp:41-69`). The 6x6 solve is replicated.

  * Fusion: pixels sharded over `rays`; every device computes its shard's
    per-voxel contributions (sum w, sum w*sdf, sum w*Rn) by local
    scatter-add, then the contribution fields are `psum`(rays)-reduced and
    the grid state update is elementwise. Across the `blocks` axis, grid
    *storage* shards ZeRO-style: contributions are reduce-scattered so every
    device only updates its block shard, and queries all-gather the shard —
    both collectives ride ICI. Block-table insertion runs replicated on the
    frame's unique keys (deterministic, identical on every device).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import FusionConfig, GridConfig, TrackerConfig
from ..models import tracker as tracker_mod
from ..ops import fusion as fusion_mod
from ..ops import voxel_grid as vg
from ..utils import se3
from .mesh import BLOCK_AXIS, RAY_AXIS


def _grid_spec_replicated():
    return vg.VoxelGrid(
        table_keys=P(), table_slots=P(), num_active=P(), overflow=P(),
        block_coords=P(), dist=P(), weight=P(), grad=P(),
    )


def sharded_residual_pass(mesh, grid, points_cam, z_valid, R, t, gcfg, fcfg):
    """(E, g, H, count) with pixels sharded over mesh axes; results replicated."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(_grid_spec_replicated(), P((RAY_AXIS, BLOCK_AXIS)),
                  P((RAY_AXIS, BLOCK_AXIS)), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    def pass_(grid, pts, zv, R, t):
        E, g, H, cnt = tracker_mod._residual_pass(grid, pts, zv, R, t, gcfg, fcfg)
        E = jax.lax.psum(E, (RAY_AXIS, BLOCK_AXIS))
        g = jax.lax.psum(g, (RAY_AXIS, BLOCK_AXIS))
        H = jax.lax.psum(H, (RAY_AXIS, BLOCK_AXIS))
        cnt = jax.lax.psum(cnt, (RAY_AXIS, BLOCK_AXIS))
        return E, g, H, cnt

    return pass_(grid, points_cam, z_valid, R, t)


def sharded_track_frame(mesh, grid, depth, K, R0, t0, gcfg, fcfg, tcfg):
    """Gauss-Newton tracking with the residual pass sharded over the mesh."""
    pts_cam, z = tracker_mod.backproject_grid(depth, K, tcfg.sampling)
    n_dev = mesh.devices.size
    pad = (-pts_cam.shape[0]) % n_dev
    if pad:
        pts_cam = jnp.pad(pts_cam, ((0, pad), (0, 0)))
        z = jnp.pad(z, (0, pad))
    z_valid = (z > fcfg.z_min) & (z < fcfg.z_max)
    conv_sq = tcfg.conv_threshold**2

    def cond(carry):
        R, t, k, converged = carry
        return (k < tcfg.num_iterations) & ~converged

    def body(carry):
        R, t, k, _ = carry
        E, g, H, cnt = sharded_residual_pass(
            mesh, grid, pts_cam, z_valid, R, t, gcfg, fcfg
        )
        xi = tcfg.damping * jnp.linalg.solve(H + 1e-12 * jnp.eye(6), g)
        small = jnp.sum(xi * xi) < conv_sq
        bad = jnp.any(jnp.isnan(xi))
        dR, dt = se3.se3_exp(-xi)
        Rn, tn = se3.se3_mul(dR, dt, R, t)
        apply = ~small & ~bad
        return (
            jnp.where(apply, Rn, R),
            jnp.where(apply, tn, t),
            k + 1,
            small,
        )

    R, t, k, converged = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
         jnp.int32(0), jnp.asarray(False)),
    )
    return R, t, converged, k


def sharded_fuse_frame(mesh, grid, depth, cache, R, t, gcfg, fcfg,
                       max_unique_blocks: int = 8192):
    """Fusion with ray-sharded sample generation + psum'd accumulators.

    Block allocation runs replicated (deterministic); the contribution
    scatter is local per device followed by a single psum over the mesh.
    """
    normals_img = fusion_mod.compute_normals(cache, depth)
    vi, valid, w, trunc_sdf, Rn, K = fusion_mod._sample_frame(
        grid, depth, normals_img, cache, R, t, gcfg, fcfg
    )
    vi_flat = vi.reshape(-1, 3)
    valid_flat = valid.reshape(-1)
    w_flat = w.reshape(-1)
    wd_flat = (w * trunc_sdf).reshape(-1)
    wn = w[..., None] * Rn[..., None, :]
    wn_flat = wn.reshape(-1, 3)

    grid = vg.ensure_blocks(grid, vi_flat, valid_flat, gcfg, max_unique_blocks)

    n_dev = mesh.devices.size
    pad = (-vi_flat.shape[0]) % n_dev
    if pad:
        vi_flat = jnp.pad(vi_flat, ((0, pad), (0, 0)))
        valid_flat = jnp.pad(valid_flat, (0, pad))
        w_flat = jnp.pad(w_flat, (0, pad))
        wd_flat = jnp.pad(wd_flat, (0, pad))
        wn_flat = jnp.pad(wn_flat, ((0, pad), (0, 0)))

    nvox = grid.num_blocks * grid.voxels_per_block

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(_grid_spec_replicated(), P((RAY_AXIS, BLOCK_AXIS)),
                  P((RAY_AXIS, BLOCK_AXIS)), P((RAY_AXIS, BLOCK_AXIS)),
                  P((RAY_AXIS, BLOCK_AXIS)), P((RAY_AXIS, BLOCK_AXIS))),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
    )
    def accumulate(grid, vi_s, valid_s, w_s, wd_s, wn_s):
        lin, present = vg.lookup_voxels(grid, vi_s, gcfg)
        ok = valid_s & present
        lin = jnp.where(ok, lin, nvox)
        w_acc = jnp.zeros((nvox,), jnp.float32).at[lin].add(
            jnp.where(ok, w_s, 0.0), mode="drop")
        wd_acc = jnp.zeros((nvox,), jnp.float32).at[lin].add(
            jnp.where(ok, wd_s, 0.0), mode="drop")
        wn_acc = jnp.zeros((nvox, 3), jnp.float32).at[lin].add(
            jnp.where(ok[:, None], wn_s, 0.0), mode="drop")
        # rays axis: full reduction; blocks axis: reduce_scatter so each
        # device keeps only its block shard of the contribution field
        w_acc = jax.lax.psum(w_acc, RAY_AXIS)
        wd_acc = jax.lax.psum(wd_acc, RAY_AXIS)
        wn_acc = jax.lax.psum(wn_acc, RAY_AXIS)
        w_acc = jax.lax.psum_scatter(w_acc, BLOCK_AXIS, tiled=True)
        wd_acc = jax.lax.psum_scatter(wd_acc, BLOCK_AXIS, tiled=True)
        wn_acc = jax.lax.psum_scatter(wn_acc, BLOCK_AXIS, tiled=True)
        return w_acc, wd_acc, wn_acc

    w_acc, wd_acc, wn_acc = accumulate(
        grid, vi_flat, valid_flat, w_flat, wd_flat, wn_flat
    )
    w_acc = w_acc.reshape(grid.dist.shape)
    wd_acc = wd_acc.reshape(grid.dist.shape)
    wn_acc = wn_acc.reshape(grid.grad.shape)

    new_weight = grid.weight + w_acc
    new_dist = jnp.where(
        new_weight > 0.0,
        (grid.dist * grid.weight + wd_acc) / jnp.maximum(new_weight, 1e-30),
        grid.dist,
    )
    new_grad = grid.grad + wn_acc
    return grid._replace(dist=new_dist, weight=new_weight, grad=new_grad)
