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
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..models import tracker as tracker_mod
from ..ops import fusion as fusion_mod
from ..ops import voxel_grid as vg
from ..utils import se3
from .mesh import BLOCK_AXIS, RAY_AXIS


def _grid_spec_replicated():
    return vg.VoxelGrid(
        directory=P(), coarse_occ=P(), num_active=P(), overflow=P(),
        oob_samples=P(),
        block_coords=P(), dist=P(), weight=P(),
        grad_x=P(), grad_y=P(), grad_z=P(),
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


def sharded_fuse_frame(mesh, grid, depth, cache, R, t, gcfg, fcfg):
    """Fusion with ray-sharded sample generation + psum'd accumulators.

    Block allocation runs replicated (deterministic); the contribution
    scatter is local per device followed by a single psum over the mesh.
    """
    normals_img = fusion_mod.compute_normals(cache, depth)
    s = fusion_mod._sample_frame(depth, normals_img, cache, R, t, gcfg, fcfg)

    grid = vg.insert_keys(grid, s.keys, gcfg)
    grid = grid._replace(oob_samples=grid.oob_samples + s.oob)

    n_dev = mesh.devices.size
    pad = (-s.keys.shape[0]) % n_dev
    if pad:
        s = fusion_mod.FrameSamples(
            keys=jnp.pad(s.keys, (0, pad), constant_values=vg.EMPTY_KEY),
            local_lin=jnp.pad(s.local_lin, (0, pad)),
            w=jnp.pad(s.w, (0, pad)),
            wd=jnp.pad(s.wd, (0, pad)),
            wn_x=jnp.pad(s.wn_x, (0, pad)),
            wn_y=jnp.pad(s.wn_y, (0, pad)),
            wn_z=jnp.pad(s.wn_z, (0, pad)),
            oob=s.oob,
        )

    nvox = grid.num_blocks * grid.voxels_per_block
    vpb = gcfg.voxels_per_block

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(_grid_spec_replicated(),) + (P((RAY_AXIS, BLOCK_AXIS)),) * 7,
        out_specs=tuple(P(BLOCK_AXIS) for _ in range(5)),
    )
    def accumulate(grid, keys, local_lin, w, wd, wnx, wny, wnz):
        slot = vg.lookup_keys(grid, keys, gcfg)
        ok = slot >= 0
        lin = jnp.where(ok, slot * vpb + local_lin, nvox)
        accs = []
        for vals in (w, wd, wnx, wny, wnz):
            a = jnp.zeros((nvox,), jnp.float32).at[lin].add(vals, mode="drop")
            # rays axis: full reduction; blocks axis: reduce_scatter so each
            # device keeps only its block shard of the contribution field
            a = jax.lax.psum(a, RAY_AXIS)
            a = jax.lax.psum_scatter(a, BLOCK_AXIS, tiled=True)
            accs.append(a)
        return tuple(accs)

    w_acc, wd_acc, gx, gy, gz = accumulate(
        grid, s.keys, s.local_lin, s.w, s.wd, s.wn_x, s.wn_y, s.wn_z
    )
    w_acc = w_acc.reshape(grid.dist.shape)
    wd_acc = wd_acc.reshape(grid.dist.shape)
    wn_acc = jnp.stack(
        [gx.reshape(grid.dist.shape), gy.reshape(grid.dist.shape),
         gz.reshape(grid.dist.shape)], axis=-1
    )

    new_weight = grid.weight + w_acc
    new_dist = jnp.where(
        new_weight > 0.0,
        (grid.dist * grid.weight + wd_acc) / jnp.maximum(new_weight, 1e-30),
        grid.dist,
    )
    return grid._replace(
        dist=new_dist, weight=new_weight,
        grad_x=grid.grad_x + wn_acc[..., 0],
        grad_y=grid.grad_y + wn_acc[..., 1],
        grad_z=grid.grad_z + wn_acc[..., 2],
    )


# ---------------------------------------------------------------------------
# sharded photometric bundle adjustment
# ---------------------------------------------------------------------------


def _ba_problem_spec(vspec):
    """PartitionSpec pytree for BAProblem with voxel arrays on `vspec`."""
    from ..models import photo_ba as pba

    return pba.BAProblem(
        vox=vspec, grad=vspec, weight=vspec, vmask=vspec, vis=vspec,
        images=P(), K=P(),
    )


def _ba_state_spec(vspec):
    from ..models import photo_ba as pba

    return pba.BAState(dist=vspec, R=P(), t=P())


def sharded_ba_step(mesh, problem, state, gcfg, pcfg):
    """One PhotoBA iteration (pose step + dist step) with the surface-voxel
    axis sharded across the mesh — the "sharded Gauss-Newton" of the north
    star: per-frame 6x6 pose systems are psum-reduced over voxel shards,
    the per-voxel scalar dist solves are embarrassingly parallel, and poses
    stay replicated.

    Requires problem.vox.shape[0] divisible by the mesh size (build_problem
    pads to a multiple of 1024, so pad `pad_to` accordingly).
    """
    from ..models import photo_ba as pba

    axes = (RAY_AXIS, BLOCK_AXIS)
    vspec = P(axes)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(_ba_problem_spec(vspec), _ba_state_spec(vspec)),
        out_specs=(_ba_state_spec(vspec), P(), P()),
    )
    def step(problem, state):
        # pose step: per-voxel terms (counts, means over frames) are local
        # to each voxel shard; only the per-frame (H, b) need the psum
        frame_AJ, n, inv_n, mean_A, xs = pba._pose_terms(
            problem, state, gcfg, pcfg
        )

        def per_frame(carry, xsi):
            Ri, ti, img, vis_i, _ = xsi
            A, Jc, valid = frame_AJ(Ri, ti, img, vis_i)
            w = (valid & (n > 0)).astype(jnp.float32)
            r = A - mean_A
            b = jax.lax.psum(jnp.einsum("v,vc,vce->e", w, r, Jc), axes)
            H = jax.lax.psum(
                jnp.einsum("v,vce,vcf->ef", w * (1.0 - inv_n), Jc, Jc), axes
            )
            return carry, (H, b)

        _, (H, b) = jax.lax.scan(per_frame, None, xs)
        delta = jax.vmap(
            lambda Hi, bi: jnp.linalg.solve(Hi + 1e-12 * jnp.eye(6), bi)
        )(H, b)
        state = pba._apply_pose_delta(state, delta)

        e_pose = jax.lax.psum(pba.energy(problem, state, gcfg), axes)
        # dist step: per-voxel scalar solves, fully local to each shard
        state = pba.solve_dist(problem, state, gcfg, pcfg)
        e_dist = jax.lax.psum(pba.energy(problem, state, gcfg), axes)
        return state, e_pose, e_dist

    return step(problem, state)
