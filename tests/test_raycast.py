import numpy as np
import jax.numpy as jnp
import pytest

from gradient_sdf_tpu.config import GridConfig, FusionConfig
from gradient_sdf_tpu.ops import voxel_grid as vg
from gradient_sdf_tpu.ops import fusion, normals, raycast
from gradient_sdf_tpu.data import synth

W, H = 96, 72
K = np.array([[79.0, 0, 47.5], [0, 79.0, 35.5], [0, 0, 1]], dtype=np.float32)
GCFG = GridConfig(voxel_size=0.02, num_blocks=4096, table_size=16384)
FCFG = FusionConfig(trunc_voxels=5.0)


@pytest.fixture(scope="module")
def fused():
    world = synth.SphereWorld(
        centers=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
        radii=jnp.asarray([0.3], jnp.float32),
    )
    cache = normals.build_cache(W, H, K, window=5)
    poses = synth.orbit_poses(n=12, radius=1.2)
    grid = vg.create(GCFG)
    for i in range(6):
        R, t = poses[i]
        depth = synth.render_depth(world, jnp.asarray(R), jnp.asarray(t), K, W, H)
        grid = fusion.fuse_frame(grid, depth, cache, jnp.asarray(R), jnp.asarray(t),
                                 GCFG, FCFG)
    return world, poses, grid


def test_rendered_depth_matches_analytic(fused):
    world, poses, grid = fused
    R, t = poses[2]
    depth_gt = np.asarray(
        synth.render_depth(world, jnp.asarray(R), jnp.asarray(t), K, W, H)
    )
    depth, normal, hit = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        s_min=0.3, s_max=2.5,
    )
    depth = np.asarray(depth)
    hit = np.asarray(hit)
    gt_hit = depth_gt > 0

    # most GT-hit pixels are hit by the raycaster (band edges may differ)
    overlap = hit & gt_hit
    assert overlap.sum() > 0.7 * gt_hit.sum()
    err = np.abs(depth[overlap] - depth_gt[overlap])
    assert np.median(err) < GCFG.voxel_size  # depth within one voxel

    # normals near GT-surface normals
    pts = np.asarray(
        raycast.camera_rays(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H)[0]
    )
    n = np.asarray(normal).reshape(-1, 3)
    hitf = hit.reshape(-1)
    # analytic outward normal at hit points
    hp = np.asarray(
        raycast.render_depth_normal(
            grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
            s_min=0.3, s_max=2.5,
        )[0]
    )
    # use the hit points from raycast result instead
    res = raycast.raycast(
        grid,
        *raycast.camera_rays(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H)[:2],
        GCFG, FCFG, s_min=0.3, s_max=2.5,
    )
    p = np.asarray(res.points)[hitf]
    n_true = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    cos = np.sum(n[hitf] * n_true, axis=-1)
    assert np.median(cos) > 0.97


def test_raycast_misses_empty_space(fused):
    world, poses, grid = fused
    origins = jnp.asarray([[5.0, 5.0, 5.0]], jnp.float32)
    dirs = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    res = raycast.raycast(grid, origins, dirs, GCFG, FCFG, s_max=2.0)
    assert not bool(res.hit[0])
    assert float(res.depth[0]) == 0.0
