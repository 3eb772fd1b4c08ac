import numpy as np
import jax.numpy as jnp
import pytest

from gradient_sdf_tpu.config import GridConfig, FusionConfig
from gradient_sdf_tpu.ops import voxel_grid as vg
from gradient_sdf_tpu.ops import fusion, normals, raycast
from gradient_sdf_tpu.data import synth

W, H = 96, 72
K = np.array([[79.0, 0, 47.5], [0, 79.0, 35.5], [0, 0, 1]], dtype=np.float32)
GCFG = GridConfig(voxel_size=0.02, num_blocks=4096)
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


def test_prior_pass_matches_full_march(fused):
    """The low-res prior pass (prior_stride) only narrows march windows; the
    rendered image must match the unwindowed march (tiny edge tolerance)."""
    world, poses, grid = fused
    R, t = poses[3]
    kw = dict(s_min=0.3, s_max=2.5)
    d0, _, h0 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        prior_stride=0, **kw)
    d1, _, h1 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        prior_stride=8, **kw)
    h0 = np.asarray(h0); h1 = np.asarray(h1)
    both = h0 & h1
    # hit masks agree except possibly at silhouette edges
    assert (h0 ^ h1).sum() <= 0.02 * max(both.sum(), 1)
    err = np.abs(np.asarray(d1)[both] - np.asarray(d0)[both])
    # a sub-0.5% tail may bracket a different crossing at band edges
    assert np.quantile(err, 0.995) < 1.5 * GCFG.voxel_size
    assert err.max() < 10 * GCFG.voxel_size


def test_depth_gradient_matches_finite_differences(fused):
    """IFT depth differentiability: d(mean interior depth)/d(translation)
    through render_depth_normal agrees with central finite differences.

    The per-pixel depth is only piecewise-smooth (the zero crossing of the
    semi-implicit field sits on voxel-boundary jumps), so FD is evaluated on
    a mean over eroded-interior pixels at a voxel-scale step, and the check
    is direction (cos) + magnitude ratio rather than elementwise equality.
    """
    import jax
    import scipy.ndimage as ndi

    world, poses, grid = fused
    R, t = poses[2]
    Rj = jnp.asarray(R)
    t0 = jnp.asarray(t)

    _, _, hit0 = raycast.render_depth_normal(
        grid, jnp.asarray(K), Rj, t0, W, H, GCFG, FCFG,
        s_min=0.3, s_max=2.5, prior_stride=0)
    sel = jnp.asarray(ndi.binary_erosion(np.asarray(hit0), iterations=4))
    n_sel = float(np.asarray(sel).sum())
    assert n_sel > 300

    def mean_depth(tj):
        d, _, _ = raycast.render_depth_normal(
            grid, jnp.asarray(K), Rj, tj, W, H, GCFG, FCFG,
            s_min=0.3, s_max=2.5, prior_stride=0)
        return jnp.sum(jnp.where(sel, d, 0.0)) / n_sel

    g = np.asarray(jax.grad(mean_depth)(t0))
    assert np.all(np.isfinite(g))
    eps = 3e-3
    fd = np.zeros(3)
    for a in range(3):
        fd[a] = (float(mean_depth(t0.at[a].add(eps)))
                 - float(mean_depth(t0.at[a].add(-eps)))) / (2 * eps)
    cos = np.dot(g, fd) / (np.linalg.norm(g) * np.linalg.norm(fd))
    ratio = np.linalg.norm(g) / np.linalg.norm(fd)
    assert cos > 0.97, f"gradient direction off: cos={cos:.3f}"
    assert 0.7 < ratio < 1.4, f"gradient magnitude off: ratio={ratio:.3f}"


def test_depth_prior_render_matches_full(fused):
    """Rendering with the previous frame's depth as prior (frame-to-model
    path) matches the from-scratch render on prior-covered pixels."""
    world, poses, grid = fused
    R, t = poses[3]
    kw = dict(s_min=0.3, s_max=2.5)
    d0, _, h0 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        prior_stride=0, **kw)
    # prior = the true render itself (ideal stationary-camera prior)
    d1, _, h1 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        depth_prior=d0, **kw)
    h0 = np.asarray(h0); h1 = np.asarray(h1)
    both = h0 & h1
    assert both.sum() > 0.95 * h0.sum()
    err = np.abs(np.asarray(d1)[both] - np.asarray(d0)[both])
    assert np.quantile(err, 0.995) < 1.5 * GCFG.voxel_size


def test_prior_miss_skip_only_drops_subcell_geometry(fused):
    """prior_miss_skip never adds hits and only removes hits whose whole
    coarse neighborhood missed (silhouette tails)."""
    world, poses, grid = fused
    R, t = poses[2]
    kw = dict(s_min=0.3, s_max=2.5, prior_stride=4)
    _, _, h_march = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        prior_miss_skip=False, **kw)
    _, _, h_skip = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        prior_miss_skip=True, **kw)
    h_march = np.asarray(h_march); h_skip = np.asarray(h_skip)
    assert not np.any(h_skip & ~h_march)          # no new hits
    lost = (h_march & ~h_skip).sum()
    assert lost <= 0.02 * max(h_march.sum(), 1)   # only silhouette tails


def test_depth_prior_hole_skip(fused):
    """depth_prior_holes='skip': prior-covered pixels render identically;
    hole pixels are misses."""
    world, poses, grid = fused
    R, t = poses[3]
    kw = dict(s_min=0.3, s_max=2.5)
    d0, _, h0 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        prior_stride=0, **kw)
    d1, _, h1 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        depth_prior=d0, depth_prior_holes="skip", **kw)
    h0 = np.asarray(h0); h1 = np.asarray(h1)
    assert not np.any(h1 & ~h0)       # holes stay misses
    both = h0 & h1
    assert both.sum() > 0.95 * h0.sum()
    err = np.abs(np.asarray(d1)[both] - np.asarray(d0)[both])
    assert np.quantile(err, 0.995) < 1.5 * GCFG.voxel_size


def test_depth_prior_tight_margin(fused):
    """prior_margin_voxels=4 with a prior perturbed by up to 2 voxels
    (realistic frame-to-model prior error) still brackets the surface:
    covered pixels render the same depth as the from-scratch pass."""
    world, poses, grid = fused
    R, t = poses[3]
    kw = dict(s_min=0.3, s_max=2.5)
    d0, _, h0 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        prior_stride=0, **kw)
    rng = np.random.default_rng(7)
    noise = rng.uniform(-2.0, 2.0, size=(H, W)).astype(np.float32)
    d_prior = jnp.asarray(
        np.where(np.asarray(h0), np.asarray(d0) + noise * GCFG.voxel_size, 0.0)
    )
    d1, _, h1 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG, FCFG,
        depth_prior=d_prior, depth_prior_holes="skip",
        prior_margin_voxels=4.0, **kw)
    h0 = np.asarray(h0); h1 = np.asarray(h1)
    assert not np.any(h1 & ~h0)
    both = h0 & h1
    assert both.sum() > 0.93 * h0.sum()
    err = np.abs(np.asarray(d1)[both] - np.asarray(d0)[both])
    assert np.quantile(err, 0.99) < 1.5 * GCFG.voxel_size


def test_raster_prior_matches_full_march(fused):
    """prior_mode='raster' (active blocks rasterized to screen tiles ->
    exact per-pixel windows) must reproduce the unwindowed march: misses
    are PROVABLY exact (crossings live inside active blocks), hits may
    bracket at sub-voxel differences only."""
    world, poses, grid = fused
    R, t = poses[3]
    kw = dict(s_min=0.3, s_max=2.5)
    d0, _, h0 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG,
        FCFG, prior_stride=0, **kw)
    d1, _, h1 = raycast.render_depth_normal(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG,
        FCFG, prior_mode="raster", **kw)
    h0 = np.asarray(h0)
    h1 = np.asarray(h1)
    # exact culling: no full-march hit may be lost
    assert not (h0 & ~h1).any()
    # and the window can't invent hits beyond band-edge re-bracketing
    assert (h1 & ~h0).sum() <= 0.005 * max(h0.sum(), 1)
    both = h0 & h1
    err = np.abs(np.asarray(d1)[both] - np.asarray(d0)[both])
    assert np.quantile(err, 0.995) < 1.5 * GCFG.voxel_size
    assert err.max() < 10 * GCFG.voxel_size

    # window soundness directly: every hit depth lies inside its window
    s_lo, s_hi = raycast.block_raster_windows(
        grid, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), W, H, GCFG)
    ray_s = np.asarray(d0).reshape(-1) / np.asarray(
        raycast.camera_rays(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
                            W, H)[2])
    hit_flat = h0.reshape(-1)
    lo = np.asarray(s_lo)[hit_flat]
    hi = np.asarray(s_hi)[hit_flat]
    sv = ray_s[hit_flat]
    assert (sv >= lo - 1e-4).all() and (sv <= hi + 1e-4).all()


def test_straggler_capacity_ladder_rungs_identical(fused):
    """The straggler round's capacity ladder (tightest fitting cap among
    {n/div, n/8, full} via lax.switch) is a pure buffer-size choice: every
    rung must march the same rays to the same brackets. Force different
    bucket selections with divisors spanning tight-to-loose and compare
    bit-exactly against the uncompacted march."""
    world, poses, grid = fused
    R, t = poses[4]
    o, d, _ = raycast.camera_rays(jnp.asarray(K), jnp.asarray(R),
                                  jnp.asarray(t), W, H)
    kw = dict(s_min=0.3, s_max=2.5)
    base = raycast.raycast(grid, o, d, GCFG, FCFG,
                           compact_divisors=(), **kw)
    # div 4096 -> cap 1 ray: the survivor count certainly overflows the
    # tight rung, exercising the n/8 (and possibly full-width) escape;
    # div 2 -> cap n/2: the widest compacted rung fits trivially
    for divs in ((64,), (8,), (2,), (4096,), (16, 256)):
        res = raycast.raycast(grid, o, d, GCFG, FCFG,
                              compact_divisors=divs, **kw)
        np.testing.assert_array_equal(np.asarray(res.hit),
                                      np.asarray(base.hit), err_msg=str(divs))
        np.testing.assert_array_equal(np.asarray(res.depth),
                                      np.asarray(base.depth),
                                      err_msg=str(divs))
