import numpy as np
import jax.numpy as jnp
import pytest

from gradient_sdf_tpu.config import GridConfig, FusionConfig, TrackerConfig
from gradient_sdf_tpu.ops import voxel_grid as vg
from gradient_sdf_tpu.ops import fusion, normals, query
from gradient_sdf_tpu.models import tracker
from gradient_sdf_tpu.utils import se3
from gradient_sdf_tpu.data import synth

W, H = 160, 120
K = np.array([[132.0, 0, 79.5], [0, 132.0, 59.5], [0, 0, 1]], dtype=np.float32)
GCFG = GridConfig(voxel_size=0.02, num_blocks=4096)
FCFG = FusionConfig(trunc_voxels=5.0)
TCFG = TrackerConfig()


@pytest.fixture(scope="module")
def setup():
    world = synth.SphereWorld(
        centers=jnp.asarray([[0.0, 0.0, 0.0], [0.3, 0.25, -0.1], [-0.3, 0.1, 0.2]],
                            jnp.float32),
        radii=jnp.asarray([0.25, 0.14, 0.12], jnp.float32),
    )
    cache = normals.build_cache(W, H, K, window=5)
    poses = synth.orbit_poses(n=24, radius=1.2)
    grid = vg.create(GCFG)
    for i in range(0, 8):
        R, t = poses[i]
        depth = synth.render_depth(world, jnp.asarray(R), jnp.asarray(t), K, W, H)
        grid = fusion.fuse_frame(grid, depth, cache, jnp.asarray(R), jnp.asarray(t),
                                 GCFG, FCFG)
    return world, cache, poses, grid


def test_tracker_recovers_perturbed_pose(setup):
    world, cache, poses, grid = setup
    R_gt, t_gt = poses[4]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt), K, W, H)

    # perturb the GT pose and track back
    xi = jnp.asarray([0.01, -0.015, 0.02, 0.01, -0.012, 0.008], jnp.float32)
    dR, dt = se3.se3_exp(xi)
    R0, t0 = se3.se3_mul(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))

    res = tracker.track_frame(grid, depth, jnp.asarray(K), R0, t0, GCFG, FCFG, TCFG)
    # GN settles at the voxel-discretization noise floor of this sparse
    # synthetic field; require substantial error reduction, not the
    # ||xi|| < 1e-3 flag (which needs dense 640x480 input to trigger)
    dR_err, dt_err = se3.se3_mul(*se3.se3_inv(res.R, res.t),
                                 jnp.asarray(R_gt), jnp.asarray(t_gt))
    err = np.asarray(se3.se3_log(dR_err, dt_err))
    assert int(res.num_valid) > 1000
    assert np.linalg.norm(err) < 0.4 * float(jnp.linalg.norm(xi))
    assert np.linalg.norm(err) < 0.012


def test_tracker_identity_on_gt_pose(setup):
    """Tracking from the exact GT pose must stay there (tiny correction)."""
    world, cache, poses, grid = setup
    R_gt, t_gt = poses[5]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt), K, W, H)
    res = tracker.track_frame(grid, depth, jnp.asarray(K),
                              jnp.asarray(R_gt), jnp.asarray(t_gt), GCFG, FCFG, TCFG)
    dR_err, dt_err = se3.se3_mul(*se3.se3_inv(res.R, res.t),
                                 jnp.asarray(R_gt), jnp.asarray(t_gt))
    err = np.asarray(se3.se3_log(dR_err, dt_err))
    # stays within the field's discretization noise floor
    assert np.linalg.norm(err) < 0.015


def test_tracker_no_map_returns_unconverged(setup):
    world, cache, poses, _ = setup
    empty = vg.create(GridConfig(num_blocks=64))
    R_gt, t_gt = poses[0]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt), K, W, H)
    res = tracker.track_frame(
        empty, depth, jnp.asarray(K), jnp.asarray(R_gt), jnp.asarray(t_gt),
        GridConfig(num_blocks=64), FCFG, TCFG,
    )
    # no valid residuals: solver yields xi ~ 0 -> immediately "converged"
    # with zero residual count
    assert int(res.num_valid) == 0


def test_tracker_strided_sampling_matches_dense(setup):
    """sampling=2 (the Scan3D default; reference optimize_sampled stride,
    RigidPointOptimizer.h:63-66) recovers the pose as well as dense."""
    world, cache, poses, grid = setup
    R_gt, t_gt = poses[4]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt), K, W, H)
    xi = jnp.asarray([0.01, -0.015, 0.02, 0.01, -0.012, 0.008], jnp.float32)
    dR, dt = se3.se3_exp(xi)
    R0, t0 = se3.se3_mul(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))

    # compaction off: this test isolates the striding variable (compaction
    # equivalence is covered by test_tracker_compaction_matches_full_width)
    res = tracker.track_frame(grid, depth, jnp.asarray(K), R0, t0, GCFG, FCFG,
                              TrackerConfig(sampling=2, compact_cap_frac=0.0))
    dR_err, dt_err = se3.se3_mul(*se3.se3_inv(res.R, res.t),
                                 jnp.asarray(R_gt), jnp.asarray(t_gt))
    err = np.asarray(se3.se3_log(dR_err, dt_err))
    assert int(res.num_valid) > 250  # ~1/4 of the dense residual count
    # at this test's 160x120, stride 2 leaves only ~5k residuals against a
    # 2 cm grid — a slightly higher noise floor than the dense variant
    assert np.linalg.norm(err) < 0.65 * float(jnp.linalg.norm(xi))
    assert np.linalg.norm(err) < 0.02


def test_tracker_compaction_matches_full_width(setup):
    """compact_cap_frac compacts the depth-valid pixels before the GN loop;
    the residual set is unchanged, so the result must be bitwise-equal to
    the full-width loop."""
    world, cache, poses, grid = setup
    R_gt, t_gt = poses[4]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt), K, W, H)
    xi = jnp.asarray([0.01, -0.015, 0.02, 0.01, -0.012, 0.008], jnp.float32)
    dR, dt = se3.se3_exp(xi)
    R0, t0 = se3.se3_mul(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))

    # few iterations: the residual SET is identical, only the fp summation
    # order differs (buffer size changes the reduction tree), so short runs
    # must agree tightly; long runs at the discretization noise floor
    # amplify that fp noise chaotically and only recovery quality holds.
    for iters in (1, 3):
        res_full = tracker.track_frame(
            grid, depth, jnp.asarray(K), R0, t0, GCFG, FCFG,
            TrackerConfig(num_iterations=iters, compact_cap_frac=0.0))
        res_comp = tracker.track_frame(
            grid, depth, jnp.asarray(K), R0, t0, GCFG, FCFG,
            TrackerConfig(num_iterations=iters, compact_cap_frac=0.5))
        assert int(res_comp.num_valid) == int(res_full.num_valid)
        np.testing.assert_allclose(np.asarray(res_comp.R),
                                   np.asarray(res_full.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(res_comp.t),
                                   np.asarray(res_full.t), atol=1e-5)

    res = tracker.track_frame(grid, depth, jnp.asarray(K), R0, t0, GCFG,
                              FCFG, TrackerConfig(compact_cap_frac=0.5))
    dR_err, dt_err = se3.se3_mul(*se3.se3_inv(res.R, res.t),
                                 jnp.asarray(R_gt), jnp.asarray(t_gt))
    err = np.asarray(se3.se3_log(dR_err, dt_err))
    assert np.linalg.norm(err) < 0.012  # same bound as the recovery test


def test_tracker_compaction_fallback_full_width(setup):
    """A frame with more depth-valid pixels than the compaction buffer must
    fall back to the full-width loop (and still recover the pose)."""
    world, cache, poses, grid = setup
    R_gt, t_gt = poses[4]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt), K, W, H)
    n_valid = int(jnp.sum((depth.reshape(-1) > FCFG.z_min)
                          & (depth.reshape(-1) < FCFG.z_max)))
    frac = 0.5 * n_valid / depth.size  # cap below the frame's valid count
    res = tracker.track_frame(grid, depth, jnp.asarray(K),
                              jnp.asarray(R_gt), jnp.asarray(t_gt), GCFG, FCFG,
                              TrackerConfig(compact_cap_frac=frac))
    # the fallback must process the FULL residual set: its final-iteration
    # residual count has to match an uncompacted run exactly and exceed the
    # compaction cap (a silent truncation to cap would fail both)
    res_ref = tracker.track_frame(grid, depth, jnp.asarray(K),
                                  jnp.asarray(R_gt), jnp.asarray(t_gt), GCFG,
                                  FCFG, TrackerConfig(compact_cap_frac=0.0))
    cap = int(depth.size * frac)
    assert int(res.num_valid) == int(res_ref.num_valid)
    assert int(res.num_valid) > cap
    dR_err, dt_err = se3.se3_mul(*se3.se3_inv(res.R, res.t),
                                 jnp.asarray(R_gt), jnp.asarray(t_gt))
    err = np.asarray(se3.se3_log(dR_err, dt_err))
    assert np.linalg.norm(err) < 0.015


def test_tracker_stride3_recovers_pose(setup):
    """sampling=3 (the bench fast-mode stride; same reference
    optimize_sampled lever) still recovers the pose. At this test's 160x120
    that leaves ~2k residuals against a 2 cm grid, so the bound is looser
    than stride 2; at VGA the residual count matches this test's stride-1."""
    world, cache, poses, grid = setup
    R_gt, t_gt = poses[4]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt), K, W, H)
    xi = jnp.asarray([0.01, -0.015, 0.02, 0.01, -0.012, 0.008], jnp.float32)
    dR, dt = se3.se3_exp(xi)
    R0, t0 = se3.se3_mul(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))

    res = tracker.track_frame(grid, depth, jnp.asarray(K), R0, t0, GCFG, FCFG,
                              TrackerConfig(sampling=3))
    dR_err, dt_err = se3.se3_mul(*se3.se3_inv(res.R, res.t),
                                 jnp.asarray(R_gt), jnp.asarray(t_gt))
    err = np.asarray(se3.se3_log(dR_err, dt_err))
    assert int(res.num_valid) > 100
    assert np.linalg.norm(err) < 0.8 * float(jnp.linalg.norm(xi))
    assert np.linalg.norm(err) < 0.025


def test_tracker_packed_row_gather_matches_default(setup):
    """packed_row_gather (one [*,8]-row gather per GN iteration from the
    per-frame packed field array) computes the identical linearization:
    a single residual pass is bit-equal, and the full GN loop recovers the
    same pose on a well-conditioned frame."""
    world, cache, poses, grid = setup
    R_gt, t_gt = poses[4]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt),
                               K, W, H)
    # bit-equality of one linearization pass at the GT pose
    pts, z = tracker.backproject_grid(depth, jnp.asarray(K), 1)
    zv = (z > FCFG.z_min) & (z < FCFG.z_max)
    ref = tracker._residual_pass(grid, pts, zv, jnp.asarray(R_gt),
                                 jnp.asarray(t_gt), GCFG, FCFG, "grad")
    packed = tracker._pack_fields(grid)
    got = tracker._residual_pass(grid, pts, zv, jnp.asarray(R_gt),
                                 jnp.asarray(t_gt), GCFG, FCFG, "grad",
                                 packed=packed)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # short runs agree tightly; long runs at the discretization noise floor
    # amplify program-level fp differences chaotically and only recovery
    # quality holds (same precedent as the compaction test above)
    xi = jnp.asarray([0.01, -0.015, 0.02, 0.01, -0.012, 0.008], jnp.float32)
    dR, dt = se3.se3_exp(xi)
    R0, t0 = se3.se3_mul(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))
    for iters in (1, 3):
        a = tracker.track_frame(
            grid, depth, jnp.asarray(K), R0, t0, GCFG, FCFG,
            TrackerConfig(num_iterations=iters, packed_row_gather=False))
        b = tracker.track_frame(
            grid, depth, jnp.asarray(K), R0, t0, GCFG, FCFG,
            TrackerConfig(num_iterations=iters, packed_row_gather=True))
        assert int(a.num_valid) == int(b.num_valid)
        np.testing.assert_allclose(np.asarray(b.R), np.asarray(a.R),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.t), np.asarray(a.t),
                                   atol=1e-5)
    res = tracker.track_frame(grid, depth, jnp.asarray(K), R0, t0, GCFG,
                              FCFG, TrackerConfig(packed_row_gather=True))
    dR_err, dt_err = se3.se3_mul(*se3.se3_inv(res.R, res.t),
                                 jnp.asarray(R_gt), jnp.asarray(t_gt))
    err = np.asarray(se3.se3_log(dR_err, dt_err))
    assert np.linalg.norm(err) < 0.012  # same bound as the recovery test


def test_extrapolate_pose_constant_velocity_exact():
    """On an exactly constant-velocity trajectory the extrapolation predicts
    the next pose to machine precision; with no history (same pose twice)
    it is the identity warm start."""
    xi = jnp.asarray([0.02, -0.01, 0.03, 0.015, -0.02, 0.01], jnp.float32)
    dR, dt = se3.se3_exp(xi)
    R0, t0 = se3.identity()
    R1, t1 = se3.se3_mul(R0, t0, dR, dt)       # T1 = T0 * delta
    R2, t2 = se3.se3_mul(R1, t1, dR, dt)       # T2 = T1 * delta
    Rp, tp = tracker.extrapolate_pose(R1, t1, R0, t0)
    np.testing.assert_allclose(np.asarray(Rp), np.asarray(R2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(t2), atol=1e-6)
    Ri, ti = tracker.extrapolate_pose(R1, t1, R1, t1)
    np.testing.assert_allclose(np.asarray(Ri), np.asarray(R1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ti), np.asarray(t1), atol=1e-7)


def test_tracker_warm_start_same_fixed_point(setup):
    """Warm-started GN converges to the same pose as the cold start (the
    warm start changes the start point, not the fixed point), and reaches
    it in no more iterations."""
    world, cache, poses, grid = setup
    R_gt, t_gt = poses[4]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt),
                               K, W, H)
    # history: poses 2 and 3 of the orbit (constant angular velocity), so
    # the extrapolation from (pose3, pose2) lands near pose4 = GT
    R3, t3 = (jnp.asarray(poses[3][0]), jnp.asarray(poses[3][1]))
    R2, t2 = (jnp.asarray(poses[2][0]), jnp.asarray(poses[2][1]))
    cold = tracker.track_frame(grid, depth, jnp.asarray(K), R3, t3,
                               GCFG, FCFG, TCFG)
    Rw, tw = tracker.extrapolate_pose(R3, t3, R2, t2)
    warm = tracker.track_frame(grid, depth, jnp.asarray(K), Rw, tw,
                               GCFG, FCFG, TCFG)
    for res in (cold, warm):
        dR_err, dt_err = se3.se3_mul(*se3.se3_inv(res.R, res.t),
                                     jnp.asarray(R_gt), jnp.asarray(t_gt))
        err = np.asarray(se3.se3_log(dR_err, dt_err))
        assert np.linalg.norm(err) < 0.015
    assert int(warm.num_iters) <= int(cold.num_iters)
    # the two fixed points agree to the field's noise floor
    dR_err, dt_err = se3.se3_mul(*se3.se3_inv(warm.R, warm.t), cold.R, cold.t)
    assert np.linalg.norm(np.asarray(se3.se3_log(dR_err, dt_err))) < 0.01


def test_track_and_fuse_warm_start_plumbing(setup):
    """track_and_fuse_frame(R_prev2, t_prev2) starts GN from the
    extrapolated pose: result is bit-identical to calling extrapolate_pose
    manually and then the plain merged step from that pose."""
    world, cache, poses, grid = setup
    R_gt, t_gt = poses[4]
    depth = synth.render_depth(world, jnp.asarray(R_gt), jnp.asarray(t_gt),
                               K, W, H)
    R3, t3 = (jnp.asarray(poses[3][0]), jnp.asarray(poses[3][1]))
    R2, t2 = (jnp.asarray(poses[2][0]), jnp.asarray(poses[2][1]))
    Rw, tw = tracker.extrapolate_pose(R3, t3, R2, t2)
    g_a, res_a = tracker.track_and_fuse_frame(
        grid, depth, jnp.asarray(K), Rw, tw, cache, GCFG, FCFG, TCFG)
    g_b, res_b = tracker.track_and_fuse_frame(
        grid, depth, jnp.asarray(K), R3, t3, cache, GCFG, FCFG, TCFG,
        R_prev2=R2, t_prev2=t2)
    np.testing.assert_array_equal(np.asarray(res_b.R), np.asarray(res_a.R))
    np.testing.assert_array_equal(np.asarray(res_b.t), np.asarray(res_a.t))
    np.testing.assert_array_equal(np.asarray(vg.flat_field(g_b.dist)),
                                  np.asarray(vg.flat_field(g_a.dist)))


def test_adaptive_compact_cap():
    """Cap follows the depth-valid fraction on a 1/8 grid with slack;
    dense scenes disable compaction (full-width fallback would always
    fire); exact-semantics guarantee is the existing compaction test."""
    d = np.zeros((100, 100), np.float32)
    d[:20] = 1.0  # 20% valid
    cap = tracker.adaptive_compact_cap(d, FCFG)
    assert cap == 0.375  # ceil(0.2 * 1.3 * 8)/8
    assert tracker.adaptive_compact_cap(np.zeros((10, 10), np.float32),
                                        FCFG) == 0.125
    dense = np.full((10, 10), 1.0, np.float32)
    assert tracker.adaptive_compact_cap(dense, FCFG) == 0.0
    # out-of-range depth (beyond z_max) is not "valid"
    far = np.full((10, 10), 99.0, np.float32)
    assert tracker.adaptive_compact_cap(far, FCFG) == 0.125
