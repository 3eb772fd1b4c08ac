"""Box-world fixture tests: the non-sphere analytic scene (creases,
planar faces, occlusion edges — data/synth.BoxWorld) and its analysis
path. The reference's target data is planar indoor scenes
(/root/reference/README.md:50,67); this fixture supplies those features
with exact ground truth. The compiled-binary comparison lives in
parity/run_golden_parity.py --box."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gradient_sdf_tpu.data import synth
from gradient_sdf_tpu.utils import se3

W, H = 160, 120
K = synth.KINECT_K.copy() * np.array([[0.25], [0.25], [1.0]])


def _poses(n=4):
    return synth.orbit_poses(n=n, radius=1.8, height_range=(0.35, 0.6),
                             target=np.array([0.0, 0.0, -0.25]),
                             arc=np.deg2rad(4.0))


def test_box_render_matches_analytic_sdf():
    """Backprojected depth pixels lie exactly on the analytic zero set and
    the analytic gradients are unit; stepping inward decreases the SDF."""
    world = synth.default_boxes(seed=2)
    R, t = map(jnp.asarray, _poses()[0])
    d = np.asarray(synth.render_depth_boxes(world, R, t, K, W, H))
    assert 0.15 < (d > 0).mean() < 0.9
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    m = d > 0
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    pc = np.stack([(u - cx) / fx * d, (v - cy) / fy * d, d], -1)[m]
    pw = se3.se3_apply(R, t, jnp.asarray(pc, jnp.float32))
    sdf, grad = synth.box_sdf(world, pw)
    assert float(jnp.max(jnp.abs(sdf))) < 1e-5
    norms = jnp.linalg.norm(grad, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
    s2, _ = synth.box_sdf(world, pw - 0.04 * grad)
    assert float(jnp.max(s2)) < 0.0  # inward step goes inside everywhere


def test_box_render_has_occlusion_edges():
    """A box standing on the floor must produce a depth DISCONTINUITY
    (silhouette) somewhere: adjacent pixels jumping by >> voxel scale."""
    world = synth.default_boxes(seed=2)
    R, t = map(jnp.asarray, _poses()[0])
    d = np.asarray(synth.render_depth_boxes(world, R, t, K, W, H))
    both = (d[:, 1:] > 0) & (d[:, :-1] > 0)
    jumps = np.abs(np.diff(d, axis=1))[both]
    assert (jumps > 0.1).sum() > 20  # depth steps >10 cm exist


def test_box_world_separation():
    """default_boxes: objects rest ON the floor (bottom face at its top
    plane) and are xy-separated, so creases stay isolated."""
    world = synth.default_boxes(seed=0, n=3)
    c = np.asarray(world.centers)
    h = np.asarray(world.half_extents)
    floor_top = c[0, 2] + h[0, 2]
    np.testing.assert_allclose(c[1:, 2] - h[1:, 2], floor_top, atol=1e-6)
    for i in range(1, 4):
        for j in range(i + 1, 4):
            gap = np.max(np.abs(c[i, :2] - c[j, :2]) - (h[i, :2] + h[j, :2]))
            assert gap > 0.05


def test_box_scan3d_gt_fusion_and_analysis(tmp_path):
    """End-to-end on a generated box dataset: GT-pose fusion populates the
    map, the mesh exports, and the stored gradients beat 1 degree median
    against the ANALYTIC box normals near the surface (exact planar faces
    are the easiest possible case for the running-mean gradient — this
    pins that the whole pipeline preserves it through creases)."""
    from gradient_sdf_tpu.apps import make_synth, scan3d
    from gradient_sdf_tpu.analysis import gradient_analysis as ga
    from gradient_sdf_tpu.utils.ply import load_ply

    data = str(tmp_path / "boxdata")
    make_synth.generate(data, frames=4, seed=2, width=160, height=120,
                        noise=False, arc_deg=4.0, world_kind="box")
    assert os.path.isfile(os.path.join(data, "boxes.txt"))
    out = str(tmp_path / "boxout")
    args = scan3d.build_parser().parse_args([
        "--input", data, "--results", out, "--pose-file", "gt_poses.txt",
        "--data-type", "synth", "--voxel-size", "0.02", "--trunc", "5",
        "--save-sdf"])
    m = scan3d.run_scan(args)
    assert m["frames"] == 4 and m["num_blocks_active"] > 20
    mesh = load_ply(os.path.join(out, "gradient_sdf_mesh_final.ply"))
    assert len(mesh["vertex"]) > 100

    dump = ga.load_sdf_dump(os.path.join(out, "gradient_sdf"))
    boxes = np.loadtxt(os.path.join(data, "boxes.txt"))
    res = ga.analyze_boxes(dump, boxes[:, :3], boxes[:, 3:], num_bins=5)
    near = [b for b in res["stored"] if b.get("count")][0]
    assert near["count"] > 500
    # 160x120 floor is observed at grazing incidence with a 4x4-pixel
    # voxel footprint -> FALS normals are noisy (measured median ~11 deg
    # here vs 0.22 deg at VGA, where the parity harness pins <= 5 deg);
    # this test pins pipeline integrity at CI resolution
    assert near["median"] < 15.0


def test_cosine_correction_halves_grazing_bias():
    """FusionConfig.cosine_correction (opt-in, non-parity): storing the
    point-to-plane distance must cut the systematic residual BIAS on the
    grazing floor plane — the measured root cause of box-scene tracking
    failure (PARITY.md box stage). Pins the round-5 measurement: floor
    phi mean 6.3 -> 3.7 mm at 320x240 (asserted as a >25% reduction)."""
    import dataclasses

    import jax.numpy as jnp

    from gradient_sdf_tpu.config import preset
    from gradient_sdf_tpu.ops import fusion, normals, query
    from gradient_sdf_tpu.ops import voxel_grid as vg

    cfg = preset("synth")
    gcfg = dataclasses.replace(cfg.grid, voxel_size=0.02)
    world = synth.default_boxes(seed=2)
    K2 = synth.KINECT_K.copy()
    K2[0] *= 0.5
    K2[1] *= 0.5
    W2, H2 = 320, 240
    poses = synth.orbit_poses(n=2, radius=1.8, height_range=(0.35, 0.6),
                              target=np.array([0.0, 0.0, -0.25]),
                              arc=np.deg2rad(4.0))
    cache = normals.build_cache(W2, H2, K2, window=5)
    R0, t0 = map(jnp.asarray, poses[0])
    d0 = synth.render_depth_boxes(world, R0, t0, K2, W2, H2)
    d = np.asarray(d0)
    m = d > 0
    v, u = np.meshgrid(np.arange(H2), np.arange(W2), indexing="ij")
    fx, fy, cx, cy = K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2]
    pc = np.stack([(u - cx) / fx * d, (v - cy) / fy * d, d], -1)[m]
    pw = se3.se3_apply(R0, t0, jnp.asarray(pc, jnp.float32))
    _, g_t = synth.box_sdf(world, pw)
    floor = np.asarray(g_t)[:, 2] > 0.9

    means = {}
    for cc in (False, True):
        fcfg = dataclasses.replace(cfg.fusion, trunc_voxels=5.0,
                                   cosine_correction=cc)
        grid = vg.create(gcfg)
        grid = fusion.fuse_frame(grid, d0, cache, R0, t0, gcfg, fcfg)
        phi, _, w = query.tsdf_grad(grid, pw, gcfg, fcfg)
        sel = floor & (np.asarray(w) > 0)
        means[cc] = abs(float(np.asarray(phi)[sel].mean()))
    assert means[True] < 0.75 * means[False], means


def test_gradient_analysis_fd_sign_convention(tmp_path):
    """FD gradients of the STORED field (negative in observed free space)
    point inward UNFLIPPED: on a perfect synthetic fusion both stored and
    central-FD medians must be small angles, not ~180 deg (a sign flip
    lived in the analysis through round 4 and made every FD method score
    ~177 deg; this pins the fix)."""
    from gradient_sdf_tpu.apps import make_synth, scan3d
    from gradient_sdf_tpu.analysis import gradient_analysis as ga

    data = str(tmp_path / "sphdata")
    make_synth.generate(data, frames=4, seed=1, width=160, height=120,
                        noise=False, arc_deg=4.0)
    out = str(tmp_path / "sphout")
    args = scan3d.build_parser().parse_args([
        "--input", data, "--results", out, "--pose-file", "gt_poses.txt",
        "--data-type", "synth", "--voxel-size", "0.02", "--trunc", "5",
        "--save-sdf"])
    scan3d.run_scan(args)
    dump = ga.load_sdf_dump(os.path.join(out, "gradient_sdf"))
    sph = np.loadtxt(os.path.join(data, "spheres.txt"))
    res = ga.analyze(dump, sph[:, :3], sph[:, 3], num_bins=5)
    for meth in ("stored", "central"):
        near = [b for b in res[meth] if b.get("count")][0]
        assert near["median"] < 30.0, (meth, near)
