import os

import numpy as np
import jax.numpy as jnp
import pytest

from gradient_sdf_tpu.apps import make_synth, scan3d
from gradient_sdf_tpu.config import GridConfig
from gradient_sdf_tpu.ops import voxel_grid as vg
from gradient_sdf_tpu.utils import checkpoint as ckpt


def test_state_roundtrip(tmp_path):
    gcfg = GridConfig(num_blocks=128)
    grid = vg.create(gcfg)
    coords = jnp.asarray([[1, 2, 3], [-4, 0, 5]], jnp.int32)
    grid = vg.insert_keys(grid, vg.pack_key(coords, gcfg), gcfg)
    grid = grid._replace(dist=grid.dist.at[0, 7].set(0.5))
    vis = jnp.ones((128, 512, 2), jnp.uint32)
    poses = [("001", np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
             ("002", np.eye(3, dtype=np.float32), np.ones(3, np.float32))]

    path = str(tmp_path / "state.npz")
    ckpt.save_state(path, grid, vis=vis, counter=2, poses=poses)
    state = ckpt.load_state(path)

    g2 = state["grid"]
    assert int(g2.num_active) == 2
    np.testing.assert_array_equal(np.asarray(g2.directory),
                                  np.asarray(grid.directory))
    np.testing.assert_allclose(np.asarray(g2.dist), np.asarray(grid.dist))
    np.testing.assert_array_equal(np.asarray(state["vis"]), np.asarray(vis))
    assert state["counter"] == 2
    assert len(state["poses"]) == 2
    assert state["poses"][1][0] == "002"
    np.testing.assert_allclose(state["poses"][1][2], np.ones(3))


def test_scan3d_checkpoint_resume_equivalence(tmp_path):
    """Run 4 frames straight vs 2 frames + checkpoint + resume 2: same grid."""
    data = str(tmp_path / "data")
    make_synth.generate(data, frames=4, seed=3, width=64, height=48,
                        noise=False, arc_deg=3.0)

    out_a = str(tmp_path / "a")
    args = scan3d.build_parser().parse_args([
        "--input", data, "--results", out_a, "--pose-file", "gt_poses.txt",
        "--data-type", "synth", "--voxel-size", "0.02",
    ])
    scan3d.run_scan(args)

    out_b = str(tmp_path / "b")
    args = scan3d.build_parser().parse_args([
        "--input", data, "--results", out_b, "--pose-file", "gt_poses.txt",
        "--data-type", "synth", "--voxel-size", "0.02",
        "--last", "1", "--checkpoint-every", "1",
    ])
    scan3d.run_scan(args)
    args = scan3d.build_parser().parse_args([
        "--input", data, "--results", out_b, "--pose-file", "gt_poses.txt",
        "--data-type", "synth", "--voxel-size", "0.02",
        "--resume", os.path.join(out_b, "checkpoint.npz"),
    ])
    metrics = scan3d.run_scan(args)
    assert metrics["frames"] == 2  # only the remaining frames processed

    # identical trajectories and identical SDF dumps
    from gradient_sdf_tpu.utils import tumio

    ta = tumio.read_trajectory(os.path.join(out_a, "_poses.txt"))
    tb = tumio.read_trajectory(os.path.join(out_b, "_poses.txt"))
    assert len(ta) == len(tb) == 4
    for (sa, Ra, taa), (sb, Rb, tbb) in zip(ta, tb):
        assert sa == sb
        np.testing.assert_allclose(Ra, Rb, atol=1e-6)
        np.testing.assert_allclose(taa, tbb, atol=1e-6)


def test_grown_grid_config_roundtrip(tmp_path):
    """A checkpoint taken after directory growth restores the grown
    GridConfig (a stale dir_dim would mis-linearize every key on resume)."""
    import dataclasses

    gcfg = GridConfig(voxel_size=0.02, num_blocks=128, dir_dim=16)
    grid = vg.create(gcfg)
    coords = jnp.asarray([[1, 2, 3]], jnp.int32)
    grid = vg.insert_keys(grid, vg.pack_key(coords, gcfg), gcfg)
    grid, gcfg = vg.grow_directory(grid, gcfg)  # dir_dim 16 -> 32

    path = str(tmp_path / "state.npz")
    ckpt.save_state(path, grid, counter=1, grid_cfg=gcfg)
    state = ckpt.load_state(path)
    gc = state["grid_cfg"]
    assert gc.dir_dim == 32
    assert gc.num_blocks == 128
    assert abs(gc.voxel_size - 0.02) < 1e-9
    # lookups against the restored grid with the restored cfg resolve
    lin, present = vg.lookup_voxels(
        state["grid"], vg.block_local_to_voxel(coords, gc), gc)
    assert np.all(np.asarray(present))

    # legacy checkpoint (no gcfg): geometry recovered from array shapes
    ckpt.save_state(path, grid, counter=1)
    state2 = ckpt.load_state(path)
    gc2 = state2["grid_cfg"]
    assert gc2.dir_dim == 32 and gc2.num_blocks == 128
    import math
    assert math.isnan(gc2.voxel_size)


def test_lagged_checkpoint_cadence_matches_sync(tmp_path, monkeypatch):
    """With --checkpoint-every K>1 under lagged flags, checkpoints must fire
    at the same frames (same fused counters) as a --sync-growth-checks run:
    the cadence gate accounts for the pending frame's in-flight counter
    increment (ADVICE r4) instead of reading the stale counter."""
    data = str(tmp_path / "data")
    # 160x120 so at least one tracked frame converges (the 1e-3 gate sits
    # at the GN noise floor below that); convergence is deterministic on CPU
    make_synth.generate(data, frames=5, seed=2, width=160, height=120,
                        noise=False, arc_deg=2.0)
    base = ["--input", data, "--pose-file", "nonexistent.txt",
            "--data-type", "synth", "--voxel-size", "0.02", "--trunc", "5",
            "--merged-step", "--checkpoint-every", "2"]

    saved = {}
    real = ckpt.save_state

    def record(tag):
        def wrapper(path, grid, **kw):
            saved.setdefault(tag, []).append(kw.get("counter"))
            return real(path, grid, **kw)

        return wrapper

    monkeypatch.setattr(ckpt, "save_state", record("lagged"))
    scan3d.run_scan(scan3d.build_parser().parse_args(
        base + ["--results", str(tmp_path / "lag")]))
    monkeypatch.setattr(ckpt, "save_state", record("sync"))
    scan3d.run_scan(scan3d.build_parser().parse_args(
        base + ["--results", str(tmp_path / "sync"), "--sync-growth-checks"]))

    assert saved["lagged"], "no checkpoints fired"
    assert saved["lagged"] == saved["sync"]


def test_scan3d_merged_lagged_checkpoint_resume(tmp_path):
    """Checkpoint/resume under --merged-step with DEFAULT lagged flag
    resolution: a checkpoint written while a frame's packed
    (converged/overflow/oob) flags are still in flight must first drain
    them (scan3d drains before save_state), so the resumed run reproduces
    the straight run's trajectory and frame bookkeeping exactly."""
    data = str(tmp_path / "data")
    make_synth.generate(data, frames=4, seed=1, width=96, height=72,
                        noise=False, arc_deg=5.0)
    base = ["--input", data, "--pose-file", "nonexistent.txt",
            "--data-type", "synth", "--voxel-size", "0.02", "--trunc", "5",
            "--merged-step"]

    out_a = str(tmp_path / "a")
    m_a = scan3d.run_scan(scan3d.build_parser().parse_args(
        base + ["--results", out_a]))

    out_b = str(tmp_path / "b")
    scan3d.run_scan(scan3d.build_parser().parse_args(
        base + ["--results", out_b, "--last", "1", "--checkpoint-every", "1"]))
    m_b = scan3d.run_scan(scan3d.build_parser().parse_args(
        base + ["--results", out_b,
                "--resume", os.path.join(out_b, "checkpoint.npz")]))
    assert m_b["frames"] == 2  # only the remaining frames processed
    assert m_b["invalid_frames"] == [
        i for i in m_a["invalid_frames"] if i >= 2]

    from gradient_sdf_tpu.utils import tumio

    ta = tumio.read_trajectory(os.path.join(out_a, "_poses.txt"))
    tb = tumio.read_trajectory(os.path.join(out_b, "_poses.txt"))
    assert len(ta) == len(tb) == 4
    for (sa, Ra, taa), (sb, Rb, tbb) in zip(ta, tb):
        assert sa == sb
        np.testing.assert_allclose(Ra, Rb, atol=1e-6)
        np.testing.assert_allclose(taa, tbb, atol=1e-6)
