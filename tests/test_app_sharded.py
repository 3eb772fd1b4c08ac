"""scan3d --devices N: the multi-device app path, gated against the
single-device app on the virtual 8-device CPU mesh.

The reference's product is its app (`main_scan_3d.cpp:62-319`); the
framework's scale-out story (SURVEY.md §5.7) is only real if the app itself
runs on a mesh with the same semantics — trajectory, volume, bookkeeping,
and checkpoint/resume are gated here, not just the library ops.
"""

import os

import numpy as np
import pytest

from gradient_sdf_tpu.apps import make_synth, scan3d
from gradient_sdf_tpu.utils import tumio


@pytest.fixture(scope="module")
def qvga_dir(tmp_path_factory):
    # 320x240: the smallest resolution where dense GN converges at the
    # reference 1e-3 gate (96x72's noise floor sits above it), so the run
    # exercises the real converge->fuse path instead of track-only frames
    out = str(tmp_path_factory.mktemp("synthqvga"))
    make_synth.generate(out, frames=5, seed=2, width=320, height=240,
                        noise=False, arc_deg=4.0)
    return out


def _run(data_dir, results, extra, last=4):
    args = scan3d.build_parser().parse_args([
        "--input", data_dir, "--results", results,
        "--pose-file", "nonexistent.txt", "--data-type", "synth",
        "--voxel-size", "0.02", "--trunc", "5", "--last", str(last)] + extra)
    return scan3d.run_scan(args)


def _load_dump(path):
    return {int(l.split()[0]): float(l.split()[1]) for l in open(path)}


def test_scan3d_devices_matches_single(qvga_dir, tmp_path):
    res_a = str(tmp_path / "single")
    res_b = str(tmp_path / "mesh8")
    m_a = _run(qvga_dir, res_a, ["--save-sdf"])
    m_b = _run(qvga_dir, res_b,
               ["--save-sdf", "--devices", "8", "--merged-step"])
    assert m_b["frames"] == m_a["frames"]
    assert m_b["invalid_frames"] == m_a["invalid_frames"]
    assert m_b["num_blocks_active"] == m_a["num_blocks_active"]

    ta = tumio.read_trajectory(os.path.join(res_a, "_poses.txt"))
    tb = tumio.read_trajectory(os.path.join(res_b, "_poses.txt"))
    assert len(ta) == len(tb) == m_a["frames"]
    for (sa, Ra, ta_), (sb, Rb, tb_) in zip(ta, tb):
        assert sa == sb
        # sharded and single-device residual passes reduce in different
        # orders; GN amplifies the fp noise to ~1e-3 per frame inside its
        # own noise floor (measured: <=1.3e-3 over this 5-frame run)
        assert np.abs(np.asarray(Ra) - np.asarray(Rb)).max() < 3e-3
        assert np.abs(np.asarray(ta_) - np.asarray(tb_)).max() < 3e-3

    # volume gate: same voxel set up to pose-noise boundary effects, dist
    # values allclose in the bulk
    da = _load_dump(os.path.join(res_a, "gradient_sdf_sdf_d.txt"))
    db = _load_dump(os.path.join(res_b, "gradient_sdf_sdf_d.txt"))
    common = sorted(set(da) & set(db))
    assert len(common) > 0.99 * max(len(da), len(db))
    diffs = np.abs(np.array([da[k] - db[k] for k in common]))
    assert np.median(diffs) < 2e-4
    assert np.quantile(diffs, 0.99) < 3e-3


def test_scan3d_devices_checkpoint_resume(qvga_dir, tmp_path):
    """Interrupt + resume on the mesh must equal the uninterrupted mesh run
    (the sharded analog of tests/test_checkpoint.py's equivalence gates;
    the checkpoint gathers the resident-sharded volume to host and the
    resume re-shards it via attach_mesh)."""
    res_full = str(tmp_path / "full")
    res_ck = str(tmp_path / "ck")
    base = ["--devices", "8", "--merged-step"]
    m_full = _run(qvga_dir, res_full, base)
    _run(qvga_dir, res_ck, base + ["--checkpoint-every", "1"], last=2)
    m_res = _run(qvga_dir, res_ck,
                 base + ["--resume", os.path.join(res_ck, "checkpoint.npz")])
    assert m_res["num_blocks_active"] == m_full["num_blocks_active"]
    ta = tumio.read_trajectory(os.path.join(res_full, "_poses.txt"))
    tb = tumio.read_trajectory(os.path.join(res_ck, "_poses.txt"))
    assert len(ta) == len(tb)
    for (sa, Ra, ta_), (sb, Rb, tb_) in zip(ta, tb):
        assert sa == sb
        np.testing.assert_allclose(np.asarray(Ra), np.asarray(Rb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ta_), np.asarray(tb_),
                                   atol=1e-5)
