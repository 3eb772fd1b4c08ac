"""Dataset loader layout tests on tiny generated fixtures."""

import os

import numpy as np
import pytest
from PIL import Image

from gradient_sdf_tpu.data import loaders


def _write_depth(path, shape=(12, 16), value=1234):
    arr = np.full(shape, value, np.uint16)
    Image.fromarray(arr, mode="I;16").save(path)


def _write_rgb(path, shape=(12, 16), value=100):
    arr = np.full(shape + (3,), value, np.uint8)
    Image.fromarray(arr).save(path)


def test_tum_loader(tmp_path):
    d = tmp_path / "tum"
    (d / "depth").mkdir(parents=True)
    (d / "rgb").mkdir()
    for i in range(3):
        _write_depth(str(d / "depth" / f"{i}.png"))
        _write_rgb(str(d / "rgb" / f"{i}.png"))
    with open(d / "associated.txt", "w") as f:
        f.write("# comment line\n")
        for i in range(3):
            f.write(f"10.{i} rgb/{i}.png 10.{i}5 depth/{i}.png\n")
    np.savetxt(d / "intrinsics.txt", np.eye(3))

    ld = loaders.make_loader("tum", str(d))
    assert len(ld) == 3
    frames = list(ld.frames())
    assert len(frames) == 3
    # TUM depth unit is 1/5000
    np.testing.assert_allclose(frames[0].depth, 1234 / 5000.0, rtol=1e-6)
    assert frames[0].color.shape == (12, 16, 3)
    assert frames[0].timestamp == "10.0"
    assert ld.load_intrinsics() is not None


def test_redwood_loader(tmp_path):
    d = tmp_path / "rw"
    (d / "depth").mkdir(parents=True)
    (d / "rgb").mkdir()
    for i in range(2):
        _write_depth(str(d / "depth" / f"00{i}.png"))
        _write_rgb(str(d / "rgb" / f"00{i}.jpg"))
    ld = loaders.make_loader("rw", str(d))
    frames = list(ld.frames())
    assert len(frames) == 2
    # Redwood unit 1/1000
    np.testing.assert_allclose(frames[0].depth, 1.234, rtol=1e-3)
    assert frames[0].timestamp == "000"


def test_printed3d_loader(tmp_path):
    d = tmp_path / "p3d"
    d.mkdir()
    for i in range(2):
        _write_depth(str(d / f"depth_{i:06d}.png"))
        _write_rgb(str(d / f"color_{i:06d}.png"))
    ld = loaders.make_loader("printed", str(d))
    frames = list(ld.frames())
    assert len(frames) == 2
    np.testing.assert_allclose(frames[1].depth, 1.234, rtol=1e-3)


def test_synth_loader_keyframe_albedo(tmp_path):
    d = tmp_path / "sy"
    for sub in ("depth", "rgb", "albedo"):
        (d / sub).mkdir(parents=True)
    _write_depth(str(d / "depth" / "001.png"))
    _write_rgb(str(d / "rgb" / "001.png"), value=50)
    _write_rgb(str(d / "albedo" / "001.png"), value=200)
    ld = loaders.make_loader("synth", str(d))
    frames = list(ld.frames())
    assert len(frames) == 1
    kf = ld.load_keyframe(0)
    assert kf is not None
    # keyframe color comes from albedo/ (SynthLoader.h:86-107)
    np.testing.assert_allclose(kf.color, 200 / 255.0, rtol=1e-6)
    np.testing.assert_allclose(frames[0].color, 50 / 255.0, rtol=1e-6)
