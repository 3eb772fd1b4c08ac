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


def _make_synth_dir(d, n=6, w=20, h=14):
    (d / "depth").mkdir(parents=True)
    (d / "rgb").mkdir()
    rng = np.random.RandomState(7)
    for i in range(n):
        depth = rng.randint(0, 65535, size=(h, w)).astype(np.uint16)
        rgb = rng.randint(0, 255, size=(h, w, 3)).astype(np.uint8)
        Image.fromarray(depth, mode="I;16").save(
            str(d / "depth" / f"{i + 1:03d}.png"))
        Image.fromarray(rgb).save(str(d / "rgb" / f"{i + 1:03d}.png"))


def test_prefetched_frames_identical_and_ordered(tmp_path):
    """The decode-ahead frames() path returns byte-identical frames, in
    order, vs direct synchronous decode of the same files."""
    from gradient_sdf_tpu import native

    d = tmp_path / "synth"
    _make_synth_dir(d, n=6)
    ld = loaders.make_loader("synth", str(d))
    frames = list(ld.frames())
    assert [f.index for f in frames] == list(range(6))
    assert [f.timestamp for f in frames] == [f"{i + 1:03d}" for i in range(6)]
    for f in frames:
        ref_c = loaders.load_color_png(str(d / "rgb" / f"{f.index + 1:03d}.png"))
        ref_d = loaders.load_depth_png(
            str(d / "depth" / f"{f.index + 1:03d}.png"), ld.unit)
        np.testing.assert_array_equal(f.color, ref_c)
        np.testing.assert_array_equal(f.depth, ref_d)
    # the native prefetcher must actually be in play when the lib is built
    if native.available():
        paths = [str(d / "depth" / f"{i + 1:03d}.png") for i in range(6)]
        reader = loaders._PrefetchReader(paths)
        assert reader._pf is not None
        reader.close()


def test_prefetcher_window_bounded_and_out_of_order(tmp_path):
    """A window-1 prefetcher still serves every frame (ordered consumption
    unblocks the stalled workers) and survives an out-of-order request."""
    from gradient_sdf_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    d = tmp_path / "synth"
    _make_synth_dir(d, n=5)
    paths = [str(d / "depth" / f"{i + 1:03d}.png") for i in range(5)]
    pf = native.Prefetcher(paths, n_threads=2, window=1)
    for i in range(5):
        arr = pf.get(i)
        assert arr is not None and arr.shape == (14, 20)
    pf.close()
    # out-of-order: jump straight to the last frame past the window
    pf = native.Prefetcher(paths, n_threads=2, window=1)
    assert pf.get(4) is not None
    assert pf.get(0) is not None
    pf.close()


def test_frames_range_respects_first_last(tmp_path):
    d = tmp_path / "synth"
    _make_synth_dir(d, n=6)
    ld = loaders.make_loader("synth", str(d))
    frames = list(ld.frames(2, 5))
    assert [f.index for f in frames] == [2, 3, 4]
