"""In-situ measurement on the GOLDEN-PROTOCOL scene (round 3).

The reference CPU baseline (17.0 fps non-OMP / 18.66 OMP,
parity/last_report.json) is measured on: 640x480 synthetic spheres,
6 frames over a 4-degree arc (0.8 deg/frame), vs=2 cm, trunc=5, DENSE
consecutive-frame tracking + full fusion. This probe times OUR pipeline
under the identical protocol, sweeping the round-3 formulation knobs:

  * fusion: fields (5 XLA scatters) vs acc_pallas (one lane-packed
    Pallas row-RMW pass) at a right-sized 1024-block capacity
  * tracking: consecutive-frame (track frame i from pose i-1, the
    protocol both the reference binary and real Scan3D run) with
    packed_row_gather on/off, dense and stride 2

Run:  python tools/probe_protocol_insitu.py        (on the TPU)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args_list, iters=12):
    out = [fn(*a) for a in args_list[:1]]
    jax.block_until_ready(out)
    ts = []
    t0 = time.perf_counter()
    for i in range(iters):
        a = args_list[i % len(args_list)]
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from gradient_sdf_tpu.config import FusionConfig, GridConfig, TrackerConfig
    from gradient_sdf_tpu.data import synth
    from gradient_sdf_tpu.models import tracker
    from gradient_sdf_tpu.ops import fusion, normals
    from gradient_sdf_tpu.ops import voxel_grid as vg

    print("device:", jax.devices()[0], flush=True)
    W, H = 640, 480
    K = synth.KINECT_K
    gcfg = GridConfig(voxel_size=0.02, num_blocks=1024)
    fcfg = FusionConfig(trunc_voxels=5.0)
    fcfg_p = dataclasses.replace(fcfg, acc_pallas=True)
    assert fusion.acc_mode(gcfg, fcfg_p) == "pallas"

    world = synth.random_spheres(seed=2)  # golden-protocol seed
    poses = synth.orbit_poses(n=6, radius=2.0, arc=np.deg2rad(4.0))
    cache = normals.build_cache(W, H, K, window=11)

    render_jit = jax.jit(lambda R, t: synth.render_depth(world, R, t, K, W, H))
    fuse_jit = jax.jit(
        lambda g, d, R, t: fusion.fuse_frame(g, d, cache, R, t, gcfg, fcfg))
    fusep_jit = jax.jit(
        lambda g, d, R, t: fusion.fuse_frame(g, d, cache, R, t, gcfg, fcfg_p))

    t0 = time.time()
    grid = vg.create(gcfg)
    frames = []
    for i in range(6):
        R, t = (jnp.asarray(poses[i][0]), jnp.asarray(poses[i][1]))
        d = render_jit(R, t)
        frames.append((d, R, t))
        grid = fuse_jit(grid, d, R, t)
    jax.block_until_ready(grid.dist)
    print(f"map built ({time.time()-t0:.0f}s), "
          f"{int(grid.num_active)}/{gcfg.num_blocks} blocks, "
          f"overflow={bool(grid.overflow)}", flush=True)

    args = [(grid, d, R, t) for d, R, t in frames[2:6]]
    tf = timeit(fuse_jit, args)
    print(f"fuse fields: {tf*1e3:.1f} ms", flush=True)
    tp = timeit(fusep_jit, args)
    print(f"fuse pallas: {tp*1e3:.1f} ms", flush=True)
    a = fuse_jit(*args[0])
    b = fusep_jit(*args[0])
    print(f"equality: |d|max={float(jnp.max(jnp.abs(a.dist-b.dist))):.2e} "
          f"|w|max={float(jnp.max(jnp.abs(a.weight-b.weight))):.2e}",
          flush=True)

    # consecutive-frame tracking: frame i's depth from pose i-1 (what the
    # reference binary's 25.8 ms median measures)
    targs = []
    for i in range(1, 6):
        d, R, t = frames[i]
        _, Rp, tp_ = frames[i - 1]
        targs.append((grid, d, Rp, tp_))
    for s in (1, 2):
        for packed in (False, True):
            tcfg = TrackerConfig(sampling=s, packed_row_gather=packed)
            track_jit = jax.jit(
                lambda g, d, R, t, _c=tcfg: tracker.track_frame(
                    g, d, jnp.asarray(K), R, t, gcfg, fcfg, _c))
            ts = timeit(track_jit, targs, iters=10)
            res = track_jit(*targs[2])
            print(f"track s={s} packed={packed}: {ts*1e3:.1f} ms "
                  f"(iters={int(res.num_iters)}, conv={bool(res.converged)}, "
                  f"valid={int(res.num_valid)})", flush=True)


if __name__ == "__main__":
    main()
