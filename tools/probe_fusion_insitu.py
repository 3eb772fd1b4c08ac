"""In-situ round-3 measurement: fusion accumulator layouts + dense track.

Times the REAL jitted pipeline (bench.py conditions: VGA, vs=1 cm,
trunc=5, the 6-frame sphere map) rather than micro-ops — micro probes on
the remote runtime get coalesced/elided (tools/probe_scatter_formulations
round-3 post-mortem). Compares:

  * fuse_frame with the round-2 layout (5 separate scatter-adds)
  * fuse_frame with acc_rows8 (ONE [N,8]-row scatter-add)
  * track_frame dense (sampling=1) and stride 2

Run:  python tools/probe_fusion_insitu.py          (on the TPU)
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


def timeit(fn, args_list, iters=10):
    out = [fn(*a) for a in args_list[:1]]
    jax.block_until_ready(out)
    ts = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from gradient_sdf_tpu.config import FusionConfig, GridConfig, TrackerConfig
    from gradient_sdf_tpu.data import synth
    from gradient_sdf_tpu.models import tracker
    from gradient_sdf_tpu.ops import fusion, normals
    from gradient_sdf_tpu.ops import voxel_grid as vg
    from gradient_sdf_tpu.utils import se3

    print("device:", jax.devices()[0], flush=True)
    W, H = 640, 480
    K = synth.KINECT_K
    fcfg = FusionConfig(trunc_voxels=5.0)
    fcfg8 = dataclasses.replace(fcfg, acc_rows8=True)

    world = synth.random_spheres(seed=3)
    poses = synth.orbit_poses(n=16, radius=2.0)
    cache = normals.build_cache(W, H, K, window=11)

    render_jit = jax.jit(lambda R, t: synth.render_depth(world, R, t, K, W, H))

    # scatter cost vs DESTINATION size: per-frame accumulators are sized by
    # grid CAPACITY; right-sizing capacity (growth machinery exists) may be
    # the whole ballgame (micro probe B''/A'': small dest 2-4x faster)
    grid = None
    gcfg = None
    for nb in (1024, 2048, 8192, 2**15):
        gcfg_i = GridConfig(voxel_size=0.01, num_blocks=nb)
        fuse_i = jax.jit(
            lambda g, d, R, t, _c=gcfg_i: fusion.fuse_frame(
                g, d, cache, R, t, _c, fcfg))
        fuse8_i = jax.jit(
            lambda g, d, R, t, _c=gcfg_i: fusion.fuse_frame(
                g, d, cache, R, t, _c, fcfg8))
        t0 = time.time()
        g_i = vg.create(gcfg_i)
        frames = []
        for i in range(6):
            R, t = (jnp.asarray(poses[i][0]), jnp.asarray(poses[i][1]))
            d = render_jit(R, t)
            frames.append((d, R, t))
            g_i = fuse_i(g_i, d, R, t)
        jax.block_until_ready(g_i.dist)
        args = [(g_i, d, R, t) for d, R, t in frames[2:6]]
        t5 = timeit(fuse_i, args, iters=12)
        t8 = timeit(fuse8_i, args, iters=12)
        print(f"capacity {nb:6d} blocks ({int(g_i.num_active)} active, "
              f"overflow={bool(g_i.overflow)}): fuse 5-scatter {t5*1e3:.1f} ms"
              f", rows8 {t8*1e3:.1f} ms "
              f"(built in {time.time()-t0:.0f}s)", flush=True)
        if nb == 2048:
            a = fuse_i(*args[0])
            b = fuse8_i(*args[0])
            print(f"  equality @2048: |d|max="
                  f"{float(jnp.max(jnp.abs(a.dist-b.dist))):.2e} |w|max="
                  f"{float(jnp.max(jnp.abs(a.weight-b.weight))):.2e}",
                  flush=True)
            grid, gcfg = g_i, gcfg_i  # tracker timings at the small capacity
    frames = frames[:]

    # dense + strided tracking
    xi = jnp.asarray([0.01, -0.01, 0.015, 0.008, -0.01, 0.006], jnp.float32)
    dR, dt = se3.se3_exp(xi)
    targs = []
    for d, R, t in frames[2:6]:
        R0, t0p = se3.se3_mul(dR, dt, R, t)
        targs.append((grid, d, R0, t0p))
    for s in (1, 2):
        for packed in (False, True):
            track_jit = jax.jit(
                lambda g, d, R, t, _s=s, _p=packed: tracker.track_frame(
                    g, d, jnp.asarray(K), R, t, gcfg, fcfg,
                    TrackerConfig(sampling=_s, packed_row_gather=_p)))
            ts = timeit(track_jit, targs, iters=8)
            print(f"track sampling={s} packed={packed}: {ts*1e3:.1f} ms",
                  flush=True)
    # pose equality packed vs not (dense)
    ta = tracker.track_frame(*targs[0][:2], jnp.asarray(K), *targs[0][2:],
                             gcfg, fcfg, TrackerConfig(sampling=1))
    tb = tracker.track_frame(*targs[0][:2], jnp.asarray(K), *targs[0][2:],
                             gcfg, fcfg,
                             TrackerConfig(sampling=1, packed_row_gather=True))
    print("packed pose delta:",
          float(jnp.max(jnp.abs(ta.t - tb.t))),
          float(jnp.max(jnp.abs(ta.R - tb.R))), flush=True)


if __name__ == "__main__":
    main()
