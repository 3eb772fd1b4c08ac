"""TPU probe: straggler-round capacity sweep for the from-scratch render.

Round-4 follow-up to the schedule re-tune (PERF_NOTES): with a single
straggler round, per-step cost is the round's FIXED lane width (n/div),
not the live ray count — the while_loop early-exits in steps, not lanes.
If the post-burst survivor count is well under n/8, halving the capacity
halves the straggler cost; an overflow falls back to a full-width march
(lax.cond), which the timing exposes immediately (~4x blowup).

Sweeps div in {8 (baseline), 10, 12, 16, 20} and burst {12, 14, 16} at
the promising caps, and reports bit-identity of the depth image vs the
baseline schedule (changed tail brackets show up as mismatched pixels).

Run:  python tools/probe_raycast_straggler.py        (on the TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args_list, iters=6):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from gradient_sdf_tpu.config import FusionConfig, GridConfig
    from gradient_sdf_tpu.data import synth
    from gradient_sdf_tpu.ops import fusion, normals, raycast
    from gradient_sdf_tpu.ops import voxel_grid as vg

    print("device:", jax.devices()[0], flush=True)
    W, H = 640, 480
    K = synth.KINECT_K
    gcfg = GridConfig(voxel_size=0.01, num_blocks=2**15)
    fcfg = FusionConfig(trunc_voxels=5.0)
    world = synth.random_spheres(seed=3)
    poses = synth.orbit_poses(n=16, radius=2.0)
    cache = normals.build_cache(W, H, K, window=11)

    render_jit = jax.jit(lambda R, t: synth.render_depth(world, R, t, K, W, H))
    fuse_jit = jax.jit(
        lambda g, d, R, t: fusion.fuse_frame(g, d, cache, R, t, gcfg, fcfg))
    grid = vg.create(gcfg)
    for i in range(6):
        R, t = (jnp.asarray(poses[i][0]), jnp.asarray(poses[i][1]))
        grid = fuse_jit(grid, render_jit(R, t), R, t)
    jax.block_until_ready(grid.dist)
    print(f"map: {int(grid.num_active)} blocks", flush=True)

    pose_args = [(grid, jnp.asarray(poses[i][0]), jnp.asarray(poses[i][1]))
                 for i in (3, 4, 5)]

    ref_depth = {}

    def rc(label, **kw):
        f = jax.jit(lambda g, R, t: raycast.render_depth_normal(
            g, jnp.asarray(K), R, t, W, H, gcfg, fcfg, s_max=3.5, **kw))
        t_s = timeit(f, pose_args)
        d, n, h = f(*pose_args[1])
        dn = np.asarray(d)
        if not ref_depth:
            ref_depth["d"] = dn
            ident = "baseline"
        else:
            ndiff = int(np.sum(dn != ref_depth["d"]))
            ident = "bit-identical" if ndiff == 0 else f"{ndiff} px differ"
        print(f"{label}: {t_s*1e3:.1f} ms ({W*H/t_s/1e6:.2f} Mrays/s, "
              f"hits={int(jnp.sum(h))}, {ident})", flush=True)
        return t_s

    rc("baseline burst 12 + (8,)")
    rc("(10,)", compact_divisors=(10,))
    rc("(12,)", compact_divisors=(12,))
    rc("(16,)", compact_divisors=(16,))
    rc("(20,)", compact_divisors=(20,))
    rc("burst 14 + (16,)", burst_steps=14, compact_divisors=(16,))
    rc("burst 16 + (16,)", burst_steps=16, compact_divisors=(16,))
    rc("burst 16 + (20,)", burst_steps=16, compact_divisors=(20,))


if __name__ == "__main__":
    main()
