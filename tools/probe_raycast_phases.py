"""TPU probe: from-scratch raycast phase budget + BA step timing.

Round-3 follow-ups:
  * Where do the 125 ms of the from-scratch render go? Sweep prior /
    burst / straggler / refinement knobs on the bench scene to locate the
    remaining headroom toward the 5 Mrays/s north star (VERDICT item 4).
  * PhotoBA step wall-clock at fr1/desk scale (F=30 keyframes, V~100k
    surface voxels) on the REAL chip (the scale test exists CPU-only —
    VERDICT item 7).

Run:  python tools/probe_raycast_phases.py        (on the TPU)
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

    def rc(label, **kw):
        f = jax.jit(lambda g, R, t: raycast.render_depth_normal(
            g, jnp.asarray(K), R, t, W, H, gcfg, fcfg, s_max=3.5, **kw))
        t_s = timeit(f, pose_args)
        d, n, h = f(*pose_args[1])
        print(f"{label}: {t_s*1e3:.1f} ms ({W*H/t_s/1e6:.2f} Mrays/s, "
              f"hits={int(jnp.sum(h))})", flush=True)
        return t_s

    t_base = rc("baseline (stride-4 prior, default schedule)")
    rc("no prior", prior_stride=0)
    rc("prior stride 8", prior_stride=8)
    rc("burst 20", burst_steps=20)
    rc("burst 8", burst_steps=8)
    rc("divisors (4,32)", compact_divisors=(4, 32))
    rc("divisors (8,32,128)", compact_divisors=(8, 32, 128))
    rc("burst 20 + divisors (16,128)", burst_steps=20,
       compact_divisors=(16, 128))

    # ---- BA step at fr1/desk scale on the chip ----------------------------
    from gradient_sdf_tpu.config import PhotoBAConfig
    from gradient_sdf_tpu.models import photo_ba

    F, V = 30, 100_000
    rng = np.random.default_rng(0)
    g = rng.standard_normal((V, 3)).astype(np.float32)
    problem = photo_ba.BAProblem(
        vox=jnp.asarray(rng.integers(-100, 100, (V, 3)).astype(np.int32)),
        grad=jnp.asarray(g / np.linalg.norm(g, axis=1, keepdims=True)),
        weight=jnp.asarray(np.abs(rng.standard_normal(V)).astype(np.float32))
        + 1.0,
        vmask=jnp.ones((V,), bool),
        vis=jnp.asarray(rng.random((V, F)) < 0.5),
        images=jnp.asarray(rng.random((F, H, W, 3)).astype(np.float32)),
        K=jnp.asarray(K),
    )
    state = photo_ba.BAState(
        dist=jnp.asarray(0.005 * rng.standard_normal(V).astype(np.float32)),
        R=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (F, 1, 1)),
        t=jnp.asarray(rng.standard_normal((F, 3)).astype(np.float32) * 0.01),
    )
    pcfg = PhotoBAConfig()

    step = jax.jit(lambda p, s: photo_ba.solve_dist(
        p, photo_ba.solve_pose(p, s, gcfg, pcfg), gcfg, pcfg))
    t0 = time.time()
    s1 = step(problem, state)
    jax.block_until_ready(s1.dist)
    print(f"BA step F={F} V={V}: compile+first {time.time()-t0:.1f}s",
          flush=True)
    tba = timeit(step, [(problem, state), (problem, s1)], iters=4)
    e_jit = jax.jit(lambda p, s: photo_ba.energy(p, s, gcfg))
    te = timeit(e_jit, [(problem, state), (problem, s1)], iters=4)
    print(f"BA step (solvePose+solveDist): {tba*1e3:.1f} ms; "
          f"energy: {te*1e3:.1f} ms  -> full iteration "
          f"(pose+E+dist+E, reference loop) ~ {(tba+2*te)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
