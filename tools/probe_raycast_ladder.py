"""TPU probe: verify the capacity-ladder straggler round (new default
divisor 64 with {n/64, n/8, full} lax.switch ladder) — timing + hit/depth
identity vs the former fixed (8,) schedule, from-scratch AND incremental
(depth-prior) renders. Run on the TPU."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_raycast_straggler import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    def rc(label, ref=None, **kw):
        f = jax.jit(lambda g, R, t: raycast.render_depth_normal(
            g, jnp.asarray(K), R, t, W, H, gcfg, fcfg, s_max=3.5, **kw))
        t_s = timeit(f, pose_args)
        d, n, h = f(*pose_args[1])
        dn = np.asarray(d)
        ident = ""
        if ref is not None:
            nd = int(np.sum(dn != ref))
            ident = ", bit-identical" if nd == 0 else f", {nd} px differ"
        print(f"{label}: {t_s*1e3:.1f} ms ({W*H/t_s/1e6:.2f} Mrays/s, "
              f"hits={int(jnp.sum(h))}{ident})", flush=True)
        return dn

    d_old = rc("former default (8,) fixed", compact_divisors=(8,))
    rc("new default (64,) ladder", ref=d_old)

    # incremental render: prior = previous pose's rendered depth
    f0 = jax.jit(lambda g, R, t: raycast.render_depth_normal(
        g, jnp.asarray(K), R, t, W, H, gcfg, fcfg, s_max=3.5))
    dp, _, _ = f0(*pose_args[0])

    def rci(label, **kw):
        f = jax.jit(lambda g, R, t, p: raycast.render_depth_normal(
            g, jnp.asarray(K), R, t, W, H, gcfg, fcfg, s_max=3.5,
            depth_prior=p, depth_prior_holes="skip",
            prior_margin_voxels=4.0, **kw))
        args = [(g, R, t, dp) for (g, R, t) in pose_args]
        t_s = timeit(f, args)
        d, n, h = f(*args[1])
        print(f"{label}: {t_s*1e3:.1f} ms ({W*H/t_s/1e6:.2f} Mrays/s, "
              f"hits={int(jnp.sum(h))})", flush=True)

    rci("incremental (burst-only, ladder burst)")


if __name__ == "__main__":
    main()
