"""TPU probe: extension of probe_raycast_straggler — narrower single
straggler rounds (the first sweep was monotone down to n/20) plus a
narrow two-round schedule. Run on the TPU."""

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
    rc("(24,)", compact_divisors=(24,))
    rc("(32,)", compact_divisors=(32,))
    rc("(48,)", compact_divisors=(48,))
    rc("(64,)", compact_divisors=(64,))
    rc("(20, 64)", compact_divisors=(20, 64))
    rc("(20,) again", compact_divisors=(20,))


if __name__ == "__main__":
    main()
