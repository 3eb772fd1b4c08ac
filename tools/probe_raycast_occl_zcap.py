"""TPU probe: occlusion z-cap effect on from-scratch raycast (bench protocol)."""
import time, numpy as np, jax, jax.numpy as jnp
from gradient_sdf_tpu.config import GridConfig, FusionConfig
from gradient_sdf_tpu.data import synth
from gradient_sdf_tpu.ops import fusion, normals, raycast, voxel_grid as vg

print("devices:", jax.devices(), flush=True)
W, H = 640, 480
K = synth.KINECT_K
fcfg = FusionConfig(trunc_voxels=5.0)
cache = normals.build_cache(W, H, K, window=5)
gcfg_rc = GridConfig(voxel_size=0.01, num_blocks=2**15)
world_rc = synth.random_spheres(seed=3)
poses_rc = synth.orbit_poses(n=16, radius=2.0)
fuse_rc = jax.jit(lambda g, d, R, t: fusion.fuse_frame(g, d, cache, R, t, gcfg_rc, fcfg))
render_rc = jax.jit(lambda R, t: synth.render_depth(world_rc, R, t, K, W, H))
grid_rc = vg.create(gcfg_rc)
t0 = time.time()
for i in range(6):
    R, t = (jnp.asarray(poses_rc[i][0]), jnp.asarray(poses_rc[i][1]))
    grid_rc = fuse_rc(grid_rc, render_rc(R, t), R, t)
jax.block_until_ready(grid_rc.dist)
print(f"scene built {time.time()-t0:.0f}s, active={int(grid_rc.num_active)}", flush=True)
R4, t4 = (jnp.asarray(poses_rc[4][0]), jnp.asarray(poses_rc[4][1]))

def timeit(fn, args, iters=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time(); jax.block_until_ready(fn(*args)); ts.append(time.time()-t0)
    return min(ts)

variants = {
    "baseline": {},
    "occl_zcap": {"prior_occlusion_zcap": True},
}
outs = {}
for name, kw in variants.items():
    f = jax.jit(lambda g, R, t, _kw=kw: raycast.render_depth_normal(
        g, jnp.asarray(K), R, t, W, H, gcfg_rc, fcfg, s_max=3.5, **_kw))
    t0 = time.time()
    s = timeit(f, (grid_rc, R4, t4))
    outs[name] = f(grid_rc, R4, t4)
    print(f"{name}: {s*1e3:.1f} ms = {W*H/s/1e6:.2f} Mrays/s (compile+time {time.time()-t0:.0f}s)", flush=True)
d0, d1 = outs["baseline"][0], outs["occl_zcap"][0]
print("bit-identical:", bool(jnp.array_equal(d0, d1)),
      "max|d|:", float(jnp.max(jnp.abs(d0 - d1))),
      "hits:", int(jnp.sum(outs["baseline"][2])), int(jnp.sum(outs["occl_zcap"][2])), flush=True)
