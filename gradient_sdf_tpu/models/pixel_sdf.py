"""PixelSdfMap: classical trilinear TSDF baseline (`--scan-type base-sdf`).

Mirrors `MapPixelSdf` (`cpp/include/sdf_tracker/MapPixelSdf.{h,cpp}`): same
fusion gating and dist/weight updates as the gradient map but no stored
gradient; queries use 8-corner trilinear interpolation with the analytic
trilinear gradient (`MapPixelSdf.cpp:43-111`). We implement the update
transform correctly — the reference's non-OMP `update` double-applies the
pose (`MapPixelSdf.cpp:160` pre-adds `t` and scales by z before reusing the
vector as a ray direction at :171); its OMP variant has the right math,
which is what we match.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..ops import fusion, normals, query
from ..ops import voxel_grid as vg


class PixelSdfMap:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.grid = vg.create(cfg.grid)
        self.counter = 0
        self.growth_events: list = []  # see GradSdfMap.growth_events
        self.cache: Optional[normals.NormalEstimatorCache] = None
        self._fuse_jit = None

    def ensure_cache(self, K: np.ndarray, width: int, height: int):
        if self.cache is None:
            self.cache = normals.build_cache(
                width, height, K, self.cfg.fusion.normal_window
            )

    def setup(self, depth, K, pose=None):
        R = jnp.eye(3, dtype=jnp.float32)
        t = jnp.zeros(3, dtype=jnp.float32)
        if pose is not None:
            R, t = pose
        self.update(depth, K, (R, t))

    def update(self, depth, K, pose):
        depth = jnp.asarray(depth, jnp.float32)
        H, W = depth.shape
        self.ensure_cache(np.asarray(K), W, H)
        R, t = pose
        if self._fuse_jit is None:
            gcfg, fcfg = self.cfg.grid, self.cfg.fusion

            @jax.jit
            def _fuse(grid, depth, R, t):
                return fusion.fuse_frame(
                    grid, depth, self.cache, R, t, gcfg, fcfg,
                    accumulate_gradients=False,
                )

            self._fuse_jit = _fuse
        self.grid = self._fuse_jit(
            self.grid, depth, jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
        )
        self.counter += 1
        if bool(self.grid.overflow):
            self._grow()
        if int(self.grid.oob_samples) > 0:
            self._grow_directory()

    def _grow(self):
        """Episodic host-side capacity growth (vg.grow); same contract as
        GradSdfMap._grow (the merged scan3d step calls either)."""
        import dataclasses

        self.grid, new_gcfg = vg.grow(self.grid, self.cfg.grid)
        self.cfg = dataclasses.replace(self.cfg, grid=new_gcfg)
        self._fuse_jit = None
        from ..utils.logging_util import get_logger

        get_logger().warning("Grid grown to %d blocks",
                             new_gcfg.num_blocks)
        self.growth_events.append(
            {"frame": self.counter, "kind": "capacity",
             "num_blocks": int(new_gcfg.num_blocks)}
        )

    def _grow_directory(self):
        import dataclasses

        lost = int(self.grid.oob_samples)
        self.grid, new_gcfg, grew = vg.handle_oob_growth(
            self.grid, self.cfg.grid)
        self.growth_events.append(
            {"frame": self.counter, "kind": "world_range",
             "dir_dim": int(new_gcfg.dir_dim), "oob_samples": lost,
             "grew": grew}
        )
        if grew:
            self.cfg = dataclasses.replace(self.cfg, grid=new_gcfg)
            self._fuse_jit = None

    def tsdf(self, points):
        phi, grad, _ = query.tsdf_trilinear(
            self.grid, jnp.asarray(points, jnp.float32), self.cfg.grid, self.cfg.fusion
        )
        return phi, grad

    def weights(self, points):
        return query.weights_trilinear(
            self.grid, jnp.asarray(points, jnp.float32), self.cfg.grid
        )

    def extract_mesh(self, filename: str) -> bool:
        from ..ops import marching_cubes as mc
        from ..utils.ply import save_mesh_ply

        verts, faces = mc.extract_mesh(self.grid, self.cfg.grid)
        return save_mesh_ply(filename, verts, faces)

    def save_sdf(self, filename: str) -> bool:
        """Sparse dist/weight text dump (subset of the gradient map's)."""
        na = int(self.grid.num_active)
        gcfg = self.cfg.grid
        vox = np.asarray(
            vg.block_local_to_voxel(self.grid.block_coords[:na], gcfg)
        ).reshape(-1, 3)
        dist = np.asarray(self.grid.dist[:na]).reshape(-1)
        weight = np.asarray(self.grid.weight[:na]).reshape(-1)
        occ = weight > 0
        vox, dist, weight = vox[occ], dist[occ], weight[occ]
        if vox.size == 0:
            return False
        vmin, vmax = vox.min(0), vox.max(0)
        dim = vmax - vmin + 1
        lin = (
            dim[0] * dim[1] * (vox[:, 2] - vmin[2])
            + dim[0] * (vox[:, 1] - vmin[1])
            + (vox[:, 0] - vmin[0])
        )
        with open(filename + "_grid_info.txt", "w") as f:
            f.write(f"voxel size: {gcfg.voxel_size}\n")
            f.write(f"voxel dim: {dim[0]} {dim[1]} {dim[2]}\n")
            f.write(f"voxel min: {vmin[0]} {vmin[1]} {vmin[2]}\n")
            f.write(f"voxel max: {vmax[0]} {vmax[1]} {vmax[2]}\n")
        for suffix, vals in [("_sdf_d.txt", dist), ("_sdf_weight.txt", weight)]:
            with open(filename + suffix, "w") as f:
                for li, v in zip(lin, vals):
                    f.write(f"{li} {v}\n")
        return True
