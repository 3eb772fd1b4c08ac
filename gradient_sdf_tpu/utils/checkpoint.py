"""Checkpoint / resume for the sparse SDF volume and trajectory.

The reference has no mid-run checkpointing — persistence is end-of-run only
(SURVEY.md §5.4). Here the whole reconstruction state (block-sparse grid,
visibility bitfield, frame counter, poses so far) serializes to a single
compressed npz, enabling `--resume` in Scan3D and crash recovery in long
runs. Format is plain numpy: no framework lock-in, loadable for offline
analysis, and doubles as the `allclose` parity artifact against the C++
dumps.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import GridConfig
from ..ops import voxel_grid as vg


FORMAT_VERSION = 2  # v2 adds the GridConfig geometry (dir_dim may have grown)


def save_state(path: str, grid: vg.VoxelGrid, *, vis=None, counter: int = 0,
               poses=None, grid_cfg: Optional[GridConfig] = None,
               extra: Optional[dict] = None):
    """poses: list of (timestamp, R [3,3], t [3]). `grid_cfg` persists the
    grid geometry — mandatory for runs where capacity or directory growth
    fired (stale dir_dim mis-linearizes every key on resume)."""
    data = {
        "format_version": FORMAT_VERSION,
        "counter": counter,
        "directory": np.asarray(grid.directory),
        "coarse_occ": np.asarray(grid.coarse_occ),
        "num_active": np.asarray(grid.num_active),
        "overflow": np.asarray(grid.overflow),
        "oob_samples": np.asarray(grid.oob_samples),
        "block_coords": np.asarray(grid.block_coords),
        "dist": np.asarray(grid.dist),
        "weight": np.asarray(grid.weight),
        "grad_x": np.asarray(grid.grad_x),
        "grad_y": np.asarray(grid.grad_y),
        "grad_z": np.asarray(grid.grad_z),
    }
    if grid_cfg is not None:
        data["gcfg"] = np.asarray([
            grid_cfg.block_shape, grid_cfg.num_blocks, grid_cfg.dir_dim
        ], np.int64)
        data["gcfg_voxel_size"] = np.float64(grid_cfg.voxel_size)
    if vis is not None:
        data["vis"] = np.asarray(vis)
    if poses:
        data["pose_stamps"] = np.asarray([p[0] for p in poses])
        data["pose_R"] = np.stack([np.asarray(p[1]) for p in poses])
        data["pose_t"] = np.stack([np.asarray(p[2]) for p in poses])
    if extra:
        for k, v in extra.items():
            data["extra_" + k] = v
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **data)
    os.replace(tmp, path)


def load_state(path: str):
    """Returns dict with grid, vis (or None), counter, poses (list)."""
    z = np.load(path, allow_pickle=False)
    grid = vg.VoxelGrid(
        directory=jnp.asarray(z["directory"]),
        coarse_occ=jnp.asarray(z["coarse_occ"]),
        num_active=jnp.asarray(z["num_active"]),
        overflow=jnp.asarray(z["overflow"]),
        oob_samples=jnp.asarray(z["oob_samples"])
        if "oob_samples" in z else jnp.zeros((), jnp.int32),
        block_coords=jnp.asarray(z["block_coords"]),
        dist=jnp.asarray(z["dist"]),
        weight=jnp.asarray(z["weight"]),
        grad_x=jnp.asarray(z["grad_x"]),
        grad_y=jnp.asarray(z["grad_y"]),
        grad_z=jnp.asarray(z["grad_z"]),
    )
    vis = jnp.asarray(z["vis"]) if "vis" in z else None
    grid_cfg = None
    if "gcfg" in z:
        bs, nb, dd = (int(v) for v in z["gcfg"])
        grid_cfg = GridConfig(
            voxel_size=float(z["gcfg_voxel_size"]),
            block_shape=bs, num_blocks=nb, dir_dim=dd,
        )
    else:
        # legacy checkpoint: recover geometry from array shapes; voxel_size
        # was not recorded (NaN -> caller supplies it, e.g. from the CLI)
        dd = round(len(z["directory"]) ** (1.0 / 3.0))
        grid_cfg = GridConfig(
            voxel_size=float("nan"),
            block_shape=round(z["dist"].shape[1] ** (1.0 / 3.0)),
            num_blocks=z["dist"].shape[0],
            dir_dim=dd,
        )
    poses = []
    if "pose_stamps" in z:
        for ts, R, t in zip(z["pose_stamps"], z["pose_R"], z["pose_t"]):
            poses.append((str(ts), R, t))
    return {
        "grid": grid,
        "vis": vis,
        "counter": int(z["counter"]),
        "poses": poses,
        "grid_cfg": grid_cfg,
    }
