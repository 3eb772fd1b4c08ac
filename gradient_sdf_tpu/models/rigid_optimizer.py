"""Class-style rigid optimizer wrappers (reference API parity).

`RigidOptimizer` mirrors the reference base (`sdf_tracker/RigidOptimizer.h:
51-112`: iteration/threshold/damping settings + current pose);
`RigidPointOptimizer` mirrors `RigidPointOptimizer.h:49-74` with
`optimize(depth, K)` / `optimize_sampled(depth, K, sampling)` driving the
jitted functional tracker (models/tracker.py). Users porting from the C++
API can keep their call sites; new code can use `tracker.track_frame`
directly.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import TrackerConfig
from . import tracker as tracker_mod


class RigidOptimizer:
    def __init__(self, sdf_map, num_iterations=25, conv_threshold=1e-3,
                 damping=1.0):
        self.sdf_map = sdf_map  # GradSdfMap or PixelSdfMap
        self.tcfg = TrackerConfig(
            num_iterations=num_iterations,
            conv_threshold=conv_threshold,
            damping=damping,
        )
        self.R = jnp.eye(3, dtype=jnp.float32)
        self.t = jnp.zeros(3, dtype=jnp.float32)
        self.last_result = None

    # setters matching the reference (:90-103)
    def set_num_iterations(self, n):
        self.tcfg = dataclasses.replace(self.tcfg, num_iterations=n)

    def set_conv_threshold(self, thr):
        self.tcfg = dataclasses.replace(self.tcfg, conv_threshold=thr)

    def set_damping(self, d):
        self.tcfg = dataclasses.replace(self.tcfg, damping=d)

    def set_pose(self, R, t):
        self.R = jnp.asarray(R, jnp.float32)
        self.t = jnp.asarray(t, jnp.float32)

    def pose(self):
        return self.R, self.t


class RigidPointOptimizer(RigidOptimizer):
    def optimize(self, depth, K) -> bool:
        return self.optimize_sampled(depth, K, 1)

    def optimize_sampled(self, depth, K, sampling: int) -> bool:
        from .pixel_sdf import PixelSdfMap

        mode = "trilinear" if isinstance(self.sdf_map, PixelSdfMap) else "grad"
        tcfg = dataclasses.replace(self.tcfg, sampling=sampling)
        res = tracker_mod.track_frame(
            self.sdf_map.grid, jnp.asarray(depth, jnp.float32),
            jnp.asarray(K, jnp.float32), self.R, self.t,
            self.sdf_map.cfg.grid, self.sdf_map.cfg.fusion, tcfg, mode=mode,
        )
        self.R, self.t = res.R, res.t
        self.last_result = res
        return bool(res.converged)
