"""API-parity wrappers: RigidPointOptimizer class + loss enum."""

import numpy as np
import jax.numpy as jnp
import pytest

from gradient_sdf_tpu.config import PipelineConfig, GridConfig, FusionConfig
from gradient_sdf_tpu.models.rigid_optimizer import RigidPointOptimizer
from gradient_sdf_tpu.models.loss import LossFunction, weight
from gradient_sdf_tpu.models.grad_sdf import GradSdfMap
from gradient_sdf_tpu.data import synth
import dataclasses


def test_loss_weights():
    r = jnp.asarray([0.0, 0.5, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(weight(r, LossFunction.L2)), 1.0)
    h = np.asarray(weight(r, LossFunction.HUBER, scale=1.0))
    np.testing.assert_allclose(h, [1.0, 1.0, 1.0, 0.5])
    t = np.asarray(weight(r, LossFunction.TRUNC_L2, scale=1.0))
    np.testing.assert_allclose(t, [1.0, 1.0, 1.0, 0.0])
    tk = np.asarray(weight(r, LossFunction.TUKEY, scale=1.0))
    assert tk[3] == 0.0 and tk[0] == 1.0
    c = np.asarray(weight(r, LossFunction.CAUCHY, scale=1.0))
    np.testing.assert_allclose(c, 1.0 / (1.0 + np.asarray(r) ** 2))


def test_rigid_point_optimizer_wrapper():
    cfg = PipelineConfig(
        grid=GridConfig(voxel_size=0.02, num_blocks=2048),
    )
    W, H = 96, 72
    K = np.array([[79.0, 0, 47.5], [0, 79.0, 35.5], [0, 0, 1]], np.float32)
    # several spheres: a single sphere is rotation-symmetric, leaving the
    # tracker an unconstrained null space
    world = synth.SphereWorld(
        centers=jnp.asarray([[0.0, 0.0, 0.0], [0.32, 0.2, -0.1],
                             [-0.3, 0.05, 0.2]], jnp.float32),
        radii=jnp.asarray([0.25, 0.15, 0.12], jnp.float32),
    )
    poses = synth.orbit_poses(n=24, radius=1.2)
    m = GradSdfMap(cfg)
    for i in range(3):
        R, t = poses[i]
        depth = synth.render_depth(world, jnp.asarray(R), jnp.asarray(t), K, W, H)
        m.update(depth, K, (jnp.asarray(R), jnp.asarray(t)))

    opt = RigidPointOptimizer(m)
    R1, t1 = poses[1]
    opt.set_pose(R1, t1)
    depth = synth.render_depth(world, jnp.asarray(R1), jnp.asarray(t1), K, W, H)
    opt.optimize(depth, K)
    R_out, t_out = opt.pose()
    # starting at GT against a map containing this frame: stays close
    assert np.linalg.norm(np.asarray(t_out) - t1) < 0.05
    # setters exist and apply
    opt.set_num_iterations(3)
    assert opt.tcfg.num_iterations == 3
    opt.set_damping(0.5)
    assert opt.tcfg.damping == 0.5
