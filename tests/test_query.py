import numpy as np
import jax.numpy as jnp

from gradient_sdf_tpu.config import GridConfig, FusionConfig
from gradient_sdf_tpu.ops import voxel_grid as vg
from gradient_sdf_tpu.ops import query

GCFG = GridConfig(voxel_size=0.05, num_blocks=256)
FCFG = FusionConfig(trunc_voxels=5.0)


def _grid_with(vox, dist, weight, grad=None):
    grid = vg.create(GCFG)
    vox = np.asarray(vox, np.int32)
    grid = vg.ensure_blocks(grid, jnp.asarray(vox), jnp.ones(len(vox), bool),
                            GCFG)
    lin, present = vg.lookup_voxels(grid, jnp.asarray(vox), GCFG)
    assert np.all(np.asarray(present))
    lin = np.asarray(lin)
    d = np.array(vg.flat_field(grid.dist))
    w = np.array(vg.flat_field(grid.weight))
    g = np.array(vg.flat_field(grid.grad))
    d[lin] = dist
    w[lin] = weight
    if grad is not None:
        g[lin] = grad
    g = g.reshape(grid.grad_x.shape + (3,))
    return grid._replace(
        dist=jnp.asarray(d).reshape(grid.dist.shape),
        weight=jnp.asarray(w).reshape(grid.weight.shape),
        grad_x=jnp.asarray(g[..., 0]),
        grad_y=jnp.asarray(g[..., 1]),
        grad_z=jnp.asarray(g[..., 2]),
    )


def test_semi_implicit_query_formula():
    """phi(p) = dist + 1.2 * ghat . (voxel_center - p) (MapGradPixelSdf.h:109-115)."""
    vox = [[2, 3, 4]]
    grad = np.array([[0.0, 0.0, 2.0]])  # unnormalized; ghat = +z
    grid = _grid_with(vox, [0.01], [7.0], grad)
    center = np.array([2, 3, 4]) * GCFG.voxel_size
    p = center + np.array([0.0, 0.0, 0.012])  # stay in the same voxel
    phi, g, w = query.tsdf_grad(grid, jnp.asarray(p, jnp.float32), GCFG, FCFG)
    expected = 0.01 + 1.2 * (center[2] - p[2])
    assert abs(float(phi) - expected) < 1e-6
    np.testing.assert_allclose(np.asarray(g), [0, 0, 1.2], atol=1e-6)
    assert float(w) == 7.0


def test_query_missing_voxel():
    grid = _grid_with([[0, 0, 0]], [0.0], [1.0])
    p = jnp.asarray([10.0, 10.0, 10.0])
    phi, g, w = query.tsdf_grad(grid, p, GCFG, FCFG)
    assert float(w) == 0.0
    assert float(phi) == 0.0
    w2 = query.weights_at(grid, p, GCFG)
    assert float(w2) == 0.0


def test_trilinear_interpolation_matches_oracle():
    """8-corner cell with linear field: interpolation must be exact."""
    corners = [[i, j, k] for i in range(2) for j in range(2) for k in range(2)]
    # linear field f(x,y,z) = 2x + 3y - z (in voxel units)
    dist = np.array([2 * c[0] + 3 * c[1] - c[2] for c in corners], np.float32)
    dist *= GCFG.voxel_size
    grid = _grid_with(corners, dist, np.ones(8))
    p = jnp.asarray([0.3, 0.6, 0.2]) * GCFG.voxel_size
    phi, grad, valid = query.tsdf_trilinear(grid, p.astype(jnp.float32), GCFG, FCFG)
    expected = (2 * 0.3 + 3 * 0.6 - 0.2) * GCFG.voxel_size
    assert bool(valid)
    assert abs(float(phi) - expected) < 1e-6
    np.testing.assert_allclose(np.asarray(grad), [2.0, 3.0, -1.0], atol=1e-4)


def test_trilinear_partial_and_missing():
    grid = _grid_with([[0, 0, 0]], [0.01], [1.0])
    T = FCFG.trunc_voxels * GCFG.voxel_size
    # point whose 8 corners are partially present -> 0, invalid
    p = jnp.asarray([[0.02, 0.02, 0.02]], jnp.float32)
    phi, g, valid = query.tsdf_trilinear(grid, p, GCFG, FCFG)
    assert not bool(valid[0])
    assert float(phi[0]) == 0.0
    # far away: no corners -> -T (extrapolation), invalid
    p2 = jnp.asarray([[5.0, 5.0, 5.0]], jnp.float32)
    phi2, _, valid2 = query.tsdf_trilinear(grid, p2, GCFG, FCFG)
    assert not bool(valid2[0])
    np.testing.assert_allclose(float(phi2[0]), -T, atol=1e-6)


def test_weights_trilinear_requires_all_corners():
    corners = [[i, j, k] for i in range(2) for j in range(2) for k in range(2)]
    grid = _grid_with(corners, np.zeros(8), np.arange(1.0, 9.0))
    p = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32) * GCFG.voxel_size
    w = query.weights_trilinear(grid, p, GCFG)
    assert float(w[0]) == 1.0  # min corner weight
    grid2 = _grid_with(corners[:7], np.zeros(7), np.ones(7))
    w2 = query.weights_trilinear(grid2, p, GCFG)
    assert float(w2[0]) == 0.0
