import numpy as np
import jax.numpy as jnp
import pytest

from gradient_sdf_tpu.config import GridConfig
from gradient_sdf_tpu.ops import marching_cubes as mc
from gradient_sdf_tpu.ops import voxel_grid as vg


def test_tables_shapes_and_basic_cases():
    edge_tab, tri_tab = mc.build_tables()
    assert edge_tab.shape == (256,)
    assert tri_tab.shape == (256, mc.MAX_TRIS * 3)
    # empty and full cubes: no geometry
    assert edge_tab[0] == 0 and edge_tab[255] == 0
    assert np.all(tri_tab[0] == -1) and np.all(tri_tab[255] == -1)
    # single corner inside: one triangle on 3 cut edges
    for c in range(8):
        cfg = 1 << c
        tris = tri_tab[cfg][tri_tab[cfg] >= 0]
        assert len(tris) == 3
        assert bin(edge_tab[cfg]).count("1") == 3


def test_tables_complement_symmetry():
    """config and ~config cut the same edges (triangle counts may differ:
    the ambiguous-face rule separates *inside* corners, which flips topology
    under complement — fan count = cut_edges - 2 * cycles)."""
    edge_tab, tri_tab = mc.build_tables()
    for cfg in range(256):
        comp = 255 - cfg
        assert edge_tab[cfg] == edge_tab[comp]
        # every config's triangles use each cut edge at least once
        used = set(int(e) for e in tri_tab[cfg][tri_tab[cfg] >= 0])
        cut = {k for k in range(12) if (edge_tab[cfg] >> k) & 1}
        assert used == cut


def test_tables_triangle_edges_are_cut():
    edge_tab, tri_tab = mc.build_tables()
    for cfg in range(256):
        for e in tri_tab[cfg][tri_tab[cfg] >= 0]:
            assert (edge_tab[cfg] >> int(e)) & 1


def _sphere_grid(radius=0.12, vs=0.02, extent=0.2):
    gcfg = GridConfig(voxel_size=vs, num_blocks=512)
    grid = vg.create(gcfg)
    n = int(extent / vs)
    r = np.arange(-n, n + 1, dtype=np.int32)
    vox = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    grid = vg.ensure_blocks(
        grid, jnp.asarray(vox), jnp.ones(len(vox), bool), gcfg,
    )
    lin, present = vg.lookup_voxels(grid, jnp.asarray(vox), gcfg)
    assert np.all(np.asarray(present))
    pts = vox * vs
    sdf = np.linalg.norm(pts, axis=-1) - radius
    dist = np.array(vg.flat_field(grid.dist))
    weight = np.array(vg.flat_field(grid.weight))
    dist[np.asarray(lin)] = sdf
    weight[np.asarray(lin)] = 1.0
    grid = grid._replace(
        dist=jnp.asarray(dist).reshape(grid.dist.shape),
        weight=jnp.asarray(weight).reshape(grid.weight.shape),
    )
    return grid, gcfg


def test_extract_sphere_mesh():
    grid, gcfg = _sphere_grid()
    verts, faces = mc.extract_mesh(grid, gcfg, chunk=64)
    assert len(faces) > 100
    # vertices on the sphere of radius 0.12 (within interpolation error)
    r = np.linalg.norm(verts, axis=-1)
    assert np.abs(r - 0.12).max() < 0.5 * gcfg.voxel_size
    # watertight: every undirected edge is shared by exactly 2 triangles
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)
    # outward orientation: triangle normals point away from origin
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    cent = (v0 + v1 + v2) / 3
    dots = np.sum(nrm * cent, axis=-1)
    frac_outward = np.mean(dots > 0)
    assert frac_outward > 0.99
