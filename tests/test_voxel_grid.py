import numpy as np
import jax
import jax.numpy as jnp

from gradient_sdf_tpu.config import GridConfig
from gradient_sdf_tpu.ops import voxel_grid as vg


CFG = GridConfig(num_blocks=2048)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(1)
    half = CFG.dir_dim // 2
    coords = rng.randint(-half, half, size=(1000, 3)).astype(np.int32)
    keys = vg.pack_key(jnp.asarray(coords), CFG)
    back = np.asarray(vg.unpack_key(keys, CFG))
    np.testing.assert_array_equal(back, coords)
    assert np.all(np.asarray(keys) >= 0)


def test_pack_out_of_range():
    half = CFG.dir_dim // 2
    coords = jnp.array([[half + 1, 0, 0], [0, -half - 1, 0],
                        [half - 1, half - 1, half - 1]], dtype=jnp.int32)
    keys = np.asarray(vg.pack_key(coords, CFG))
    assert keys[0] == -1 and keys[1] == -1 and keys[2] >= 0


def test_voxel_to_block_negative_coords():
    vi = jnp.array([[-1, -8, -9], [0, 7, 8], [15, -16, 3]], dtype=jnp.int32)
    block, local = vg.voxel_to_block(vi, CFG)
    block = np.asarray(block)
    np.testing.assert_array_equal(block, [[-1, -1, -2], [0, 0, 1], [1, -2, 0]])
    # local offsets always in [0, B^3)
    local = np.asarray(local)
    assert np.all(local >= 0) and np.all(local < 512)


def test_insert_and_lookup():
    grid = vg.create(CFG)
    rng = np.random.RandomState(2)
    coords = np.unique(rng.randint(-20, 20, size=(300, 3)).astype(np.int32), axis=0)
    keys = vg.pack_key(jnp.asarray(coords), CFG)
    grid = vg.insert_keys(grid, keys, CFG)
    assert int(grid.num_active) == len(coords)
    assert not bool(grid.overflow)
    slots = np.asarray(vg.lookup_keys(grid, keys, CFG))
    assert np.all(slots >= 0)
    assert len(np.unique(slots)) == len(coords)
    # recorded block coords match
    bc = np.asarray(grid.block_coords)[slots]
    np.testing.assert_array_equal(bc, coords)
    # absent keys return -1
    missing = vg.pack_key(jnp.asarray([[100, 100, 100]], dtype=np.int32), CFG)
    assert int(vg.lookup_keys(grid, missing, CFG)[0]) == -1


def test_insert_idempotent():
    grid = vg.create(CFG)
    coords = jnp.asarray([[0, 0, 0], [1, 2, 3], [-4, 5, -6]], dtype=jnp.int32)
    keys = vg.pack_key(coords, CFG)
    grid = vg.insert_keys(grid, keys, CFG)
    slots1 = np.asarray(vg.lookup_keys(grid, keys, CFG))
    grid = vg.insert_keys(grid, keys, CFG)
    slots2 = np.asarray(vg.lookup_keys(grid, keys, CFG))
    np.testing.assert_array_equal(slots1, slots2)
    assert int(grid.num_active) == 3


def test_insert_overflow_flag():
    small = GridConfig(num_blocks=4)
    grid = vg.create(small)
    coords = jnp.asarray(np.arange(24).reshape(8, 3), dtype=jnp.int32)
    keys = vg.pack_key(coords, small)
    grid = vg.insert_keys(grid, keys, small)
    assert bool(grid.overflow)
    assert int(grid.num_active) == 4  # capacity respected


def test_ensure_blocks_from_voxels():
    grid = vg.create(CFG)
    rng = np.random.RandomState(3)
    voxels = rng.randint(-40, 40, size=(5000, 3)).astype(np.int32)
    valid = np.ones(5000, dtype=bool)
    valid[::7] = False
    grid = vg.ensure_blocks(grid, jnp.asarray(voxels), jnp.asarray(valid), CFG)
    lin, present = vg.lookup_voxels(grid, jnp.asarray(voxels), CFG)
    present = np.asarray(present)
    assert np.all(present[valid])
    # linear indices map back to the right voxel
    lin = np.asarray(lin)
    slots = lin // CFG.voxels_per_block
    local = lin % CFG.voxels_per_block
    bc = np.asarray(grid.block_coords)[slots]
    lx, ly, lz = local % 8, (local // 8) % 8, local // 64
    reconstructed = bc * 8 + np.stack([lx, ly, lz], axis=-1)
    np.testing.assert_array_equal(reconstructed[valid], voxels[valid])


def test_insert_jit_compiles():
    grid = vg.create(CFG)
    coords = jnp.asarray([[0, 0, 0], [1, 1, 1]], dtype=jnp.int32)
    keys = vg.pack_key(coords, CFG)
    insert = jax.jit(lambda g, k: vg.insert_keys(g, k, CFG))
    grid = insert(grid, keys)
    assert int(grid.num_active) == 2


def test_grow_preserves_data():
    import dataclasses

    small = GridConfig(num_blocks=8)
    grid = vg.create(small)
    coords = jnp.asarray(np.arange(21).reshape(7, 3), dtype=jnp.int32)
    keys = vg.pack_key(coords, small)
    grid = vg.insert_keys(grid, keys, small)
    # write recognizable data
    dist = np.array(vg.flat_field(grid.dist)).reshape(grid.dist.shape)
    slots = np.asarray(vg.lookup_keys(grid, keys, small))
    dist[slots, 0] = np.arange(7) + 1.0
    grid = grid._replace(dist=jnp.asarray(dist))

    big, big_cfg = vg.grow(grid, small)
    assert big_cfg.num_blocks == 16
    assert int(big.num_active) == 7
    assert not bool(big.overflow)
    new_slots = np.asarray(vg.lookup_keys(big, vg.pack_key(coords, big_cfg), big_cfg))
    assert np.all(new_slots >= 0)
    got = np.asarray(big.dist)[new_slots, 0]
    np.testing.assert_allclose(got, np.arange(7) + 1.0)
    # coords recorded
    np.testing.assert_array_equal(np.asarray(big.block_coords)[new_slots], coords)


def test_auto_growth_during_fusion():
    """GradSdfMap grows its grid when a frame overflows block capacity."""
    import dataclasses
    from gradient_sdf_tpu.config import PipelineConfig, GridConfig
    from gradient_sdf_tpu.models.grad_sdf import GradSdfMap
    from gradient_sdf_tpu.data import synth

    cfg = PipelineConfig(grid=GridConfig(voxel_size=0.02, num_blocks=16))
    W, H = 64, 48
    K = np.array([[52.5, 0, 31.5], [0, 52.5, 23.5], [0, 0, 1]], np.float32)
    world = synth.SphereWorld(
        centers=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
        radii=jnp.asarray([0.3], jnp.float32),
    )
    poses = synth.orbit_poses(n=8, radius=1.2)
    m = GradSdfMap(cfg)
    for i in range(3):
        R, t = poses[i]
        depth = synth.render_depth(world, jnp.asarray(R), jnp.asarray(t), K, W, H)
        m.update(depth, K, (jnp.asarray(R), jnp.asarray(t)))
    # grid must have grown beyond the original capacity and be overflow-free
    assert m.cfg.grid.num_blocks > 16
    assert not bool(m.grid.overflow)
    assert int(m.grid.num_active) > 16
    # data still sane: weights accumulated, queries work
    phi, grad = m.tsdf(np.array([[0.3, 0.0, 0.0]], np.float32))
    assert np.isfinite(float(phi[0]))


def test_coarse_occupancy_superset():
    """coarse_occ covers every allocated block (raycast skip-safety)."""
    grid = vg.create(CFG)
    rng = np.random.RandomState(9)
    coords = np.unique(rng.randint(-40, 40, (400, 3)).astype(np.int32), axis=0)
    keys = vg.pack_key(jnp.asarray(coords), CFG)
    grid = vg.insert_keys(grid, keys, CFG)

    # the center point of every allocated block must be coarse-occupied
    pts = coords * 8 * CFG.voxel_size  # block-origin voxel centers
    occ = np.asarray(vg.lookup_coarse(grid, jnp.asarray(pts, jnp.float32), CFG))
    assert occ.all()

    # a far empty region reads unoccupied
    far = jnp.asarray([[3.0, 3.0, 3.0]], jnp.float32)
    assert not bool(vg.lookup_coarse(grid, far, CFG)[0])


def test_grow_directory_preserves_map_and_extends_range():
    """vg.grow_directory doubles the world range; existing lookups and
    coarse occupancy survive, and previously out-of-range keys resolve."""
    import dataclasses

    cfg = dataclasses.replace(CFG, dir_dim=16)  # tiny range for the test
    grid = vg.create(cfg)
    vox_in = np.array([[0, 0, 0], [10, -5, 3], [-20, 17, 30]], np.int32)
    grid = vg.ensure_blocks(grid, jnp.asarray(vox_in),
                            jnp.ones(len(vox_in), bool), cfg)
    na0 = int(grid.num_active)
    lin0, pres0 = vg.lookup_voxels(grid, jnp.asarray(vox_in), cfg)
    assert np.all(np.asarray(pres0))

    # beyond +-16/2*8 = +-64 voxels: unmappable in the small directory
    vox_out = np.array([[100, 0, 0], [-90, 40, 70]], np.int32)
    block, _ = vg.voxel_to_block(jnp.asarray(vox_out), cfg)
    assert np.all(np.asarray(vg.pack_key(block, cfg)) == -1)

    grid2, cfg2 = vg.grow_directory(grid, cfg)
    assert cfg2.dir_dim == 32
    assert int(grid2.num_active) == na0
    # same slots resolve for old voxels
    lin2, pres2 = vg.lookup_voxels(grid2, jnp.asarray(vox_in), cfg2)
    np.testing.assert_array_equal(np.asarray(lin2), np.asarray(lin0))
    # coarse occupancy still covers every allocated block
    from gradient_sdf_tpu.ops.voxel_grid import COARSE_FACTOR
    pts = vg.voxel_to_point(jnp.asarray(vox_in), cfg2.voxel_size)
    assert np.all(np.asarray(vg.lookup_coarse(grid2, pts, cfg2)))
    # the previously unmappable voxels now insert fine
    grid2 = vg.ensure_blocks(grid2, jnp.asarray(vox_out),
                             jnp.ones(len(vox_out), bool), cfg2)
    _, pres3 = vg.lookup_voxels(grid2, jnp.asarray(vox_out), cfg2)
    assert np.all(np.asarray(pres3))


def test_lookup_keys_dedup_random_patterns():
    """lookup_keys_dedup must equal lookup_keys on ADVERSARIAL walk
    layouts: random change positions, EMPTY keys, out-of-range keys,
    all-same rays, all-distinct rays (cap overflow -> fallback)."""
    import numpy as np

    cfg = GridConfig(voxel_size=0.02, num_blocks=256, dir_dim=32)
    grid = vg.create(cfg)
    rng = np.random.default_rng(11)
    # allocate a handful of blocks
    coords = jnp.asarray(rng.integers(-3, 3, (40, 3)).astype(np.int32))
    keys_alloc = vg.pack_key(coords, cfg)
    grid = vg.insert_keys(grid, keys_alloc, cfg)

    C, K = 64, 11
    pool = np.concatenate([
        np.asarray(keys_alloc),
        np.asarray([vg.EMPTY_KEY] * 8, np.int32),
        rng.integers(0, cfg.dir_dim ** 3, 8).astype(np.int32),
    ])
    # rays with random run-length structure
    walks = []
    for _ in range(C):
        row = []
        while len(row) < K:
            row += [pool[rng.integers(len(pool))]] * rng.integers(1, 5)
        walks.append(row[:K])
    keys = jnp.asarray(np.array(walks, np.int32).reshape(-1))
    want = vg.lookup_keys(grid, keys, cfg)
    got = vg.lookup_keys_dedup(grid, keys, cfg, K)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # all-distinct rays: 11 changes/ray > default cap 5 -> full fallback
    keys_d = jnp.asarray(rng.permutation(
        np.tile(pool[:K], C)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(vg.lookup_keys_dedup(grid, keys_d, cfg, K)),
        np.asarray(vg.lookup_keys(grid, keys_d, cfg)))

    # all-identical rays: 1 change/ray
    keys_s = jnp.asarray(np.repeat(pool[:C], K).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(vg.lookup_keys_dedup(grid, keys_s, cfg, K)),
        np.asarray(vg.lookup_keys(grid, keys_s, cfg)))
