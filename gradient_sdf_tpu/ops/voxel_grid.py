"""Block-sparse voxel grid: the TPU-native voxel hash map.

Replaces the reference's pointer-stable CPU hash map
(`cpp/include/sdf_tracker/MapGradPixelSdf.h:65-68`:
`phmap::parallel_node_hash_map<Vec3i, SdfVoxel>`) with a design XLA can
compile: voxels live in dense 8x8x8 blocks stored as structure-of-arrays in
HBM, and a fixed-capacity open-addressing hash table maps *packed integer
block coordinates* to block slots. Everything — lookup, insertion, scatter
updates — is expressed as vectorized gathers/scatters with static shapes, so
the whole fusion/tracking pipeline stays inside one `jit`.

Key differences from the CPU design, and why:
  * CPU: per-voxel nodes, pointer stability, rehash on growth.
    TPU: per-*block* table (512 voxels per entry → 512x fewer hash ops),
    pre-sized capacity, insertion via scatter-min arbitration (deterministic,
    no atomics/critical sections — contrast `MapGradPixelSdfOmp.cpp:112-121`).
  * CPU: `float` running weighted mean updated sequentially per sample
    (`MapGradPixelSdf.cpp:108-116`). TPU: commutative per-frame accumulators
    (sum w, sum w·sdf, sum w·n) merged once — order-independent and exactly
    equal to the sequential running mean in exact arithmetic.
  * Voxel->block addressing uses floor division; block coords are packed into
    one int32 key (10 signed bits per axis by default → ±512 blocks ≈ ±41 m
    at 1 cm voxels), so key compare/hash is a single int32 op.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GridConfig

EMPTY_KEY = jnp.int32(-1)
INT32_MAX = jnp.int32(2**31 - 1)


class VoxelGrid(NamedTuple):
    """Pytree holding the sparse SDF volume.

    Per-voxel fields mirror `SdfVoxel{dist, grad, weight}`
    (`cpp/include/sdf_voxel/SdfVoxel.h:45-57`); `dist` stores the running
    weighted mean of truncated projective SDF samples, `grad` the weighted sum
    of world-frame (inward) normals, `weight` the accumulated fusion weight.
    """

    # hash table
    table_keys: jax.Array   # int32 [table_size], packed block key or -1
    table_slots: jax.Array  # int32 [table_size], block slot or -1
    num_active: jax.Array   # int32 [], allocated block count
    overflow: jax.Array     # bool [], sticky insertion-failure flag
    # block store (SoA), voxel-linearized x-fastest within each block
    block_coords: jax.Array  # int32 [num_blocks, 3]
    dist: jax.Array          # f32 [num_blocks, B^3]
    weight: jax.Array        # f32 [num_blocks, B^3]
    grad: jax.Array          # f32 [num_blocks, B^3, 3]

    @property
    def num_blocks(self) -> int:
        return self.dist.shape[0]

    @property
    def voxels_per_block(self) -> int:
        return self.dist.shape[1]


def create(cfg: GridConfig) -> VoxelGrid:
    nb, vpb, ts = cfg.num_blocks, cfg.voxels_per_block, cfg.table_size
    assert ts & (ts - 1) == 0, "table_size must be a power of two"
    return VoxelGrid(
        table_keys=jnp.full((ts,), EMPTY_KEY, dtype=jnp.int32),
        table_slots=jnp.full((ts,), -1, dtype=jnp.int32),
        num_active=jnp.zeros((), dtype=jnp.int32),
        overflow=jnp.zeros((), dtype=bool),
        block_coords=jnp.zeros((nb, 3), dtype=jnp.int32),
        dist=jnp.zeros((nb, vpb), dtype=jnp.float32),
        weight=jnp.zeros((nb, vpb), dtype=jnp.float32),
        grad=jnp.zeros((nb, vpb, 3), dtype=jnp.float32),
    )


# ---------------------------------------------------------------------------
# coordinate packing / hashing
# ---------------------------------------------------------------------------


def pack_key_xyz(x: jax.Array, y: jax.Array, z: jax.Array,
                 cfg: GridConfig) -> jax.Array:
    """Pack int32 block coordinate components into one non-negative int32
    key. Out-of-range coordinates return EMPTY_KEY (treated as unmappable —
    the sample is dropped, mirroring "outside the representable volume").

    Component-array API: the hot paths keep x/y/z as separate full-size
    arrays because [N, 3]-shaped coordinate math (3-wide minor axis) is a
    TPU compile-time tarpit.
    """
    bits = cfg.coord_bits
    half = 1 << (bits - 1)
    lim = 1 << bits
    x = x + half
    y = y + half
    z = z + half
    in_range = (
        (x >= 0) & (x < lim) & (y >= 0) & (y < lim) & (z >= 0) & (z < lim)
    )
    key = (x << (2 * bits)) | (y << bits) | z
    return jnp.where(in_range, key, EMPTY_KEY)


def pack_key(block_coords: jax.Array, cfg: GridConfig) -> jax.Array:
    """(…,3)-array convenience wrapper over pack_key_xyz."""
    return pack_key_xyz(
        block_coords[..., 0], block_coords[..., 1], block_coords[..., 2], cfg
    )


def unpack_key(key: jax.Array, cfg: GridConfig) -> jax.Array:
    bits = cfg.coord_bits
    half = 1 << (bits - 1)
    mask = (1 << bits) - 1
    x = ((key >> (2 * bits)) & mask) - half
    y = ((key >> bits) & mask) - half
    z = (key & mask) - half
    return jnp.stack([x, y, z], axis=-1)


def _hash(key: jax.Array, table_size: int) -> jax.Array:
    """Fibonacci-style multiplicative hash on the packed key (uint32 mul)."""
    h = (key.astype(jnp.uint32) * jnp.uint32(2654435761)) >> jnp.uint32(16)
    h = h ^ (h >> jnp.uint32(8))
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# voxel <-> block addressing
# ---------------------------------------------------------------------------


def point_to_voxel(points: jax.Array, voxel_size: float) -> jax.Array:
    """World point -> nearest voxel index (reference `float2vox`,
    `MapGradPixelSdf.h:74-77`: round(p / voxel_size))."""
    return jnp.round(points / voxel_size).astype(jnp.int32)


def voxel_to_point(voxel_idx: jax.Array, voxel_size: float) -> jax.Array:
    """Voxel index -> world-space voxel center (reference `vox2float`)."""
    return voxel_idx.astype(jnp.float32) * voxel_size


def voxel_to_block(voxel_idx: jax.Array, cfg: GridConfig):
    """Split voxel index into (block coords, intra-block linear offset)."""
    b = cfg.block_shape
    block = jnp.floor_divide(voxel_idx, b)
    local = voxel_idx - block * b
    local_lin = (local[..., 2] * b + local[..., 1]) * b + local[..., 0]
    return block, local_lin


def block_local_to_voxel(block_coords: jax.Array, cfg: GridConfig) -> jax.Array:
    """All B^3 voxel indices of given blocks: (…,3) -> (…,B^3,3)."""
    b = cfg.block_shape
    r = jnp.arange(b, dtype=jnp.int32)
    lx = jnp.tile(r, b * b)
    ly = jnp.tile(jnp.repeat(r, b), b)
    lz = jnp.repeat(r, b * b)
    local = jnp.stack([lx, ly, lz], axis=-1)  # [B^3, 3], x fastest
    return block_coords[..., None, :] * b + local


# ---------------------------------------------------------------------------
# lookup
# ---------------------------------------------------------------------------


def lookup_keys(grid: VoxelGrid, keys: jax.Array, cfg: GridConfig) -> jax.Array:
    """Find block slots for packed keys (…,). Returns -1 where absent.

    Loop-free vectorized probing: all cfg.max_probes probe positions are
    gathered at once ([N, P] one-shot gather) and the first match selected —
    a single fused gather+select instead of a P-round `fori_loop`, which the
    TPU compiler handles ~20x faster at compile time and which keeps every
    query a pure bandwidth op. Probe chains are bounded by construction:
    insertion refuses placements beyond max_probes (overflow flag -> grow),
    so the table never contains a key this lookup cannot see. Tables are
    sized for load factor <= 0.25, making chains > 8 vanishingly rare.
    """
    ts = cfg.table_size
    P = cfg.max_probes
    h0 = _hash(keys, ts)
    idx = (h0[..., None] + jnp.arange(P, dtype=jnp.int32)) & (ts - 1)  # (…,P)
    k = grid.table_keys[idx]
    # entries are never deleted, so a present key always sits before the
    # first empty slot of its chain: a plain match scan is sufficient
    hit = k == keys[..., None]
    any_hit = jnp.any(hit, axis=-1)
    first = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    slot = grid.table_slots[(h0 + first) & (ts - 1)]
    valid = any_hit & (keys != EMPTY_KEY)
    return jnp.where(valid, slot, -1)


def lookup_voxels(grid: VoxelGrid, voxel_idx: jax.Array, cfg: GridConfig):
    """Voxel indices (…,3) -> (linear store index (…,), present mask (…,)).

    Linear index addresses the flattened [num_blocks * B^3] SoA arrays;
    absent voxels get index 0 with present=False (callers mask).
    """
    block, local = voxel_to_block(voxel_idx, cfg)
    keys = pack_key(block, cfg)
    slot = lookup_keys(grid, keys, cfg)
    present = slot >= 0
    lin = jnp.where(present, slot, 0) * cfg.voxels_per_block + local
    return lin, present


# ---------------------------------------------------------------------------
# insertion
# ---------------------------------------------------------------------------


def insert_keys(grid: VoxelGrid, keys: jax.Array, cfg: GridConfig) -> VoxelGrid:
    """Insert a batch of *unique* packed keys (1-D, EMPTY_KEY = padding).

    Deterministic parallel open-addressing insert: each probing round, every
    pending key claims its probe slot via a scatter-min arbitration on the
    candidate index; winners write their key and are assigned block slots in
    candidate order (stable → bit-for-bit reproducible across runs). Losers
    and keys whose probe slot is occupied continue to the next round.
    Replaces phmap's mutex-guarded insert (`MapGradPixelSdfOmp.cpp:112-121`)
    with an atomics-free formulation.
    """
    ts = cfg.table_size
    n = keys.shape[0]
    cand_ids = jnp.arange(n, dtype=jnp.int32)

    # skip keys already present or invalid
    existing = lookup_keys(grid, keys, cfg)
    pending0 = (keys != EMPTY_KEY) & (existing < 0)

    h0 = _hash(keys, ts)

    def body(p, carry):
        table_keys, table_slots, pending, num_active, overflow = carry
        idx = (h0 + p) & (ts - 1)
        slot_key = table_keys[idx]
        slot_empty = slot_key == EMPTY_KEY
        # also resolve: another pending key with same packed key cannot occur
        # (keys are unique), but our key may have been written by ourselves in
        # an earlier round — pending would already be False then.
        want = pending & slot_empty
        # arbitration: lowest candidate id wins each table slot
        claims = jnp.full((ts,), INT32_MAX, dtype=jnp.int32)
        claims = claims.at[jnp.where(want, idx, ts - 1)].min(
            jnp.where(want, cand_ids, INT32_MAX)
        )
        won = want & (claims[idx] == cand_ids)
        # allocate block slots in candidate order
        order = jnp.cumsum(won.astype(jnp.int32)) - 1
        new_slot = num_active + order
        capacity_ok = new_slot < grid.num_blocks
        place = won & capacity_ok
        overflow = overflow | jnp.any(won & ~capacity_ok)
        table_keys = table_keys.at[jnp.where(place, idx, ts)].set(
            jnp.where(place, keys, EMPTY_KEY), mode="drop"
        )
        table_slots = table_slots.at[jnp.where(place, idx, ts)].set(
            jnp.where(place, new_slot, -1), mode="drop"
        )
        num_active = num_active + jnp.sum(place.astype(jnp.int32))
        pending = pending & ~place
        return table_keys, table_slots, pending, num_active, overflow

    table_keys, table_slots, pending, num_active, overflow = jax.lax.fori_loop(
        0,
        cfg.max_probes,
        body,
        (grid.table_keys, grid.table_slots, pending0, grid.num_active, grid.overflow),
    )
    overflow = overflow | jnp.any(pending)  # probe chain exhausted

    # record coordinates for newly allocated blocks
    slots_now = lookup_keys(
        grid._replace(table_keys=table_keys, table_slots=table_slots), keys, cfg
    )
    newly = pending0 & (slots_now >= 0)
    coords = unpack_key(keys, cfg)
    block_coords = grid.block_coords.at[
        jnp.where(newly, slots_now, grid.num_blocks)
    ].set(jnp.where(newly[:, None], coords, 0), mode="drop")

    return grid._replace(
        table_keys=table_keys,
        table_slots=table_slots,
        num_active=num_active,
        overflow=overflow,
        block_coords=block_coords,
    )


def ensure_blocks(grid: VoxelGrid, voxel_idx: jax.Array, valid: jax.Array,
                  cfg: GridConfig, max_unique: int) -> VoxelGrid:
    """Allocate blocks for all (valid) voxel indices that need them.

    `max_unique` bounds the number of distinct blocks that can be touched per
    call (static shape for jit); excess unique blocks set the overflow flag
    implicitly by remaining unallocated (samples into them are dropped that
    frame and recovered on later frames).
    """
    block, _ = voxel_to_block(voxel_idx.reshape(-1, 3), cfg)
    keys = pack_key(block, cfg)
    keys = jnp.where(valid.reshape(-1), keys, EMPTY_KEY)
    unique = jnp.unique(keys, size=max_unique, fill_value=EMPTY_KEY)
    return insert_keys(grid, unique, cfg)


# ---------------------------------------------------------------------------
# growth (episodic host-side rehash)
# ---------------------------------------------------------------------------


def grow(grid: VoxelGrid, cfg: GridConfig, factor: int = 2):
    """Return (bigger_grid, bigger_cfg): capacity and table scaled by
    `factor`, all existing blocks re-inserted, voxel data copied.

    This is the episodic host-side rehash that replaces phmap's automatic
    growth (SURVEY.md §7 "hard parts"): dynamic insertion can't resize under
    jit, so fusion sets the sticky `overflow` flag and the driver grows the
    arrays between frames. Samples dropped in the overflowing frame are
    re-observed by later frames (fusion is a running weighted mean).
    """
    import dataclasses

    new_cfg = dataclasses.replace(
        cfg,
        num_blocks=cfg.num_blocks * factor,
        table_size=cfg.table_size * factor,
    )
    big = create(new_cfg)
    na = int(grid.num_active)
    keys = pack_key(grid.block_coords[:na], cfg)
    big = insert_keys(big, keys, new_cfg)
    # collisions can reorder slot assignment — scatter data to each key's
    # actual new slot
    slots = lookup_keys(big, keys, new_cfg)
    big = big._replace(
        dist=big.dist.at[slots].set(grid.dist[:na]),
        weight=big.weight.at[slots].set(grid.weight[:na]),
        grad=big.grad.at[slots].set(grid.grad[:na]),
        overflow=jnp.zeros((), bool),
    )
    return big, new_cfg


# ---------------------------------------------------------------------------
# field access helpers
# ---------------------------------------------------------------------------


def flat_field(x: jax.Array) -> jax.Array:
    """View a [num_blocks, B^3, ...] field as [num_blocks * B^3, ...]."""
    return x.reshape((-1,) + x.shape[2:])
