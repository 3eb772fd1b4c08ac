"""Scalar-driven scatter-add as a Pallas TPU kernel.

The fusion hot path is 5 scatter-adds of ~1M samples into the block store
(ops/fusion.py). XLA lowers each to a serialized ~10 ns/element loop over
HBM. The only scatter shape Mosaic can express (no vector VMEM
gather/scatter) is:

  * destination accumulator resident in VMEM, laid out [rows, 128] so a
    linear index i splits into (sublane row i//128, lane i%128);
  * per sample: scalar-read the index from SMEM, dynamic-slice the single
    destination row from VMEM, add value * onehot(lane), store the row back.

That is ~1 row RMW (3 vector ops on 128 lanes) + scalar bookkeeping per
sample — fundamentally serialized on the scalar core, like XLA's loop, but
with the accumulator guaranteed on-chip. The VMEM residency bounds the
destination to ~2M f32 (8 MB), i.e. ~4k active 8^3 blocks per field.

Measured verdict lives in PERF_NOTES.md ("Pallas scatter kernel"); the
kernel is kept runnable + tested (interpret mode on CPU, real lowering on
TPU) as the reference point for revisiting when Mosaic gains vector
gather/scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(idx_ref, val_ref, out_ref, *, chunk: int, rows: int):
    """Grid step: accumulate `chunk` samples into the resident out block."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def body(j, _):
        i = idx_ref[j]
        v = val_ref[j]
        row = i // LANES
        lane = i % LANES

        @pl.when((i >= 0) & (row < rows))
        def _():
            cur = out_ref[pl.ds(row, 1), :]
            onehot = (lane_ids == lane).astype(jnp.float32)
            out_ref[pl.ds(row, 1), :] = cur + v * onehot

        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _multi_kernel(idx_ref, vrow_ref, acc_ref, out_ref, *,
                  chunk: int, rows: int, fresh: bool):
    """Grid step: per sample, one row RMW accumulating ALL fields at once.

    The payload row (128 lanes with the sample's fields pre-placed at its
    destination's lane group by the XLA-side prep) is vector-loaded from
    VMEM by sublane index; the RMW is a single (1, 128) add. Compared with
    the 1-field kernel this amortizes the scalar-core serialization across
    every field (VERDICT r2 item 2: lane-packed multi-field row). `fresh`
    zero-inits the accumulator; otherwise the aliased carry-in is used
    (chunked fusion accumulates across kernel calls)."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        if fresh:
            out_ref[:] = jnp.zeros_like(out_ref)
        else:
            out_ref[:] = acc_ref[:]

    def body(j, _):
        row = idx_ref[j]

        @pl.when((row >= 0) & (row < rows))
        def _():
            out_ref[pl.ds(row, 1), :] = (
                out_ref[pl.ds(row, 1), :] + vrow_ref[pl.ds(j, 1), :]
            )

        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


GROUPS = 25       # destinations per 128-lane row (5 lanes each; 3 dead)
GROUP_LANES = 5


def multi_rows(out_size: int) -> int:
    return -(-out_size // GROUPS)


def scatter_add_multi(idx: jax.Array, vals: jax.Array, out_size: int,
                      *, acc: jax.Array = None, chunk: int = 1024,
                      interpret: bool = False):
    """Multi-field scatter-add in ONE pass: out[idx[j], f] += vals[j, f].

    vals is [N, F] with F <= 5; each destination owns a 5-lane group
    (25 destinations per 128-lane row, 20.5 B/destination), so the VMEM
    residency bound is ~600k destinations. Indices outside [0, out_size)
    are dropped. `acc` (packed [rows, 128], from a previous call's
    `raw=True` output) carries accumulation across calls — the chunked
    fusion loop's accumulator. Returns the packed [rows, 128] accumulator;
    unpack with `unpack_multi`."""
    n, f = vals.shape
    assert f <= GROUP_LANES, f
    rows = multi_rows(out_size)
    if acc is None:
        acc = jnp.zeros((rows, LANES), jnp.float32)
        fresh = True
    else:
        fresh = False
    if n == 0:
        return acc
    pad = (-n) % chunk
    if pad:
        idx = jnp.pad(idx, (0, pad), constant_values=-1)
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
    n_pad = n + pad
    idx = idx.astype(jnp.int32)

    # XLA-side prep (dense, ~2 vector passes over [N, 128]): place the F
    # field values at the sample's destination lane group so the kernel's
    # RMW is a pure vector add with no scalar value loads.
    row_of = jnp.where((idx >= 0) & (idx < out_size), idx // GROUPS, -1)
    lane_base = (idx % GROUPS) * GROUP_LANES
    lanes = jnp.arange(LANES, dtype=jnp.int32)[None, :]
    rel = lanes - lane_base[:, None]          # [N, 128]
    vrow = jnp.zeros((n_pad, LANES), jnp.float32)
    for k in range(f):
        vrow = vrow + jnp.where(rel == k, vals[:, k:k + 1].astype(jnp.float32),
                                0.0)

    out = pl.pallas_call(
        functools.partial(_multi_kernel, chunk=chunk, rows=rows, fresh=fresh),
        grid=(n_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        # the carry-in accumulator shares the output buffer; Mosaic still
        # stacks both blocks in scoped VMEM, so the default 16 MB scoped
        # limit is raised (v5e has 128 MB physical VMEM; measured need:
        # 20.48M at 524k destinations)
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(row_of, vrow, acc)
    return out


def unpack_multi(packed: jax.Array, out_size: int, f: int) -> jax.Array:
    """Packed [rows, 128] kernel accumulator -> [out_size, f] f32."""
    rows = packed.shape[0]
    used = packed[:, : GROUPS * GROUP_LANES]
    return used.reshape(rows * GROUPS, GROUP_LANES)[:out_size, :f]


def scatter_add_rows(idx: jax.Array, val: jax.Array, out_size: int,
                     *, chunk: int = 2048, interpret: bool = False):
    """out[idx[j]] += val[j] with out zero-initialized; idx outside
    [0, out_size) are dropped. `out_size` is rounded up to a multiple of
    128 internally; the accumulator must fit VMEM (<= ~2M elements)."""
    n = idx.shape[0]
    rows = -(-out_size // LANES)
    if n == 0:
        return jnp.zeros((out_size,), jnp.float32)
    pad = (-n) % chunk
    if pad:
        idx = jnp.pad(idx, (0, pad), constant_values=-1)
        val = jnp.pad(val, (0, pad))
    n_pad = n + pad

    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, rows=rows),
        grid=(n_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), val.astype(jnp.float32))
    return out.reshape(-1)[:out_size]
