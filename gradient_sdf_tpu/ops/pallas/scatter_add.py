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
