"""TPU micro-probe: fusion/tracking random-pass formulations (round 3).

Measures, on the real chip, candidate replacements for the fusion hot
path's 6 random-HBM passes (1 directory lookup + 5 f32 scatter-adds) and
the tracker's 6 gather passes per GN iteration:

  A. baseline: 5 separate f32 [N]->[V] scatter-adds
  B. ONE [N,8]-row scatter-add into a [V,8] accumulator (all 5 fields in
     one pass; 3 pad lanes) — wins if TPU scatter cost is per ROW
     (descriptor), not per element
  C. tracker: 5 separate element gathers vs ONE [N]x(1,8) row gather
     from a [V,8] packed field array
  D. Pallas 5-field lane-packed row-RMW one-pass kernel (VERDICT r2
     item 2) at a VMEM-resident destination
  E. f16 scatter-add (is cost per byte or per element?)

Measurement rules (PERF_NOTES.md "Measurement traps"): repeated identical
(program, args) executions get coalesced/memoized by the remote runtime,
so every repetition here runs INSIDE one jitted fori_loop with the index
set varied per iteration (cheap dense remap) and a data-dependent scalar
carried out; big operands are explicit arguments (closed-over constants
get baked into the remote compile request — 536 MB blew its body limit).

Run:  python tools/probe_scatter_formulations.py        (on the TPU)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


def timed_loop(fn_one, n_iters, *args):
    """Per-iteration seconds of fn_one(k, *args), measured as the wall-time
    DIFFERENCE between an (n_iters+2)-iteration and a 2-iteration on-device
    loop — distinct (program, args) pairs every call (the remote runtime
    memoizes identical executions) and fixed RPC/dispatch overhead cancels.
    The iteration index k varies the access pattern inside the loop."""

    @jax.jit
    def run(n, k0, *a):
        def body(k, acc):
            return acc + fn_one(k0 + k, *a)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0),
                                 unroll=False)

    jax.block_until_ready(run(jnp.int32(1), jnp.int32(100), *args))  # compile

    def once(n, k0):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(n), jnp.int32(k0), *args))
        return time.perf_counter() - t0

    t_short = once(2, 1)
    t_long = once(n_iters + 2, 200)
    return max(t_long - t_short, 1e-9) / n_iters


def main():
    print("device:", jax.devices()[0], flush=True)
    N = 704 * 1024            # ~valid rays x 11 samples on the VGA scene
    V = (2 ** 15) * 512       # full accumulator space (capacity)
    rng = np.random.default_rng(0)
    # realistic collision structure: ~78k unique hot voxels
    idx0 = jnp.asarray(
        (rng.integers(0, 78_000, size=N) * (V // 78_000)).astype(np.int32))
    val = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    vals8 = jnp.asarray(rng.standard_normal((N, 8)).astype(np.float32))

    def vary(idx, k):
        # cheap dense remap that changes the access pattern per iteration
        return (idx + k * 12289) % V

    # ---- A. 5 separate f32 scatter-adds ---------------------------------
    def one_A(k, idx, v):
        ii = vary(idx, k)
        s = jnp.float32(0.0)
        for i in range(5):
            acc = jnp.zeros((V,), jnp.float32).at[ii].add(
                v * (i + 1), mode="drop")
            s = s + acc[0]
        return s

    tA = timed_loop(one_A, ITERS, idx0, val)
    print(f"A 5x f32 scatter-add: {tA*1e3:.1f} ms  "
          f"({tA/N/5*1e9:.1f} ns/elem-pass)", flush=True)

    # ---- B. one [N,8]-row scatter-add -----------------------------------
    def one_B(k, idx, v8):
        ii = vary(idx, k)
        acc = jnp.zeros((V, 8), jnp.float32).at[ii].add(v8, mode="drop")
        return acc[0, 0]

    tB = timed_loop(one_B, ITERS, idx0, vals8)
    print(f"B 1x [N,8]-row scatter-add: {tB*1e3:.1f} ms  "
          f"({tB/N*1e9:.1f} ns/row = {tB/N/8*1e9:.1f} ns/elem)", flush=True)

    # ---- B5. one [N,5]-row scatter-add (exact payload) -------------------
    def one_B5(k, idx, v8):
        ii = vary(idx, k)
        acc = jnp.zeros((V, 5), jnp.float32).at[ii].add(
            v8[:, :5], mode="drop")
        return acc[0, 0]

    tB5 = timed_loop(one_B5, ITERS, idx0, vals8)
    print(f"B5 1x [N,5]-row scatter-add: {tB5*1e3:.1f} ms  "
          f"({tB5/N*1e9:.1f} ns/row)", flush=True)

    # ---- C. tracker gathers ----------------------------------------------
    M = 60 * 1024
    midx0 = jnp.asarray(rng.integers(0, V, size=M).astype(np.int32))
    src = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    src8 = jnp.asarray(rng.standard_normal((V, 8)).astype(np.float32))

    def one_C5(k, mi, s):
        ii = vary(mi, k)
        return sum((s[ii] * (j + 1)).sum() for j in range(5))

    def one_C1(k, mi, s8):
        ii = vary(mi, k)
        return s8[ii].sum()

    tC5 = timed_loop(one_C5, ITERS, midx0, src)
    tC1 = timed_loop(one_C1, ITERS, midx0, src8)
    print(f"C 5x elem gather [{M}]: {tC5*1e3:.2f} ms "
          f"({tC5/M/5*1e9:.1f} ns/elem-pass); "
          f"1x row gather [{M},8]: {tC1*1e3:.2f} ms ({tC1/M*1e9:.1f} ns/row)",
          flush=True)

    # also at fusion scale (lookup replacement question)
    tC5n = timed_loop(one_C5, ITERS, idx0, src)
    tC1n = timed_loop(one_C1, ITERS, idx0, src8)
    print(f"C' @N={N}: 5x elem {tC5n*1e3:.1f} ms; row {tC1n*1e3:.1f} ms "
          f"({tC1n/N*1e9:.1f} ns/row)", flush=True)

    # ---- E. f16 scatter-add ----------------------------------------------
    try:
        def one_E(k, idx, v):
            ii = vary(idx, k)
            acc = jnp.zeros((V,), jnp.float16).at[ii].add(
                v.astype(jnp.float16), mode="drop")
            return acc[0].astype(jnp.float32)

        tE = timed_loop(one_E, ITERS, idx0, val)
        print(f"E 1x f16 scatter-add: {tE*1e3:.1f} ms "
              f"({tE/N*1e9:.1f} ns/elem)", flush=True)
    except Exception as e:
        print("E f16 scatter failed:", repr(e)[:150], flush=True)

    # ---- D. Pallas 5-field one-pass (VMEM-resident dest) ------------------
    from gradient_sdf_tpu.ops.pallas.scatter_add import (
        scatter_add_multi, scatter_add_rows)

    VD = 256 * 1024  # 256k dests x 8 lanes x 4B = 8 MB VMEM
    didx0 = jnp.asarray(rng.integers(0, VD, size=N).astype(np.int32))

    # correctness on-device first (small slice)
    got = np.asarray(jax.jit(
        functools.partial(scatter_add_multi, out_size=VD)
    )(didx0[:4096], vals8[:4096, :5]))
    want = np.zeros((VD, 5), np.float32)
    np.add.at(want, np.asarray(didx0[:4096]), np.asarray(vals8[:4096, :5]))
    np.testing.assert_allclose(got, want, atol=1e-3)
    print("D correctness OK", flush=True)

    def one_D(k, idx, v8):
        ii = (idx + k * 12289) % VD
        out = scatter_add_multi(ii, v8[:, :5], VD)
        return out[0, 0]

    try:
        tD = timed_loop(one_D, 4, didx0, vals8)
        print(f"D pallas 5-field one-pass: {tD*1e3:.1f} ms "
              f"({tD/N*1e9:.1f} ns/sample)", flush=True)
    except Exception as e:
        print("D pallas 5-field failed:", repr(e)[:300], flush=True)

    def one_D1(k, idx, v):
        ii = (idx + k * 12289) % VD
        return scatter_add_rows(ii, v, VD)[0]

    try:
        tD1 = timed_loop(one_D1, 4, didx0, val)
        print(f"D1 pallas 1-field: {tD1*1e3:.1f} ms "
              f"({tD1/N*1e9:.1f} ns/sample)", flush=True)
    except Exception as e:
        print("D1 pallas 1-field failed:", repr(e)[:200], flush=True)

    # XLA comparators at the same small dest
    def one_B_small(k, idx, v8):
        ii = (idx + k * 12289) % VD
        acc = jnp.zeros((VD, 8), jnp.float32).at[ii].add(v8, mode="drop")
        return acc[0, 0]

    def one_A_small(k, idx, v):
        ii = (idx + k * 12289) % VD
        s = jnp.float32(0.0)
        for i in range(5):
            acc = jnp.zeros((VD,), jnp.float32).at[ii].add(
                v * (i + 1), mode="drop")
            s = s + acc[0]
        return s

    tBs = timed_loop(one_B_small, ITERS, didx0, vals8)
    tAs = timed_loop(one_A_small, ITERS, didx0, val)
    print(f"B'' [N,8]-row scatter small dest: {tBs*1e3:.1f} ms; "
          f"A'' 5x scatter small dest: {tAs*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
