"""TPU micro-probe: fusion/tracking random-pass formulations (round 3).

Measures, on the real chip, candidate replacements for the fusion hot
path's 6 random-HBM passes (1 directory lookup + 5 f32 scatter-adds) and
the tracker's 6 gather passes per GN iteration:

  A. baseline: 5 separate f32 [N]->[V] scatter-adds
  B. ONE [N,8]-row scatter-add into a [V,8] accumulator (all 5 fields in
     one pass; 3 pad lanes) — wins if TPU scatter cost is per ROW
     (descriptor), not per element; B5 = exact [N,5] payload
  C. tracker: 5 separate element gathers vs ONE [N]x(1,8) row gather
     from a [V,8] packed field array
  D. Pallas 5-field lane-packed row-RMW one-pass kernel (VERDICT r2
     item 2) at a VMEM-resident destination
  E. f16 scatter-add (is cost per byte or per element?)

Measurement rules (PERF_NOTES.md "Measurement traps"), each learned from
a bogus 0.0 ms reading in this round:
  * repeated identical (program, args) executions are coalesced/memoized
    by the remote runtime -> every call gets distinct scalar args;
  * XLA fuses scatter-into-zeros + small read into a DENSE filtered
    reduction (the scatter never materializes) -> the accumulator is
    CARRIED across loop iterations, like real fusion chunks;
  * big closed-over constants are baked into the remote-compile request
    (536 MB blew its body limit) -> operands are arguments or created
    on-device inside the jit;
  * single short/long pairs clamp to 0 under remote variance -> 3
    interleaved pairs, median difference, raw times printed.

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

ITERS = 8
_seed = [0]


def timed_loop(make_state, fn_one, *args, iters=ITERS):
    """Median per-iteration seconds of state = fn_one(k, state, *args),
    with the state carried across iterations inside ONE jitted fori_loop.
    Times the difference between (iters+1)- and 1-iteration runs, 3
    interleaved pairs, distinct scalar args per call."""

    @jax.jit
    def run(n, k0, *a):
        def body(k, st):
            return fn_one(k0 + k, st, *a)

        st = jax.lax.fori_loop(0, n, body, make_state())
        return jax.tree.reduce(
            lambda x, y: x + y,
            jax.tree.map(lambda x: x.ravel()[0].astype(jnp.float32), st),
        )

    jax.block_until_ready(run(jnp.int32(1), jnp.int32(999), *args))

    def once(n):
        _seed[0] += 1
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(n), jnp.int32(_seed[0]), *args))
        return time.perf_counter() - t0

    pairs = []
    raw = []
    for _ in range(3):
        ts = once(1)
        tl = once(iters + 1)
        raw.append((ts, tl))
        pairs.append((tl - ts) / iters)
    med = float(np.median(pairs))
    raw_s = " ".join(f"({a*1e3:.0f},{b*1e3:.0f})" for a, b in raw)
    return med, raw_s


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

    def vary(idx, k, vmax=V):
        return (idx + k * 12289) % vmax

    # ---- A. 5 separate f32 scatter-adds ---------------------------------
    def one_A(k, st, idx, v):
        ii = vary(idx, k)
        return tuple(a.at[ii].add(v * (i + 1), mode="drop")
                     for i, a in enumerate(st))

    tA, raw = timed_loop(
        lambda: tuple(jnp.zeros((V,), jnp.float32) for _ in range(5)),
        one_A, idx0, val)
    print(f"A 5x f32 scatter-add: {tA*1e3:.1f} ms "
          f"({tA/N/5*1e9:.1f} ns/elem-pass) raw={raw}", flush=True)

    # ---- B. one [N,8]-row scatter-add -----------------------------------
    def one_B(k, st, idx, v8):
        return (st[0].at[vary(idx, k)].add(v8, mode="drop"),)

    tB, raw = timed_loop(lambda: (jnp.zeros((V, 8), jnp.float32),),
                         one_B, idx0, vals8)
    print(f"B 1x [N,8]-row scatter-add: {tB*1e3:.1f} ms "
          f"({tB/N*1e9:.1f} ns/row) raw={raw}", flush=True)

    # ---- B5. one [N,5]-row scatter-add (exact payload) -------------------
    def one_B5(k, st, idx, v8):
        return (st[0].at[vary(idx, k)].add(v8[:, :5], mode="drop"),)

    tB5, raw = timed_loop(lambda: (jnp.zeros((V, 5), jnp.float32),),
                          one_B5, idx0, vals8)
    print(f"B5 1x [N,5]-row scatter-add: {tB5*1e3:.1f} ms "
          f"({tB5/N*1e9:.1f} ns/row) raw={raw}", flush=True)

    # ---- C. tracker gathers (sum carried; gathers can't be elided since
    # ---- indices change per iteration and the sum is carried) ------------
    M = 60 * 1024
    midx0 = jnp.asarray(rng.integers(0, V, size=M).astype(np.int32))
    src = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    src8 = jnp.asarray(rng.standard_normal((V, 8)).astype(np.float32))

    def one_C5(k, st, mi, s):
        ii = vary(mi, k)
        tot = st[0]
        for j in range(5):
            tot = tot + (s[ii] * (j + 1)).sum()
        return (tot,)

    def one_C1(k, st, mi, s8):
        ii = vary(mi, k)
        return (st[0] + s8[ii].sum(),)

    tC5, r5 = timed_loop(lambda: (jnp.float32(0.0),), one_C5, midx0, src)
    tC1, r1 = timed_loop(lambda: (jnp.float32(0.0),), one_C1, midx0, src8)
    print(f"C 5x elem gather [{M}]: {tC5*1e3:.2f} ms "
          f"({tC5/M/5*1e9:.1f} ns/elem-pass) raw={r5}; "
          f"1x row gather [{M},8]: {tC1*1e3:.2f} ms ({tC1/M*1e9:.1f} ns/row) "
          f"raw={r1}", flush=True)

    tC5n, _ = timed_loop(lambda: (jnp.float32(0.0),), one_C5, idx0, src)
    tC1n, _ = timed_loop(lambda: (jnp.float32(0.0),), one_C1, idx0, src8)
    print(f"C' @N={N}: 5x elem {tC5n*1e3:.1f} ms; row {tC1n*1e3:.1f} ms "
          f"({tC1n/N*1e9:.1f} ns/row)", flush=True)

    # ---- E. f16 scatter-add ----------------------------------------------
    try:
        def one_E(k, st, idx, v):
            return (st[0].at[vary(idx, k)].add(v.astype(jnp.float16),
                                               mode="drop"),)

        tE, raw = timed_loop(lambda: (jnp.zeros((V,), jnp.float16),),
                             one_E, idx0, val)
        print(f"E 1x f16 scatter-add: {tE*1e3:.1f} ms "
              f"({tE/N*1e9:.1f} ns/elem) raw={raw}", flush=True)
    except Exception as e:
        print("E f16 scatter failed:", repr(e)[:150], flush=True)

    # ---- D. Pallas 5-field one-pass (VMEM-resident dest) ------------------
    from gradient_sdf_tpu.ops.pallas.scatter_add import (
        scatter_add_multi, scatter_add_rows)

    VD = 256 * 1024  # 256k dests x 8 lanes x 4B = 8 MB VMEM
    didx0 = jnp.asarray(rng.integers(0, VD, size=N).astype(np.int32))

    got = np.asarray(jax.jit(
        functools.partial(scatter_add_multi, out_size=VD)
    )(didx0[:4096], vals8[:4096, :5]))
    want = np.zeros((VD, 5), np.float32)
    np.add.at(want, np.asarray(didx0[:4096]), np.asarray(vals8[:4096, :5]))
    np.testing.assert_allclose(got, want, atol=1e-3)
    print("D correctness OK", flush=True)

    # the pallas kernel zero-inits its own accumulator, so the carried
    # state is a scalar folding each pass's corner value (the kernel's
    # side-effect-free output can't be elided: it feeds the carry)
    def one_D(k, st, idx, v8):
        out = scatter_add_multi(vary(idx, k, VD), v8[:, :5] + st[0], VD)
        return (out[0, 0],)

    try:
        tD, raw = timed_loop(lambda: (jnp.float32(0.0),), one_D, didx0,
                             vals8, iters=4)
        print(f"D pallas 5-field one-pass: {tD*1e3:.1f} ms "
              f"({tD/N*1e9:.1f} ns/sample) raw={raw}", flush=True)
    except Exception as e:
        print("D pallas 5-field failed:", repr(e)[:300], flush=True)

    def one_D1(k, st, idx, v):
        return (scatter_add_rows(vary(idx, k, VD), v + st[0], VD)[0],)

    try:
        tD1, raw = timed_loop(lambda: (jnp.float32(0.0),), one_D1, didx0,
                              val, iters=4)
        print(f"D1 pallas 1-field: {tD1*1e3:.1f} ms "
              f"({tD1/N*1e9:.1f} ns/sample) raw={raw}", flush=True)
    except Exception as e:
        print("D1 pallas 1-field failed:", repr(e)[:200], flush=True)

    # XLA comparators at the same small dest
    def one_Bs(k, st, idx, v8):
        return (st[0].at[vary(idx, k, VD)].add(v8, mode="drop"),)

    def one_As(k, st, idx, v):
        return tuple(a.at[vary(idx, k, VD)].add(v * (i + 1), mode="drop")
                     for i, a in enumerate(st))

    tBs, _ = timed_loop(lambda: (jnp.zeros((VD, 8), jnp.float32),),
                        one_Bs, didx0, vals8)
    tAs, _ = timed_loop(
        lambda: tuple(jnp.zeros((VD,), jnp.float32) for _ in range(5)),
        one_As, didx0, val)
    print(f"B'' [N,8]-row scatter small dest: {tBs*1e3:.1f} ms; "
          f"A'' 5x scatter small dest: {tAs*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
