"""ops/pallas/scatter_add: correctness under the Pallas interpreter.

Real-TPU lowering and timing are recorded in PERF_NOTES.md ("Pallas scatter
kernel"): the kernel lowers and runs on v5e but at 31 ms for 845k samples
into 512k bins vs 8.8 ms for XLA's native scatter-add — the scalar-driven
row-RMW formulation (the only scatter Mosaic can express without vector
VMEM gather/scatter) loses to XLA, so fusion keeps the XLA scatters.
"""

import numpy as np
import jax.numpy as jnp

from gradient_sdf_tpu.ops.pallas.scatter_add import scatter_add_rows


def test_scatter_add_rows_matches_numpy():
    rng = np.random.RandomState(0)
    N, V = 5000, 700
    idx = rng.randint(-5, V + 5, N).astype(np.int32)  # incl. out-of-range
    val = rng.randn(N).astype(np.float32)
    out = scatter_add_rows(jnp.asarray(idx), jnp.asarray(val), V,
                           chunk=512, interpret=True)
    ref = np.zeros(V, np.float32)
    for i, v in zip(idx, val):
        if 0 <= i < V:
            ref[i] += v
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_scatter_add_rows_empty_and_padding():
    # n not a multiple of chunk; all indices dropped
    idx = jnp.asarray(np.full(100, -1, np.int32))
    val = jnp.asarray(np.ones(100, np.float32))
    out = scatter_add_rows(idx, val, 300, chunk=64, interpret=True)
    assert float(jnp.sum(jnp.abs(out))) == 0.0
    assert out.shape == (300,)


def test_scatter_add_multi_matches_numpy():
    """5-field lane-packed one-pass kernel (interpret mode), including
    carry-in accumulation across calls (the chunked-fusion contract)."""
    from gradient_sdf_tpu.ops.pallas.scatter_add import (
        scatter_add_multi, unpack_multi)

    rng = np.random.default_rng(3)
    N, V = 5000, 1600
    idx = rng.integers(-5, V + 5, size=N).astype(np.int32)
    vals = rng.standard_normal((N, 5)).astype(np.float32)
    packed = scatter_add_multi(jnp.asarray(idx), jnp.asarray(vals), V,
                               interpret=True)
    got = np.asarray(unpack_multi(packed, V, 5))
    want = np.zeros((V, 5), np.float32)
    ok = (idx >= 0) & (idx < V)
    np.add.at(want, idx[ok], vals[ok])
    np.testing.assert_allclose(got, want, atol=1e-4)

    # second call carries the first call's accumulator
    idx2 = rng.integers(0, V, size=N).astype(np.int32)
    vals2 = rng.standard_normal((N, 5)).astype(np.float32)
    packed2 = scatter_add_multi(jnp.asarray(idx2), jnp.asarray(vals2), V,
                                acc=packed, interpret=True)
    np.add.at(want, idx2, vals2)
    np.testing.assert_allclose(np.asarray(unpack_multi(packed2, V, 5)),
                               want, atol=1e-4)
