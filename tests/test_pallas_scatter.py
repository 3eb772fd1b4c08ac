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
