"""Small image filters: median blur and bilinear sampling.

The reference uses cv::medianBlur(depth, 5) before fusion
(`MapGradPixelSdf.cpp:53`) and hand-rolled bilinear sampling with
finite-difference image gradients in PhotoBA
(`PhotometricOptimizer.cpp:57-139`). Both become XLA-native here: the median
as a fixed 25-element sorting network via jnp.sort over a patch axis, the
sampler as a gather + lerp that is differentiable (so PhotoBA Jacobians come
from jax.grad instead of hand-derived chain rules).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def median_blur(img: jax.Array, ksize: int = 5) -> jax.Array:
    """Median filter with BORDER_REFLECT_101 (matches cv::medianBlur).

    Builds the k^2 shifted views along a new axis and takes the middle order
    statistic with jnp.sort — k^2 is tiny (25) so this is a bandwidth-bound
    VPU op, no data-dependent control flow.
    """
    r = ksize // 2
    padded = jnp.pad(img, r, mode="reflect")
    h, w = img.shape
    patches = [
        jax.lax.dynamic_slice(padded, (dy, dx), (h, w))
        for dy in range(ksize)
        for dx in range(ksize)
    ]
    stack = jnp.stack(patches, axis=-1)
    return jnp.sort(stack, axis=-1)[..., (ksize * ksize) // 2]


def bilinear_sample(img: jax.Array, uv: jax.Array, *, channel_last: bool = True):
    """Differentiable bilinear sampling.

    img: [H, W] or [H, W, C]; uv: (…, 2) pixel coords (u = x/col, v = y/row).
    Returns (values (…,) or (…, C), in_bounds mask (…,)).

    Out-of-bounds samples clamp to the border and report in_bounds=False —
    mirroring PhotoBA's border cases (PhotometricOptimizer.cpp:57-139) where
    out-of-image projections are discarded by the caller.
    """
    has_c = img.ndim == 3
    H, W = img.shape[0], img.shape[1]
    u = uv[..., 0]
    v = uv[..., 1]
    in_bounds = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    u = jnp.clip(u, 0.0, W - 1.000001)
    v = jnp.clip(v, 0.0, H - 1.000001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = u - u0
    fv = v - v0

    def g(vi, ui):
        return img[vi, ui] if not has_c else img[vi, ui, :]

    w00 = (1 - fu) * (1 - fv)
    w10 = fu * (1 - fv)
    w01 = (1 - fu) * fv
    w11 = fu * fv
    if has_c:
        w00, w10, w01, w11 = (w[..., None] for w in (w00, w10, w01, w11))
    val = w00 * g(v0, u0) + w10 * g(v0, u1) + w01 * g(v1, u0) + w11 * g(v1, u1)
    return val, in_bounds
