"""FALS surface normals from depth (Badino et al.), XLA-native.

Re-implements the reference's `cv::NormalEstimator<T>`
(`cpp/include/normals/NormalEstimator.h:81-204`) with the same math:
per-pixel unit rays nbar = (x0, y0, 1)/|.|, a per-pixel 3x3 normal-equation
matrix M = sum_window nbar nbar^T precomputed once and inverted analytically
(adjugate), then per frame b = sum_window nbar / z and n = M^{-1} b,
normalized. Box sums are unnormalized box filters; on TPU they lower to two
separable cumulative-sum passes (O(1) per pixel, no 11x11 gather), and the
whole per-frame pass is a handful of fused VPU ops.

Border handling matches OpenCV's default BORDER_REFLECT_101 via jnp.pad
(mode="reflect").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def box_filter(img: jax.Array, window: int) -> jax.Array:
    """Unnormalized box sum over a window x window neighborhood.

    Equivalent to cv::boxFilter(..., normalize=false) with
    BORDER_REFLECT_101. Implemented with separable padded cumsums:
    O(H*W) independent of window size, bandwidth-bound on TPU.
    """
    r = window // 2
    x = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    # horizontal then vertical sliding sums via cumsum differences
    c = jnp.cumsum(x, axis=1)
    c = jnp.pad(c, ((0, 0), (1, 0)))
    h = c[:, window:] - c[:, :-window]
    c2 = jnp.cumsum(h, axis=0)
    c2 = jnp.pad(c2, ((1, 0), (0, 0)))
    return c2[window:, :] - c2[:-window, :]


class NormalEstimatorCache(NamedTuple):
    """Per-camera precomputed LUTs (reference `cache()`,
    NormalEstimator.h:81-154). Also reused by fusion for the per-pixel
    homogeneous ray (x0, y0, 1) and 1/|(x0,y0,1)|^2 — reference exposes
    these via x0_ptr/y0_ptr/n_sq_inv_ptr (NormalEstimator.h:206-210)."""

    x0: jax.Array        # f32 [H, W]  (u - cx) / fx
    y0: jax.Array        # f32 [H, W]  (v - cy) / fy
    n_sq_inv: jax.Array  # f32 [H, W]  1 / (1 + x0^2 + y0^2)
    x0_n_sq_inv: jax.Array
    y0_n_sq_inv: jax.Array
    Q: jax.Array         # f32 [H, W, 6] packed symmetric inverse (11,12,13,22,23,33)
    window: int


def build_cache(width: int, height: int, K: np.ndarray, window: int = 11) -> NormalEstimatorCache:
    """Precompute the FALS LUTs in float64 (reference does the cache pass in
    double, NormalEstimator.h:84-124) then cast to float32."""
    K = np.asarray(K, dtype=np.float64)
    fx_inv, fy_inv = 1.0 / K[0, 0], 1.0 / K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    u = (np.arange(width, dtype=np.float64) - cx) * fx_inv
    v = (np.arange(height, dtype=np.float64) - cy) * fy_inv
    x0, y0 = np.meshgrid(u, v)

    n_sq = 1.0 + x0 * x0 + y0 * y0
    n_sq_inv = 1.0 / n_sq
    x0n = x0 * n_sq_inv
    y0n = y0 * n_sq_inv

    def bf(a):
        return _np_box_filter(a, window)

    M11 = bf(x0 * x0 * n_sq_inv)
    M12 = bf(x0 * y0 * n_sq_inv)
    M13 = bf(x0n)
    M22 = bf(y0 * y0 * n_sq_inv)
    M23 = bf(y0n)
    M33 = bf(n_sq_inv)

    det = (
        M11 * M22 * M33
        + 2.0 * M12 * M23 * M13
        - (M13 * M13 * M22 + M12 * M12 * M33 + M23 * M23 * M11)
    )
    det_inv = 1.0 / det
    Q11 = det_inv * (M22 * M33 - M23 * M23)
    Q12 = det_inv * (M13 * M23 - M12 * M33)
    Q13 = det_inv * (M12 * M23 - M13 * M22)
    Q22 = det_inv * (M11 * M33 - M13 * M13)
    Q23 = det_inv * (M12 * M13 - M11 * M23)
    Q33 = det_inv * (M11 * M22 - M12 * M12)
    Q = np.stack([Q11, Q12, Q13, Q22, Q23, Q33], axis=-1)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return NormalEstimatorCache(
        x0=f32(x0),
        y0=f32(y0),
        n_sq_inv=f32(n_sq_inv),
        x0_n_sq_inv=f32(x0n),
        y0_n_sq_inv=f32(y0n),
        Q=f32(Q),
        window=window,
    )


def _np_box_filter(a: np.ndarray, window: int) -> np.ndarray:
    """NumPy reflect-101 box sum for the (host-side, once-per-camera) cache."""
    r = window // 2
    x = np.pad(a, r, mode="reflect")
    c = np.cumsum(x, axis=1)
    c = np.pad(c, ((0, 0), (1, 0)))
    h = c[:, window:] - c[:, :-window]
    c2 = np.cumsum(h, axis=0)
    c2 = np.pad(c2, ((1, 0), (0, 0)))
    return c2[window:, :] - c2[:-window, :]


def compute_normals(cache: NormalEstimatorCache, depth: jax.Array) -> jax.Array:
    """Per-frame FALS normals: depth [H, W] -> unit normals [H, W, 3].

    Matches reference `compute()` (NormalEstimator.h:179-204): zero-depth
    pixels contribute 0 to the window sums; output normals point *toward*
    the camera (inward) like the reference's. Pixels whose window carries no
    valid depth yield non-finite values — callers gate on
    ||n||^2 (fusion rejects ||n||^2 < 0.1, MapGradPixelSdf.cpp:95).
    """
    z_inv = jnp.where(depth != 0.0, 1.0 / depth, 0.0)
    b1 = box_filter(cache.x0_n_sq_inv * z_inv, cache.window)
    b2 = box_filter(cache.y0_n_sq_inv * z_inv, cache.window)
    b3 = box_filter(cache.n_sq_inv * z_inv, cache.window)
    Q = cache.Q
    nx = b1 * Q[..., 0] + b2 * Q[..., 1] + b3 * Q[..., 2]
    ny = b1 * Q[..., 1] + b2 * Q[..., 3] + b3 * Q[..., 4]
    nz = b1 * Q[..., 2] + b2 * Q[..., 4] + b3 * Q[..., 5]
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    n = jnp.stack([nx, ny, nz], axis=-1) / norm[..., None]
    return n
