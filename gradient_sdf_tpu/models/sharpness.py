"""Keyframe sharpness test: modified-Laplacian focus measure (LAPM, Nayar89).

Re-implements `sharpDetector` / `modifiedLaplacian`
(`cpp/include/ps_optimizer/SharpDetector.h:44-70`): separable filters
[-1, 2, -1] x gaussian([.25, .5, .25]) in both orientations on the color
image, focus = mean(|Lx| + |Ly|) of the first channel, compared against a
per-dataset threshold (`main_photo_ba.cpp:109-120`).
"""

from __future__ import annotations

import jax.numpy as jnp

_LAP = jnp.asarray([-1.0, 2.0, -1.0])
_GAUSS = jnp.asarray([0.25, 0.5, 0.25])


def _sep_filter(img, kx, ky):
    """Separable 3-tap filter with BORDER_REFLECT_101 (cv sepFilter2D)."""
    x = jnp.pad(img, ((1, 1), (1, 1)), mode="reflect")
    # horizontal (kx along columns)
    h = kx[0] * x[:, :-2] + kx[1] * x[:, 1:-1] + kx[2] * x[:, 2:]
    v = ky[0] * h[:-2, :] + ky[1] * h[1:-1, :] + ky[2] * h[2:, :]
    return v


def modified_laplacian(img) -> jnp.ndarray:
    """img: [H, W] or [H, W, C] float; returns scalar focus measure
    (first channel only, matching cv::mean(...).val[0])."""
    chan = img[..., 0] if img.ndim == 3 else img
    lx = _sep_filter(chan, _LAP, _GAUSS)
    ly = _sep_filter(chan, _GAUSS, _LAP)
    return jnp.mean(jnp.abs(lx) + jnp.abs(ly))


def sharp_detector(img, threshold: float) -> bool:
    measure = float(modified_laplacian(jnp.asarray(img)))
    return measure >= threshold
