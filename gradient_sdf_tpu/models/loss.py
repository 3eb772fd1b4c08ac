"""Robust loss functions (reference `ps_optimizer/loss.h:41-48`).

The reference declares {L2, CAUCHY, HUBER, TUKEY, TRUNC_L2} but its solvers
only branch on TRUNC_L2 (PhotometricOptimizer.cpp:364-365); every other
value behaves as plain L2. We keep the enum for config parity and also
provide the actual weight functions should a robustified solver be wanted
(`weight(r, loss, scale)` returns the IRLS weight).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class LossFunction(str, enum.Enum):
    L2 = "l2"
    CAUCHY = "cauchy"
    HUBER = "huber"
    TUKEY = "tukey"
    TRUNC_L2 = "trunc_l2"


def weight(r, loss: LossFunction, scale: float = 1.0):
    """IRLS weight w(r) such that the robust normal equations use w * r."""
    a = jnp.abs(r) / scale
    if loss in (LossFunction.L2, LossFunction.CAUCHY):
        # CAUCHY listed for parity: the reference never applies it (see doc)
        if loss == LossFunction.CAUCHY:
            return 1.0 / (1.0 + a * a)
        return jnp.ones_like(r)
    if loss == LossFunction.HUBER:
        return jnp.where(a <= 1.0, 1.0, 1.0 / jnp.maximum(a, 1e-12))
    if loss == LossFunction.TUKEY:
        return jnp.where(a <= 1.0, (1.0 - a * a) ** 2, 0.0)
    if loss == LossFunction.TRUNC_L2:
        return jnp.where(a <= 1.0, 1.0, 0.0)
    raise ValueError(loss)
