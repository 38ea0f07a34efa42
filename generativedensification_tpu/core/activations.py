"""Activation functions and the pipeline's calibrated output shifts.

Parity constants (``lightning/network.py:361-375``, ``configs/base.yaml``):
  * opacity head shift: ``-2.1792`` (sigmoid(x - 2.1792) ≈ 0.1 at x=0),
  * coarse scale shift: ``log(0.5 * voxel_size / 3)``,
  * fine scale shift:   ``log(0.5 * voxel_size / (8 * 3))``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    """exp with a clamped backward (gradient of exp(clip(x, -15, 15))).

    The reference's TruncExp (``point_decoder/layers/activation.py:7-28``)
    clamps the saved input to ±15 in backward to avoid inf gradients.
    """
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(x)
    return y, jnp.exp(jnp.clip(x, -15.0, 15.0)) * dx


def inverse_sigmoid(y, eps: float = 1e-6):
    y = jnp.clip(y, eps, 1.0 - eps)
    return jnp.log(y) - jnp.log1p(-y)


def opacity_shift() -> float:
    return -2.1792


def coarse_scale_shift(voxel_size: float) -> float:
    import math

    return math.log(0.5 * voxel_size / 3.0)


def fine_scale_shift(voxel_size: float) -> float:
    import math

    return math.log(0.5 * voxel_size / (8.0 * 3.0))
