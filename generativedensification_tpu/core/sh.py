"""Real spherical harmonics, Cartesian closed form (degrees 0..4), jnp.

Two conventions coexist in the pipeline (both standard, re-derived from the
usual closed-form tables):

* ``rsh_cart`` — the torch-spherical-harmonics layout used by the reference
  for ray-direction conditioning (``tools/rsh.py``; pipeline uses degree 3 =
  16 components, ``lightning/network.py:708-710``). Index of Y_n^m is
  ``n*(n+1) + m``; includes the (-1)^m Condon-Shortley-absorbed signs of that
  library.
* ``eval_sh_color`` — the 3DGS rasterizer's SH→RGB evaluation (the CUDA
  kernel of diff-gaussian-rasterization evaluates SH from the view direction
  and adds 0.5).  Coefficients are the standard C0..C3 constants of the 3DGS
  codebase lineage.
"""

from __future__ import annotations

import jax.numpy as jnp

# -- torch-spherical-harmonics convention (conditioning features) -----------


def rsh_cart(xyz: jnp.ndarray, degree: int = 3) -> jnp.ndarray:
    """All real SH up to ``degree`` evaluated at points on the unit sphere.

    Args:
      xyz: (..., 3). Returns (..., (degree+1)**2).
    """
    if not 0 <= degree <= 3:
        raise ValueError(f"degree must be in [0, 3], got {degree}")
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    ones = jnp.ones_like(x)
    comps = [0.282094791773878 * ones]
    if degree >= 1:
        comps += [
            -0.48860251190292 * y,
            0.48860251190292 * z,
            -0.48860251190292 * x,
        ]
    if degree >= 2:
        x2, y2, z2 = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            1.09254843059208 * xy,
            -1.09254843059208 * yz,
            0.94617469575756 * z2 - 0.31539156525252,
            -1.09254843059208 * xz,
            0.54627421529604 * (x2 - y2),
        ]
    if degree >= 3:
        comps += [
            -0.590043589926644 * y * (3.0 * x2 - y2),
            2.89061144264055 * xy * z,
            0.304697199642977 * y * (1.5 - 7.5 * z2),
            1.24392110863372 * z * (1.5 * z2 - 0.5) - 0.497568443453487 * z,
            0.304697199642977 * x * (1.5 - 7.5 * z2),
            1.44530572132028 * z * (x2 - y2),
            -0.590043589926644 * x * (x2 - 3.0 * y2),
        ]
    return jnp.stack(comps, axis=-1)


def sh_dim(degree: int) -> int:
    return (degree + 1) ** 2


# -- 3DGS rasterizer SH evaluation (color) ----------------------------------

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def eval_sh_color(shs: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """3DGS in-kernel SH→RGB: ``max(result + 0.5, 0)`` over view directions.

    Args:
      shs: (..., (degree+1)**2, 3) SH coefficients (DC first).
      dirs: (..., 3) unnormalized view directions (mean - campos).
      degree: active SH degree (0..3).
    Returns:
      (..., 3) clamped RGB.
    """
    d = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    x, y, z = d[..., 0:1], d[..., 1:2], d[..., 2:3]
    result = _C0 * shs[..., 0, :]
    if degree >= 1:
        result = (
            result
            - _C1 * y * shs[..., 1, :]
            + _C1 * z * shs[..., 2, :]
            - _C1 * x * shs[..., 3, :]
        )
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + _C2[0] * xy * shs[..., 4, :]
            + _C2[1] * yz * shs[..., 5, :]
            + _C2[2] * (2.0 * zz - xx - yy) * shs[..., 6, :]
            + _C2[3] * xz * shs[..., 7, :]
            + _C2[4] * (xx - yy) * shs[..., 8, :]
        )
    if degree >= 3:
        result = (
            result
            + _C3[0] * y * (3.0 * xx - yy) * shs[..., 9, :]
            + _C3[1] * xy * z * shs[..., 10, :]
            + _C3[2] * y * (4.0 * zz - xx - yy) * shs[..., 11, :]
            + _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * shs[..., 12, :]
            + _C3[4] * x * (4.0 * zz - xx - yy) * shs[..., 13, :]
            + _C3[5] * z * (xx - yy) * shs[..., 14, :]
            + _C3[6] * x * (xx - 3.0 * yy) * shs[..., 15, :]
        )
    return jnp.maximum(result + 0.5, 0.0)
