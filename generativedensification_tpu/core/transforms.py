"""Quaternion / rotation / covariance helpers for 3D Gaussians, jnp.

Conventions (parity with ``lightning/renderer.py:38-76``):
  * quaternions are (w, x, y, z) ("real part first"),
  * 3D covariance Σ = R S Sᵀ Rᵀ with S = diag(scales),
  * the rasterizer consumes activated values: scales = exp(raw),
    opacity = sigmoid(raw), rotation = L2-normalized raw quaternion.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion (assumed normalized) -> (..., 3, 3) rotation."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 4) wxyz quaternion (branch-free).

    Uses the standard four-hypothesis construction and picks the numerically
    best column, so it is safe under ``vmap``/``jit`` (no data-dependent
    branching, unlike the reference's if-chain ``lightning/utils.py:52-88``).
    """
    m = R
    diag = jnp.stack([m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1)
    t = diag.sum(-1)

    q0 = jnp.stack(
        [
            1.0 + t,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )
    q1 = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            1.0 + diag[..., 0] - diag[..., 1] - diag[..., 2],
            m[..., 0, 1] + m[..., 1, 0],
            m[..., 0, 2] + m[..., 2, 0],
        ],
        axis=-1,
    )
    q2 = jnp.stack(
        [
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 0, 1] + m[..., 1, 0],
            1.0 + diag[..., 1] - diag[..., 0] - diag[..., 2],
            m[..., 1, 2] + m[..., 2, 1],
        ],
        axis=-1,
    )
    q3 = jnp.stack(
        [
            m[..., 1, 0] - m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 1, 2] + m[..., 2, 1],
            1.0 + diag[..., 2] - diag[..., 0] - diag[..., 1],
        ],
        axis=-1,
    )
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    norms2 = jnp.stack(
        [1.0 + t, 1.0 + 2 * diag[..., 0] - t, 1.0 + 2 * diag[..., 1] - t, 1.0 + 2 * diag[..., 2] - t],
        axis=-1,
    )
    best = jnp.argmax(norms2, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return normalize_quat(q)


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): (..., 3, 3)."""
    R = quat_to_rotmat(normalize_quat(quats))
    return R * scales[..., None, :]


def build_covariance(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Σ = L Lᵀ with L = R diag(s); symmetric PSD (..., 3, 3)."""
    L = build_scaling_rotation(scales, quats)
    return L @ jnp.swapaxes(L, -1, -2)


def covariance_to_symm6(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack symmetric (...,3,3) into the 3DGS 6-vector (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )
