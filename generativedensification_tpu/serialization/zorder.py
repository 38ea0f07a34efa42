"""Morton (z-order) codes via magic-number bit spreading, jnp uint32 pairs.

Bit layout matches the reference LUT codec (``z_order.py:41-60``): bit ``i``
of x maps to code bit ``3i+2``, y to ``3i+1``, z to ``3i``.

JAX without x64 has no int64, so a code is a ``(..., 2)`` int32 array
``[hi, lo]`` (uint32): ``lo`` holds interleaved bits of the low 8 bits of each axis
(24 bits), ``hi`` the bits 8..15 (24 bits) — the same 8-bit split the
reference's LUT uses (``z_order.py:86-95``), as a pair instead of an int64.
Ordering is lexicographic on (hi, lo); see :func:`code_argsort`.
Branch-free, fully vectorized, no lookup tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

LO_BITS = 24  # 3 * 8 interleaved bits per word

# magic spread masks as explicit uint32 (Python int literals above 2^31-1
# overflow JAX's weak int32 literals)
_M0 = np.uint32(0x3FF)
_M16 = np.uint32(0xFF0000FF)
_M8 = np.uint32(0x0300F00F)
_M4 = np.uint32(0x030C30C3)
_M2 = np.uint32(0x09249249)


def _part1by2_32(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so bit i lands at position 3i (uint32)."""
    v = v.astype(jnp.uint32) & _M0
    v = (v | (v << 16)) & _M16
    v = (v | (v << 8)) & _M8
    v = (v | (v << 4)) & _M4
    v = (v | (v << 2)) & _M2
    return v


def _compact1by2_32(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_part1by2_32`."""
    v = v.astype(jnp.uint32) & _M2
    v = (v ^ (v >> 2)) & _M4
    v = (v ^ (v >> 4)) & _M8
    v = (v ^ (v >> 8)) & _M16
    v = (v ^ (v >> 16)) & _M0
    return v


def interleave3(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Interleave 16-bit axes into an (..., 2) int32 [hi, lo] code pair."""
    lo = (
        (_part1by2_32(x & 0xFF) << 2)
        | (_part1by2_32(y & 0xFF) << 1)
        | _part1by2_32(z & 0xFF)
    )
    hi = (
        (_part1by2_32((x >> 8) & 0xFF) << 2)
        | (_part1by2_32((y >> 8) & 0xFF) << 1)
        | _part1by2_32((z >> 8) & 0xFF)
    )
    return jnp.stack([hi, lo], axis=-1)


def deinterleave3(code: jnp.ndarray):
    """(..., 2) int32 [hi, lo] -> 16-bit x, y, z."""
    hi, lo = code[..., 0], code[..., 1]
    x = _compact1by2_32(lo >> 2) | (_compact1by2_32(hi >> 2) << 8)
    y = _compact1by2_32(lo >> 1) | (_compact1by2_32(hi >> 1) << 8)
    z = _compact1by2_32(lo) | (_compact1by2_32(hi) << 8)
    return x, y, z


def z_encode(grid_coord: jnp.ndarray, depth: int = 16) -> jnp.ndarray:
    """(N, 3) non-negative grid coords -> (N, 2) int32 [hi, lo] Morton codes."""
    mask = (1 << depth) - 1
    return interleave3(
        grid_coord[..., 0].astype(jnp.uint32) & mask,
        grid_coord[..., 1].astype(jnp.uint32) & mask,
        grid_coord[..., 2].astype(jnp.uint32) & mask,
    )


def z_decode(code: jnp.ndarray, depth: int = 16) -> jnp.ndarray:
    """(N, 2) int32 Morton codes -> (N, 3) int32 grid coords."""
    x, y, z = deinterleave3(code)
    mask = (1 << depth) - 1
    return jnp.stack([x & mask, y & mask, z & mask], axis=-1).astype(jnp.int32)


def code_argsort(code: jnp.ndarray) -> jnp.ndarray:
    """Stable ascending order of (hi, lo) code pairs -> (N,) int32 perm.

    One ``lax.sort`` with two keys (lexicographic), iota as payload.
    """
    n = code.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    _, _, perm = jax.lax.sort(
        (code[:, 0], code[:, 1], iota), num_keys=2, is_stable=True
    )
    return perm
