"""Hilbert-curve codes via Skilling's transpose algorithm, jnp uint32.

The reference uses a bit-unpacked torch implementation of the same Skilling
(2004) construction (``serialization/hilbert.py``); here the algorithm runs
directly on packed uint32 coordinate vectors with statically unrolled bit
loops — branch-free ``where`` selects instead of data-dependent branches, so
the whole codec is a flat chain of VPU integer ops.  Codes are (hi, lo)
uint32 pairs (see ``zorder.py``); the pipeline needs ``num_bits <= 16``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .zorder import deinterleave3, interleave3


def _axes_to_transpose(x, y, z, num_bits: int):
    """Skilling AxesToTranspose: Hilbert transpose-form coordinates."""
    X = [x.astype(jnp.uint32), y.astype(jnp.uint32), z.astype(jnp.uint32)]

    # inverse-undo excess work
    Q = 1 << (num_bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(3):
            has = (X[i] & Q) != 0
            t = jnp.where(has, 0, (X[0] ^ X[i]) & P)
            x0_new = jnp.where(has, X[0] ^ P, X[0] ^ t)
            xi_new = X[i] ^ t
            if i == 0:
                X[0] = x0_new
            else:
                X[i] = xi_new
                X[0] = x0_new
        Q >>= 1

    # Gray encode
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[0])
    Q = 1 << (num_bits - 1)
    while Q > 1:
        t = jnp.where((X[2] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    return [xi ^ t for xi in X]


def _transpose_to_axes(X, num_bits: int):
    """Skilling TransposeToAxes (inverse of :func:`_axes_to_transpose`)."""
    X = [xi.astype(jnp.uint32) for xi in X]
    N = 2 << (num_bits - 1)

    # Gray decode
    t = X[2] >> 1
    X[2] = X[2] ^ X[1]
    X[1] = X[1] ^ X[0]
    X[0] = X[0] ^ t

    # undo excess work
    Q = 2
    while Q != N:
        P = Q - 1
        for i in range(2, -1, -1):
            has = (X[i] & Q) != 0
            t = jnp.where(has, 0, (X[0] ^ X[i]) & P)
            x0_new = jnp.where(has, X[0] ^ P, X[0] ^ t)
            xi_new = X[i] ^ t
            if i == 0:
                X[0] = x0_new
            else:
                X[i] = xi_new
                X[0] = x0_new
        Q <<= 1
    return X


def hilbert_encode(grid_coord: jnp.ndarray, num_bits: int = 16) -> jnp.ndarray:
    """(N, 3) grid coords -> (N, 2) int32 [hi, lo] Hilbert codes."""
    mask = (1 << num_bits) - 1
    X = _axes_to_transpose(
        grid_coord[..., 0].astype(jnp.uint32) & mask,
        grid_coord[..., 1].astype(jnp.uint32) & mask,
        grid_coord[..., 2].astype(jnp.uint32) & mask,
        num_bits,
    )
    # pack transpose-form: bit b of X[0] -> code bit 3b+2, X[1] -> 3b+1, X[2] -> 3b
    return interleave3(X[0], X[1], X[2])


def hilbert_decode(code: jnp.ndarray, num_bits: int = 16) -> jnp.ndarray:
    """(N, 2) int32 Hilbert codes -> (N, 3) int32 grid coords."""
    x, y, z = deinterleave3(code)
    axes = _transpose_to_axes([x, y, z], num_bits)
    return jnp.stack(axes, axis=-1).astype(jnp.int32)
