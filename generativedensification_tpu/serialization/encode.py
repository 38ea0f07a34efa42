"""Order dispatch + batch packing (reference ``default.py:8-38`` contract).

A code is an (N, 2) uint32 ``[hi, lo]`` pair.  The batch index is packed into
``hi`` above the coordinate bits, so a single lexicographic (hi, lo) sort
orders points by (batch, curve position) — the reference packs batch above
``3*depth`` bits of an int64 (``default.py:21-24``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .hilbert import hilbert_decode, hilbert_encode
from .zorder import LO_BITS, code_argsort, z_decode, z_encode

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def encode(
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray | None = None,
    depth: int = 16,
    order: str = "z",
) -> jnp.ndarray:
    """(N, 3) grid coords (+ optional (N,) batch) -> (N, 2) uint32 code pairs."""
    if order not in ORDERS:
        raise NotImplementedError(f"unknown order {order!r}; use one of {ORDERS}")
    if depth > 16:
        raise ValueError(f"depth must be <= 16, got {depth}")
    gc = grid_coord
    if order.endswith("-trans"):
        gc = gc[..., jnp.array([1, 0, 2])]
    if order.startswith("z"):
        code = z_encode(gc, depth=depth)
    else:
        code = hilbert_encode(gc, num_bits=depth)
    if batch is not None:
        hi_coord_bits = max(3 * depth - LO_BITS, 0)
        assert hi_coord_bits < 28, "batch bits would overflow int32 hi word"
        hi = code[..., 0] | (batch.astype(jnp.uint32) << hi_coord_bits)
        code = jnp.stack([hi, code[..., 1]], axis=-1)
    return code


def decode(code: jnp.ndarray, depth: int = 16, order: str = "z"):
    """(N, 2) uint32 code pairs -> ((N, 3) grid coords, (N,) batch index)."""
    if order not in ("z", "hilbert"):
        raise NotImplementedError(f"decode supports 'z'/'hilbert', got {order!r}")
    hi_coord_bits = max(3 * depth - LO_BITS, 0)
    batch = (code[..., 0] >> hi_coord_bits).astype(jnp.int32)
    hi = code[..., 0] & jnp.uint32((1 << hi_coord_bits) - 1)
    code = jnp.stack([hi, code[..., 1]], axis=-1)
    if order == "z":
        gc = z_decode(code, depth=depth)
    else:
        gc = hilbert_decode(code, num_bits=depth)
    return gc, batch.astype(jnp.int32)


__all__ = ["encode", "decode", "ORDERS", "code_argsort"]
