"""Space-filling-curve serialization codecs (z-order + Hilbert), jnp-native.

Replaces the reference's LUT-based codecs
(``point_decoder/utils/serialization/``) with branch-free integer bit
manipulation that vectorizes on the VPU: magic-number bit spreading for
Morton codes and Skilling's transpose algorithm for Hilbert curves.

Bit-layout parity with the reference (``z_order.py:41-50``,
``default.py:21-24``): bit ``i`` of x lands at ``3i+2``, y at ``3i+1``,
z at ``3i``; the batch index is packed above ``3*depth`` bits; the
"-trans" orders swap the x and y axes before encoding.
"""

from .zorder import z_encode, z_decode, code_argsort, interleave3, deinterleave3
from .hilbert import hilbert_encode, hilbert_decode
from .encode import encode, decode, ORDERS

__all__ = [
    "z_encode",
    "z_decode",
    "code_argsort",
    "interleave3",
    "deinterleave3",
    "hilbert_encode",
    "hilbert_decode",
    "encode",
    "decode",
    "ORDERS",
]
