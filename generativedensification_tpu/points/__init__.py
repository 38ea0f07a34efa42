"""Batched fixed-budget point-cloud stack (the densification decoder's data
plane).

TPU-first redesign of the reference's CSR ``Point`` structure
(``point_decoder/utils/structure.py``): instead of a flat ragged
concatenation with offset arrays, a :class:`PointSet` is a dense
``(B, N, ...)`` pytree with a validity mask and *static* per-stage point
budgets — every top-k, split, and upscale produces a statically-shaped
array, so the whole decoder jits once and never recompiles
(SURVEY.md §7.3.2).  Batch handling is a leading dim (``vmap``), which
deletes the reference's segment-CSR machinery (``torch_scatter`` etc.,
SURVEY.md §2.9.6-7) outright.
"""

from .structure import PointSet, serialize_pointset
from .ops import (
    masked_layer_norm,
    masked_mean,
    masked_softmax,
    topk_mask,
    topk_split,
)

__all__ = [
    "PointSet",
    "serialize_pointset",
    "masked_layer_norm",
    "masked_mean",
    "masked_softmax",
    "topk_mask",
    "topk_split",
]
