"""Masked batched point ops: the segment-op replacements.

Every ``torch_scatter``/``torch_geometric`` segment primitive of the
reference (SURVEY.md §2.9.6-7) reduces to a plain masked op over the dense
``(B, N, ...)`` layout:
  * ``segment_csr`` mean  ->  :func:`masked_mean`
  * per-batch ``pyg_softmax`` (``autoencoder.py:734-740``) ->
    :func:`masked_softmax`
  * batched ``top_k`` (``autoencoder.py:517-545``) -> :func:`topk_split`
    with a *static* k, returning order-preserving index sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Mean of x over `axis` counting only masked-in entries."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    s = jnp.sum(x * m, axis=axis)
    n = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return s / n


def masked_layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-point channel LayerNorm without affine params.

    (The reference decoder's ``ln_layer`` is
    ``nn.LayerNorm(elementwise_affine=False)``, ``network.py:430-433``.)
    """
    x32 = x.astype(jnp.float32)  # fp32 stats island (bf16-mixed policy)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Softmax over `axis` with invalid entries excluded (prob 0)."""
    z = jnp.where(mask, logits, NEG_INF)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=axis, keepdims=True))
    e = jnp.exp(z) * mask.astype(logits.dtype)
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-20)


def topk_mask(score: jnp.ndarray, mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, N) scores -> (B, N) bool mask of the per-sample top-k valid."""
    s = jnp.where(mask, score, NEG_INF)
    _, idx = jax.lax.top_k(s, k)
    out = jnp.zeros_like(mask)
    return out.at[jnp.arange(score.shape[0])[:, None], idx].set(True) & mask


def topk_split(score: jnp.ndarray, mask: jnp.ndarray, k: int):
    """Split N points into per-sample (top-k, rest) index sets.

    Both index sets preserve the original point order (the reference's
    ``top_k`` returns a boolean mask over the original order,
    ``autoencoder.py:517-545``, so subset order == original order).

    Returns:
      top_idx (B, k) int32, rest_idx (B, N-k) int32,
      top_valid (B, k) bool, rest_valid (B, N-k) bool.
    """
    B, N = score.shape
    s = jnp.where(mask, score, NEG_INF)
    _, idx = jax.lax.top_k(s, k)                      # (B, k), score order
    top_idx = jnp.sort(idx, axis=1)                   # original order
    is_top = jnp.zeros((B, N), bool).at[
        jnp.arange(B)[:, None], top_idx
    ].set(True)
    # stable argsort of is_top: False (rest) first, original order preserved
    rest_order = jnp.argsort(is_top.astype(jnp.int32), axis=1, stable=True)
    rest_idx = rest_order[:, : N - k].astype(jnp.int32)
    take = lambda i: jnp.take_along_axis(mask, i, axis=1)
    return top_idx.astype(jnp.int32), rest_idx, take(top_idx), take(rest_idx)


def top_p_mask(prob: jnp.ndarray, mask: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """Nucleus mask: per-sample descending-sorted *inclusive* cumsum of
    probs <= ratio (the reference ``top_p``, ``autoencoder.py:548-612``,
    whose sparse-matmul group-cumsum is just a segment cumsum).

    Static-shape port: instead of materializing variable-size subsets, the
    caller keeps both point sets at full size N and carries this mask /
    its complement as validity — exact semantics, no dynamic shapes.
    """
    B, N = prob.shape
    neg = jnp.where(mask, prob, NEG_INF)
    order = jnp.argsort(-neg, axis=1)
    p_sorted = jnp.take_along_axis(jnp.where(mask, prob, 0.0), order, axis=1)
    cum = jnp.cumsum(p_sorted.astype(jnp.float32), axis=1)
    nuc_sorted = cum <= ratio
    nucleus = jnp.zeros((B, N), bool).at[
        jnp.arange(B)[:, None], order
    ].set(nuc_sorted)
    return nucleus & mask


def straight_through(feat: jnp.ndarray, prob: jnp.ndarray) -> jnp.ndarray:
    """ST estimator of ``MaskModule`` (``autoencoder.py:674-676``):
    value = feat, gradient flows through feat * prob."""
    soft = feat * prob[..., None]
    return jax.lax.stop_gradient(feat - soft) + soft


def straight_through_res(feat: jnp.ndarray, prob: jnp.ndarray, hard: jnp.ndarray) -> jnp.ndarray:
    """Residual-path ST (``autoencoder.py:776``):
    value = feat * hard_mask, gradient through feat * prob."""
    soft = feat * prob[..., None]
    hardv = feat * hard[..., None].astype(feat.dtype)
    return jax.lax.stop_gradient(hardv - soft) + soft
