"""ViT-B/16 image encoder (DINO v1 architecture), Flax.

Replaces the reference's timm ``vit_base_patch16_224.dino`` wrapper
(``lightning/network.py:42-83``).  Same architecture: 16x16 conv patch
embed, prepended CLS token, learned positional embeddings (base 14x14 grid,
bicubically resized for other resolutions — timm's ``dynamic_img_size``),
12 pre-norm blocks (768 dim, 12 heads, MLP x4, LN eps 1e-6).

Pretrained DINO weights cannot be fetched in this environment; the encoder
trains from scratch by default, and ``tools/convert_torch_ckpt.py`` maps a
torch checkpoint (e.g. the reference's released ``epoch=49.ckpt``, which
embeds the finetuned ViT) onto these parameters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

DINO_MEAN = (0.485, 0.456, 0.406)
DINO_STD = (0.229, 0.224, 0.225)


class BlockedSelfAttention(nn.Module):
    """Self-attention computed in QUERY blocks (exact: softmax is
    per-query-row, so blocking queries changes nothing numerically).

    Drop-in for ``nn.MultiHeadDotProductAttention(name="attn")`` with the
    SAME parameter tree (``query/key/value/out`` DenseGeneral leaves, so
    the torch-checkpoint converter mapping is unchanged).  Motivation
    (r5): the full (B·V, H, L, L) attention matrices at L=1025 tokens are
    the B=3 flagship's largest allocations (653MB f32 + two bf16 halves
    per live block); blocking queries at ``q_block`` caps them at
    nb-times less, and the ``lax.map`` backward re-materializes per
    block.  fp32 softmax island as before.
    """

    dim: int
    num_heads: int
    q_block: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, L, _ = x.shape
        H = self.num_heads
        Dh = self.dim // H
        dg = lambda name: nn.DenseGeneral(
            (H, Dh), dtype=self.dtype, name=name
        )
        q = dg("query")(x) / jnp.sqrt(Dh).astype(self.dtype)
        k = dg("key")(x)
        v = dg("value")(x)                          # (B, L, H, Dh)

        pad = (-L) % self.q_block
        nb = (L + pad) // self.q_block
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        qb = qp.reshape(B, nb, self.q_block, H, Dh).transpose(1, 0, 2, 3, 4)

        def blk(qi):  # (B, Qb, H, Dh); keys/values closed over, unpadded
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", qi, k,
                preferred_element_type=jnp.float32,
            )
            w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", w, v)

        out = jax.lax.map(blk, qb)                  # (nb, B, Qb, H, Dh)
        out = out.transpose(1, 0, 2, 3, 4).reshape(B, L + pad, H, Dh)[:, :L]
        return nn.DenseGeneral(
            self.dim, axis=(-2, -1), dtype=self.dtype, name="out"
        )(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    dtype: Any = jnp.float32  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        import os as _os

        h = BlockedSelfAttention(
            self.dim, self.num_heads,
            q_block=int(_os.environ.get("GD_VIT_QB", "128")),  # A/B knob
            dtype=self.dtype, name="attn",
        )(h)
        x = x + h
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    """Patch-embed ViT returning all tokens (CLS first)."""

    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    base_grid: int = 14  # pos-embed grid at the 224^2 pretraining size
    eps: float = 1e-6
    remat: bool = True   # rematerialize blocks (512² x 4 views of saved
                         # attention activations OOM a 16GB chip otherwise)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        """images: (B, H, W, 3) already normalized. -> (B, 1+L, dim)."""
        B, H, W, _ = images.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        x = x.reshape(B, gh * gw, self.dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.base_grid * self.base_grid + 1, self.dim),
        )
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.base_grid, self.base_grid):
            grid_pos = jax.image.resize(
                grid_pos.reshape(1, self.base_grid, self.base_grid, self.dim),
                (1, gh, gw, self.dim),
                method="bicubic",
            ).reshape(1, gh * gw, self.dim)

        x = x + grid_pos.astype(x.dtype)
        cls_tok = jnp.broadcast_to(cls + cls_pos, (B, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls_tok, x], axis=1)

        block_cls = nn.remat(ViTBlock) if self.remat else ViTBlock
        for i in range(self.depth):
            x = block_cls(
                self.dim, self.num_heads, self.mlp_ratio, self.eps,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, deterministic)
        # final norm in f32: the token features feed the (f32) volume lift
        return nn.LayerNorm(epsilon=self.eps, name="norm")(x.astype(jnp.float32))


class DinoEncoder(nn.Module):
    """DinoWrapper equivalent: normalize, encode, drop CLS.

    (``network.py:51-57``: [0,1] RGB -> timm normalize -> forward_features
    -> drop CLS token.)
    """

    variant: str = "vit_base_patch16_224.dino"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        """images: (B, H, W, 3) in [0, 1]. -> (B, L, C) patch tokens."""
        if "vit_base" in self.variant:
            dim, depth, heads = 768, 12, 12
        elif "vit_small" in self.variant:
            dim, depth, heads = 384, 12, 6
        elif "tiny_test" in self.variant:  # CPU-test stub
            dim, depth, heads = 32, 1, 2
        else:
            raise NotImplementedError(f"unknown ViT variant {self.variant!r}")
        mean = jnp.asarray(DINO_MEAN)
        std = jnp.asarray(DINO_STD)
        x = ((images - mean) / std).astype(self.dtype)
        tokens = VisionTransformer(
            dim=dim, depth=depth, num_heads=heads, dtype=self.dtype, name="vit"
        )(x, deterministic)
        return tokens[:, 1:]

    @property
    def num_features(self) -> int:
        if "tiny_test" in self.variant:
            return 32
        return 384 if "vit_small" in self.variant else 768
