"""LaRa-style volume transformer backbone + Gaussian decoder heads, Flax.

Channels-last throughout (TPU-native layout); parity notes cite the
reference ``lightning/network.py``:

  * :class:`ModLN`            — adaLN ray-direction modulation (:218-241)
  * :class:`GroupAttBlock`    — group cross-attention volume block (:85-130)
  * :class:`VolTransformer`   — 12-layer volume transformer + 2x deconv
                                 (:133-192)
  * :class:`GaussianDecoder`  — coarse per-voxel head + fine cross-attention
                                 head (:243-316)
  * :func:`project_points` / :func:`bilinear_sample` / grid builders
                                 (:210-215, :689-723)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


# --------------------------------------------------------------------------
# geometry helpers
# --------------------------------------------------------------------------


def build_dense_grid(reso: int, scene_size: float = 0.5) -> jnp.ndarray:
    """(reso³, 3) voxel-center world coordinates in ±scene_size
    (``network.py:689-693``)."""
    a = (jnp.arange(reso, dtype=jnp.float32) + 0.5) / reso * 2.0 - 1.0
    g = jnp.stack(jnp.meshgrid(a, a, a, indexing="ij"), axis=-1)
    return (g * scene_size).reshape(-1, 3)


def project_points(points: jnp.ndarray, w2cs: jnp.ndarray, ixts: jnp.ndarray):
    """Project world points into V views (``network.py:210-215``).

    points (..., 3), w2cs (V, 4, 4), ixts (V, 3, 3) ->
    xy (V, ..., 2) pixel coords, z (V, ..., 1) view depth.
    """
    p = jnp.einsum("nc,vdc->vnd", points.reshape(-1, 3), w2cs[:, :3, :3])
    p = p + w2cs[:, None, :3, 3]
    p = jnp.einsum("vnc,vdc->vnd", p, ixts)
    xy = p[..., :2] / p[..., 2:3]
    return xy, p[..., 2:3]


def bilinear_sample(img: jnp.ndarray, xy_norm: jnp.ndarray) -> jnp.ndarray:
    """``F.grid_sample(align_corners=False, zeros padding)`` equivalent.

    img (H, W, C); xy_norm (..., 2) in [-1, 1]. -> (..., C).
    """
    H, W, C = img.shape
    x = ((xy_norm[..., 0] + 1.0) * W - 1.0) * 0.5
    y = ((xy_norm[..., 1] + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        v = img[yi_c, xi_c]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


# --------------------------------------------------------------------------
# modules
# --------------------------------------------------------------------------


class ModLN(nn.Module):
    """adaLN modulation: ``LN(x) * (1 + scale) + shift`` with shift/scale
    from SiLU+Linear over the conditioning (``network.py:218-241``)."""

    inner_dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        mod = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="mlp")(
            nn.silu(cond).astype(self.dtype)
        )
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(x)
        return x * (1 + scale) + shift


class CrossAttention(nn.Module):
    """Multi-head cross-attention with separate kv input dim, no biases
    (torch ``nn.MultiheadAttention(kdim=vdim=cond_dim, bias=False)``)."""

    dim: int
    num_heads: int
    kv_dim: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in):
        H = self.num_heads
        D = self.dim // H
        q_in = q_in.astype(self.dtype)
        kv_in = kv_in.astype(self.dtype)
        q = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype, name="q")(q_in)
        k = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype, name="v")(kv_in)
        q = q.reshape(*q.shape[:-1], H, D)
        k = k.reshape(*k.shape[:-1], H, D)
        v = v.reshape(*v.shape[:-1], H, D)
        # fp32 softmax island (bf16-mixed policy)
        attn = jnp.einsum(
            "...qhd,...khd->...hqk", q, k,
            preferred_element_type=jnp.float32,
        ) * (D**-0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = out.reshape(*out.shape[:-2], self.dim)
        return nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype, name="out")(out)


def _unfold3d(x: jnp.ndarray, g: int, bs: int) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, g³, bs³, C) blocks, group-major/voxel-minor."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, g, bs, g, bs, g, bs, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, g**3, bs**3, C)


def _fold3d(p: jnp.ndarray, g: int, bs: int) -> jnp.ndarray:
    """Inverse of :func:`_unfold3d`."""
    B = p.shape[0]
    C = p.shape[-1]
    x = p.reshape(B, g, g, g, bs, bs, bs, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, g * bs, g * bs, g * bs, C)


class GroupAttBlock(nn.Module):
    """Volume transformer layer (``network.py:85-130``): per-group cross
    attention from block voxel tokens to that group's image-feature tokens,
    MLP, then a 3³ conv residual over the refolded volume."""

    inner_dim: int
    cond_dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, group_axis: int, block_size: int):
        """x: (B, D, H, W, C); cond: (B, g³, L_cond, cond_dim)."""
        B = x.shape[0]
        g, bs = group_axis, block_size
        x = x.astype(self.dtype)
        patches = _unfold3d(x, g, bs)                  # (B, g³, bs³, C)

        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm1")(patches)
        h = CrossAttention(
            self.inner_dim, self.num_heads, self.cond_dim,
            dtype=self.dtype, name="cross_attn"
        )(h, cond)
        patches = patches + h

        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm2")(patches)
        h = nn.Dense(int(self.inner_dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.inner_dim, dtype=self.dtype, name="mlp_fc2")(h)
        patches = patches + h

        patches = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm3")(patches)
        vol = _fold3d(patches, g, bs)                  # (B, D, H, W, C)
        vol = vol + nn.Conv(
            self.inner_dim, (3, 3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="cnn",
        )(vol)
        return vol


class VolTransformer(nn.Module):
    """Learned 32³ positional volume refined by ``num_layers`` group-attention
    blocks, upsampled 2x by a transposed conv (``network.py:133-192``)."""

    embed_dim: int = 256
    image_feat_dim: int = 800
    n_groups: tuple = (16,)
    vol_low_res: int = 32
    out_dim: int = 80
    num_layers: int = 12
    num_heads: int = 16
    eps: float = 1e-6
    remat: bool = True  # rematerialize blocks (activation memory)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_feats):
        """image_feats: (B, V, D, H, W, C_img) -> (B, (2R)³, out_dim)."""
        B, V, D, H, W, C = image_feats.shape
        R = self.vol_low_res

        # pre-block the conditioning per group config
        conds = []
        for n_group in self.n_groups:
            bs = D // n_group
            blk = _unfold3d(
                image_feats.reshape(B * V, D, H, W, C), n_group, bs
            ).reshape(B, V, n_group**3, bs**3, C)
            blk = blk.transpose(0, 2, 1, 3, 4).reshape(
                B, n_group**3, V * bs**3, C
            )
            conds.append(blk)

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(self.embed_dim**-0.5),
            (1, R, R, R, self.embed_dim),
        )
        x = jnp.broadcast_to(pos, (B, R, R, R, self.embed_dim))

        conds = [c.astype(self.dtype) for c in conds]
        x = x.astype(self.dtype)
        block_sizes = [R // n for n in self.n_groups]
        block_cls = (
            nn.remat(GroupAttBlock, static_argnums=(3, 4))
            if self.remat else GroupAttBlock
        )
        for i in range(self.num_layers):
            gi = i % len(self.n_groups)
            x = block_cls(
                self.embed_dim,
                self.image_feat_dim,
                self.num_heads,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, conds[gi], self.n_groups[gi], block_sizes[gi])

        # final norm + deconv in f32: feeds the (f32) Gaussian heads
        x = nn.LayerNorm(epsilon=self.eps, name="norm")(x.astype(jnp.float32))
        x = nn.ConvTranspose(
            self.out_dim, (2, 2, 2), strides=(2, 2, 2), name="deconv"
        )(x)
        return x.reshape(B, -1, self.out_dim)


class GaussianDecoder(nn.Module):
    """Coarse + fine Gaussian attribute heads (``network.py:243-316``)."""

    in_dim: int = 80
    sh_dim: int = 12
    scaling_dim: int = 3
    rotation_dim: int = 4
    opacity_dim: int = 1
    K: int = 1
    fine_cond_dim: int = 8
    fine_heads: int = 16

    @property
    def out_dim(self) -> int:
        return 3 + self.sh_dim + self.opacity_dim + self.scaling_dim + self.rotation_dim

    def setup(self):
        xavier = nn.initializers.xavier_uniform()
        self.coarse_fc0 = nn.Dense(self.in_dim, kernel_init=xavier)
        self.coarse_fc1 = nn.Dense(self.in_dim, kernel_init=xavier)
        self.coarse_out = nn.Dense(self.out_dim * self.K, kernel_init=xavier)
        self.fine_norm = nn.LayerNorm()
        self.fine_cross = CrossAttention(
            self.in_dim, self.fine_heads, self.fine_cond_dim
        )
        self.fine_fc0 = nn.Dense(self.in_dim, kernel_init=xavier)
        self.fine_out = nn.Dense(self.in_dim + self.sh_dim, kernel_init=xavier)

    def __call__(self, feats, opacity_shift, scaling_shift):
        return self.coarse(feats, opacity_shift, scaling_shift)

    def coarse(self, feats, opacity_shift, scaling_shift):
        """(B, N, 80) -> offset, sh, scaling, rotation, opacity
        (``forward_coarse``, :292-310; sigmoid*2-1 offsets, head shifts)."""
        x = nn.relu(self.coarse_fc0(feats))
        x = nn.relu(self.coarse_fc1(x))
        x = self.coarse_out(x)
        x = x.reshape(*x.shape[:-1], self.K, self.out_dim).astype(jnp.float32)

        offset, sh, opacity, scaling, rotation = jnp.split(
            x,
            [3, 3 + self.sh_dim, 4 + self.sh_dim, 7 + self.sh_dim],
            axis=-1,
        )
        offset = jax.nn.sigmoid(offset) * 2.0 - 1.0
        opacity = opacity + opacity_shift
        scaling = scaling + scaling_shift

        B = x.shape[0]
        return (
            offset.reshape(B, -1, 3),
            sh.reshape(B, -1, self.sh_dim // 3, 3),
            scaling.reshape(B, -1, self.scaling_dim),
            rotation.reshape(B, -1, self.rotation_dim),
            opacity.reshape(B, -1, self.opacity_dim),
        )

    def fine(self, volume_feat, point_feats):
        """(.., M, 80) queries vs (.., M, V, 8) per-view samples ->
        (fine feature 80, SH residual 12) (``forward_fine``, :312-316)."""
        q = self.fine_norm(volume_feat)[..., None, :]
        x = self.fine_cross(q, point_feats)[..., 0, :]
        x = nn.relu(self.fine_fc0(x))
        x = self.fine_out(x).astype(jnp.float32)
        return x[..., : self.in_dim], x[..., self.in_dim:]
