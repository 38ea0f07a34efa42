"""Flax modules of the point-serialization densification decoder.

Architectural parity with the reference ``point_decoder/autoencoder.py``
(file:line cites inline), re-expressed over the dense batched
:class:`~generativedensification_tpu.points.structure.PointSet`:

  * ``WindowAttention`` — the ``SerializedAttention`` equivalent.  After the
    static-budget design every sample's point count is a multiple of the
    patch size, so "varlen flash attention + tail-replication padding"
    (``autoencoder.py:127-235``) collapses to a plain
    ``(B, nWin, K, H, D)`` batched attention that XLA maps straight onto
    the MXU; invalid points sort to the tail and are masked.
  * ``NeighborConvCPE`` — the spconv ``SubMConv3d`` xCPE
    (``autoencoder.py:290-300``) as a gather + 27-tap contraction over the
    precomputed neighbor table.
  * ``Block``, ``GlobalPooling``, ``UpscaleModule``, ``MaskModule``,
    ``GaussianModule`` + residual variants mirror ``autoencoder.py``
    (see class docstrings).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .ops import (
    NEG_INF,
    masked_layer_norm,
    masked_mean,
    masked_softmax,
    straight_through,
    straight_through_res,
    top_p_mask,
    topk_split,
)
from .structure import PointSet, gather_points


class PDNorm(nn.Module):
    """Prompt-driven normalization (Pointcept PPT): per-dataset-condition
    affine over the shared LayerNorm statistics, selected by the point
    set's static condition index.

    Parity: ``point_prompt_training/prompt_driven_normalization.py:6-44``
    with decouple=True, adaptive=False — the only mode reachable from the
    reference config (``pdnorm_decouple: True``, ``pdnorm_adaptive:
    False``).  A per-condition ``nn.LayerNorm(affine=True)`` equals a
    shared (param-free) LN followed by that condition's affine.
    """

    dim: int
    n_conditions: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: int = 0) -> jnp.ndarray:
        scale = self.param(
            "scale", nn.initializers.ones, (self.n_conditions, self.dim)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.n_conditions, self.dim)
        )
        return masked_layer_norm(x) * scale[condition] + bias[condition]


class AdaLayerNorm(nn.Module):
    """Global-feature-modulated LayerNorm: ``affine(global_feat) *
    LN_noaffine(feat)`` with the affine broadcast to every point of the
    sample (``layers/normalization.py:77-93`` — multiplicative only, no
    shift; the CSR ``gather_csr`` broadcast becomes a (B, 1, C) broadcast
    over the batched point layout).

    Only the legacy AutoEncoder substitutes this norm
    (``autoencoder.py:1345-1349``); the main Network path's
    ``enable_ada_lnnorm`` merely inserts ``GlobalPooling`` (SURVEY §2.4
    note) — provided for component parity.
    """

    dim: int

    @nn.compact
    def __call__(self, feat: jnp.ndarray, global_feat: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(self.dim, name="affine")(global_feat)
        return mod[:, None, :] * masked_layer_norm(feat)


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate <= 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        key = self.make_rng("dropout")
        mask = jax.random.bernoulli(key, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class PointMLP(nn.Module):
    """MLP(ratio) block (``autoencoder.py`` MLP: fc-act-drop-fc-drop)."""

    hidden: int
    out: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class WindowAttention(nn.Module):
    """Windowed attention over one serialized order.

    ``SerializedAttention`` parity (``autoencoder.py:64-235``): joint qkv
    projection (bias per qkv_bias), scale = head_dim^-0.5 (qk_scale
    override), per-window softmax attention, output projection + dropout.
    Window size = patch_size (static); invalid tail points are masked out
    of the softmax.
    """

    channels: int
    num_heads: int
    patch_size: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    order_index: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ps: PointSet, deterministic: bool = True) -> jnp.ndarray:
        B, N, C = ps.feat.shape
        H = self.num_heads
        K = self.patch_size
        D = C // H
        assert N % K == 0, f"point budget {N} must be a multiple of patch {K}"
        nw = N // K
        scale = self.qk_scale or D**-0.5

        order = ps.orders[self.order_index]      # (B, N)
        inverse = ps.inverses[self.order_index]  # (B, N)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(
            ps.feat.astype(self.dtype)
        )
        qkv = jnp.take_along_axis(qkv, order[..., None], axis=1)
        kmask = jnp.take_along_axis(ps.mask, order, axis=1)  # (B, N)

        qkv = qkv.reshape(B, nw, K, 3, H, D).transpose(3, 0, 1, 4, 2, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (B, nw, H, K, D)

        attn = jnp.einsum(
            "bwhkd,bwhjd->bwhkj", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        key_ok = kmask.reshape(B, nw, 1, 1, K)
        attn = jnp.where(key_ok, attn, NEG_INF)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("bwhkj,bwhjd->bwhkd", attn.astype(v.dtype), v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(B, N, C)
        out = jnp.take_along_axis(out, inverse[..., None], axis=1)

        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def neighbor_conv27(feat, nbr, w, compute_dtype):
    """27-tap submanifold gather-contraction with a scatter-free backward.

    Forward: ``y[b,n,:] = Σ_o W[o] @ feat[b, nbr[b,n,o], :]`` (misses
    ``nbr < 0`` contribute zero).

    Custom VJP: autodiff's feat-gradient is a 27N-row scatter-add
    (9.5 ms per CPE layer at 19k points on TPU — row scatters serialize,
    r5 step trace).  The hand-written backward exploits the 3³ offset
    symmetry of the neighbor table (``offs[26-o] = -offs[o]``, so
    ``nbr[n,o] = m  ⟺  nbr[m, 26-o] = n`` *between voxel
    representatives*): the adjoint is ANOTHER 27-tap gather-contraction
    with the tap-reversed kernel, applied to per-voxel cotangent sums.
    The only scatter left is the N-row representative sum (27x fewer
    rows), which is the identity when voxels are singly occupied.
    """
    B, N, C = feat.shape
    D = w.shape[-1]

    # scan over taps: the materialized (B, N, 27, C) gather was the B=3
    # flagship's largest HLO temp (900MB per CPE layer, r5); per-tap the
    # working set is (B, N, C) and the tap sum accumulates in f32
    def tap(acc, xo):
        nbr_o, w_o = xo                              # (B, N), (C, D)
        g = jnp.take_along_axis(feat, jnp.maximum(nbr_o, 0)[..., None],
                                axis=1)
        g = jnp.where((nbr_o >= 0)[..., None], g, 0.0).astype(compute_dtype)
        return acc + jnp.einsum(
            "bnc,cd->bnd", g, w_o.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ), None

    acc0 = jnp.zeros((B, N, D), jnp.float32)
    # measured: unroll=3 is a wash at B=1 (994.0 vs 994.1 ms step — the
    # scan bodies are real work, not loop overhead); unroll=1 keeps the
    # verified B=3 memory fit
    y, _ = jax.lax.scan(tap, acc0, (jnp.moveaxis(nbr, -1, 0), w))
    return y.astype(compute_dtype)


def _nc27_fwd(feat, nbr, w, compute_dtype):
    return neighbor_conv27(feat, nbr, w, compute_dtype), (feat, nbr, w)


def _nc27_bwd(compute_dtype, res, ct):
    import numpy as np

    feat, nbr, w = res
    B, N, C = feat.shape

    # -- per-voxel cotangent sums at the REPRESENTATIVE rows
    # (nbr[:, :, 13] is each point's own voxel representative).
    # Non-representative co-voxel points are never read by the forward,
    # so their gradient is zero.
    rep = nbr[..., 13]                                   # (B, N)
    off = jnp.arange(B, dtype=jnp.int32)[:, None] * N
    tgt = jnp.where(rep >= 0, rep + off, B * N)
    ct_f = ct.astype(feat.dtype).reshape(B * N, -1)
    ct_sum = (
        jnp.zeros((B * N, ct_f.shape[-1]), ct_f.dtype)
        .at[tgt.reshape(-1)]
        .add(ct_f, mode="drop")
        .reshape(B, N, -1)
    )
    ct_c = ct.astype(compute_dtype)

    # scan over taps (same working-set rationale as the forward): per tap
    # o, the kernel grad is the tap's gather against ct, and the feature
    # grad accumulates the tap-REVERSED contraction over ct_sum
    # (``offs[26-o] = -offs[o]`` symmetry between voxel representatives).
    def tap(acc, xo):
        nbr_o, nbr_rev_o, w_rev_o = xo     # (B,N), (B,N), (C,D)
        fg_acc = acc
        g = jnp.take_along_axis(feat, jnp.maximum(nbr_o, 0)[..., None],
                                axis=1)
        g = jnp.where((nbr_o >= 0)[..., None], g, 0.0).astype(compute_dtype)
        wg_o = jnp.einsum("bnc,bnd->cd", g, ct_c,
                          preferred_element_type=jnp.float32)
        cn = jnp.take_along_axis(ct_sum, jnp.maximum(nbr_rev_o, 0)[..., None],
                                 axis=1)
        cn = jnp.where((nbr_rev_o >= 0)[..., None], cn, 0.0).astype(
            compute_dtype)
        fg_acc = fg_acc + jnp.einsum(
            "bnd,cd->bnc", cn, w_rev_o.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return fg_acc, wg_o

    nbr_t = jnp.moveaxis(nbr, -1, 0)                    # (27, B, N)
    fg0 = jnp.zeros((B, N, C), jnp.float32)
    feat_grad, w_grad = jax.lax.scan(
        tap, fg0, (nbr_t, nbr_t, w[::-1])
    )
    # tap o of the scan produced w_grad[o] (forward order) and consumed
    # nbr[o] with w[26-o] for the feature grad — both orderings line up
    # because nbr_rev uses the SAME tap index (the reversal lives in w).
    iota = jnp.arange(N, dtype=rep.dtype)[None, :]
    is_rep = (rep == iota)
    feat_grad = jnp.where(is_rep[..., None], feat_grad, 0.0).astype(feat.dtype)
    nbr_zero = np.zeros(nbr.shape, jax.dtypes.float0)
    return feat_grad, nbr_zero, w_grad.astype(w.dtype)


neighbor_conv27.defvjp(_nc27_fwd, _nc27_bwd)


class NeighborConvCPE(nn.Module):
    """xCPE: submanifold 3³ conv + Linear + LN (``autoencoder.py:290-300``).

    The conv is a 27-tap gather-contraction over ``ps.neighbor_idx``
    (absent voxels contribute zero — spconv submanifold semantics),
    via :func:`neighbor_conv27` (custom scatter-free backward).
    """

    channels: int
    dtype: Any = jnp.float32
    pdnorm_n: int = 0  # >0: PDNorm with that many conditions (pdnorm_ln)

    @nn.compact
    def __call__(self, ps: PointSet) -> jnp.ndarray:
        C = self.channels
        nbr = ps.neighbor_idx                    # (B, N, 27)
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (27, C, C)
        )
        b = self.param("bias", nn.initializers.zeros, (C,))
        y = neighbor_conv27(ps.feat[:, :, :], nbr, w, self.dtype) + b
        y = nn.Dense(C, dtype=self.dtype, name="linear")(y)
        if self.pdnorm_n:
            return PDNorm(C, self.pdnorm_n, name="norm")(y, ps.condition)
        return masked_layer_norm(y)


class Block(nn.Module):
    """PTv3 block (``autoencoder.py:264-353``): CPE residual, pre-norm
    attention residual with DropPath, pre-norm MLP residual."""

    channels: int
    num_heads: int
    patch_size: int = 48
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    pre_norm: bool = True
    order_index: int = 0
    dtype: Any = jnp.float32
    pdnorm_n: int = 0  # >0: PDNorm with that many conditions (pdnorm_ln)

    @nn.compact
    def __call__(self, ps: PointSet, deterministic: bool = True) -> PointSet:
        if self.pdnorm_n:
            pd1 = PDNorm(self.channels, self.pdnorm_n, name="norm1")
            pd2 = PDNorm(self.channels, self.pdnorm_n, name="norm2")
            norm1 = lambda x: pd1(x, ps.condition)
            norm2 = lambda x: pd2(x, ps.condition)
        else:
            norm1 = norm2 = masked_layer_norm
        feat = ps.feat
        feat = feat + NeighborConvCPE(
            self.channels, dtype=self.dtype, pdnorm_n=self.pdnorm_n, name="cpe"
        )(ps.replace(feat=feat))

        dp = DropPath(self.drop_path, name="drop_path")
        shortcut = feat
        x = norm1(feat) if self.pre_norm else feat
        x = WindowAttention(
            self.channels,
            self.num_heads,
            self.patch_size,
            self.qkv_bias,
            self.qk_scale,
            self.attn_drop,
            self.proj_drop,
            self.order_index,
            dtype=self.dtype,
            name="attn",
        )(ps.replace(feat=x), deterministic=deterministic)
        feat = shortcut + dp(x, deterministic)
        if not self.pre_norm:
            feat = norm1(feat)

        shortcut = feat
        x = norm2(feat) if self.pre_norm else feat
        x = PointMLP(
            int(self.channels * self.mlp_ratio),
            self.channels,
            self.proj_drop,
            dtype=self.dtype,
            name="mlp",
        )(x, deterministic=deterministic)
        feat = shortcut + dp(x, deterministic)
        if not self.pre_norm:
            feat = norm2(feat)
        return ps.replace(feat=feat)


class GlobalPooling(nn.Module):
    """Per-sample masked mean -> ``global_feat`` (``autoencoder.py:498-514``)."""

    @nn.compact
    def __call__(self, ps: PointSet) -> PointSet:
        return ps.replace(global_feat=masked_mean(ps.feat, ps.mask))


def positional_encoding(freqs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """sin/cos PE, (.., 3) -> (.., 2*3*n_freq) (``autoencoder.py:792-794``)."""
    fx = (freqs[:, None] * x[..., None, :]).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([jnp.sin(fx), jnp.cos(fx)], axis=-1)


class UpscaleModule(nn.Module):
    """Learned SxN upsampling (``autoencoder.py:797-899``).

    Each parent emits S children at ``coord + 0.5*grid_size*tanh(delta_x)``
    with features ``skip(parent) + drop_path(delta_f([PE(dx), parent]))``.
    """

    in_channels: int
    out_channels: int
    upscale_factor: int
    n_frequencies: int = 15
    drop_path: float = 0.0
    enable_absolute_pe: bool = False
    is_first: bool = True
    carry_attribute: bool = False
    dtype: Any = jnp.float32
    pdnorm_n: int = 0  # >0: PDNorm with that many conditions (pdnorm_ln)

    @nn.compact
    def __call__(self, ps: PointSet, deterministic: bool = True) -> PointSet:
        S = self.upscale_factor
        B, N, C = ps.feat.shape
        if self.pdnorm_n:
            in_norm = lambda x: PDNorm(C, self.pdnorm_n, name="in_norm")(
                x, ps.condition
            )
            out_norm = lambda x: PDNorm(
                self.out_channels, self.pdnorm_n, name="out_norm"
            )(x, ps.condition)
        else:
            in_norm = out_norm = masked_layer_norm
        feat = in_norm(ps.feat).astype(self.dtype)  # in_norm

        # coordinate deltas are geometry: computed in f32
        dx = nn.Dense(C, dtype=self.dtype, name="delta_x_fc1")(feat)
        delta_x = nn.Dense(3 * S, name="delta_x_fc2")(nn.gelu(dx))
        delta_x = delta_x.astype(jnp.float32).reshape(B, N * S, 3)
        delta_x = 0.5 * ps.grid_size * jnp.tanh(delta_x)

        skip_x = jnp.repeat(ps.coord, S, axis=1)
        skip_f = jnp.repeat(feat, S, axis=1)
        out_x = skip_x + delta_x

        if self.n_frequencies > 0:
            freqs = 2.0 ** jnp.arange(self.n_frequencies)
            pe_in = out_x if self.enable_absolute_pe else delta_x
            pe = positional_encoding(freqs, pe_in)
            df_in = jnp.concatenate([pe, skip_f], axis=-1)
        else:
            df_in = jnp.concatenate([delta_x, skip_f], axis=-1)

        df = masked_layer_norm(df_in).astype(self.dtype)
        df = nn.Dense(C, dtype=self.dtype, name="delta_f_fc1")(df)
        delta_f = nn.Dense(
            self.out_channels, dtype=self.dtype, name="delta_f_fc2"
        )(nn.gelu(df))
        skip = nn.Dense(self.out_channels, dtype=self.dtype, name="skip")(skip_f)
        out_f = skip + DropPath(self.drop_path, name="drop_path")(
            delta_f, deterministic
        )
        out_f = out_norm(out_f).astype(jnp.float32)  # out_norm (f32 out)

        new_mask = jnp.repeat(ps.mask, S, axis=1)
        attribute = ps.attribute
        if self.carry_attribute and attribute is not None:
            attribute = jnp.repeat(attribute, S, axis=1)
        return ps.replace(
            coord=out_x,
            feat=out_f,
            mask=new_mask,
            attribute=attribute,
            orders=None,
            inverses=None,
            grid_coord=None,
            neighbor_idx=None,
            prob=None,
        )


class MaskModule(nn.Module):
    """Non-residual densification gate (``autoencoder.py:615-707``).

    sigmoid-prob MLP -> straight-through feature scaling -> static top-k
    split into (non_leaf, leaf) PointSets.  ratio == 1.0: every point is
    both leaf and non-leaf (terminal level).
    """

    dim: int
    temperature: float = 1.0
    non_leaf_ratio: float = 1.0
    mask_sampling_type: str = "topk"

    @nn.compact
    def __call__(self, ps: PointSet) -> tuple[PointSet, PointSet]:
        if self.non_leaf_ratio >= 1.0:
            return ps, ps
        if self.mask_sampling_type not in ("topk", "top_p"):
            raise NotImplementedError(
                f"mask_sampling_type={self.mask_sampling_type!r}; "
                "supported: topk, top_p"
            )
        B, N, _ = ps.feat.shape
        raw = nn.Dense(self.dim, name="net_fc1")(ps.feat)
        raw = nn.Dense(1, name="net_fc2")(nn.gelu(raw))[..., 0]
        prob = jax.nn.sigmoid(raw)
        feat = straight_through(ps.feat, prob)
        ps = ps.replace(feat=feat, prob=prob)

        if self.mask_sampling_type == "top_p":
            # nucleus sampling: both subsets keep full static size N and
            # carry validity masks (exact reference semantics, static shapes)
            nucleus = top_p_mask(prob, ps.mask, self.non_leaf_ratio)
            non_leaf = ps.replace(mask=nucleus)
            leaf = ps.replace(mask=ps.mask & ~nucleus)
            return non_leaf, leaf

        k = int(-(-N * self.non_leaf_ratio // 1))  # ceil
        top_idx, rest_idx, top_ok, rest_ok = topk_split(prob, ps.mask, k)
        non_leaf = gather_points(ps, top_idx, new_mask=top_ok)
        leaf = gather_points(ps, rest_idx, new_mask=rest_ok)
        return non_leaf, leaf


class MaskResModule(nn.Module):
    """Residual-path gate (``autoencoder.py:709-790``): per-sample softmax
    prob with temperature, hard-mask straight-through; the split is
    deferred to the next SerializationResModule — returned as (ps with
    non_leaf info, leaf view)."""

    dim: int
    temperature: float = 1.0
    non_leaf_ratio: float = 1.0
    mask_sampling_type: str = "topk"

    @nn.compact
    def __call__(self, ps: PointSet):
        if self.non_leaf_ratio >= 1.0:
            return ps, None, None
        if self.mask_sampling_type not in ("topk", "top_p"):
            raise NotImplementedError(
                f"mask_sampling_type={self.mask_sampling_type!r}; "
                "supported: topk, top_p"
            )
        B, N, _ = ps.feat.shape
        raw = nn.Dense(self.dim, name="net_fc1")(ps.feat)
        raw = nn.Dense(1, name="net_fc2")(nn.gelu(raw))[..., 0]
        prob = masked_softmax(raw / self.temperature, ps.mask, axis=1)

        if self.mask_sampling_type == "top_p":
            non_leaf_mask = top_p_mask(prob, ps.mask, self.non_leaf_ratio)
            feat = straight_through_res(ps.feat, prob, non_leaf_mask)
            ps = ps.replace(feat=feat, prob=prob)
            return ps, None, non_leaf_mask

        k = int(-(-N * self.non_leaf_ratio // 1))
        top_idx, rest_idx, _, _ = topk_split(prob, ps.mask, k)
        non_leaf_mask = jnp.zeros((B, N), bool).at[
            jnp.arange(B)[:, None], top_idx
        ].set(True) & ps.mask
        feat = straight_through_res(ps.feat, prob, non_leaf_mask)
        ps = ps.replace(feat=feat, prob=prob)
        return ps, (top_idx, rest_idx), non_leaf_mask


class GaussianModule(nn.Module):
    """Per-point attribute head (``autoencoder.py:1104-1185``):
    MLP(dim -> dim -> num_sh + 1 + 3 + 4).  In residual mode the caller adds
    the inherited parent attribute."""

    dim: int
    sh_degree: int = 1

    @property
    def num_attrs(self) -> int:
        return 3 * (self.sh_degree + 1) ** 2 + 1 + 3 + 4

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim, name="feat2attr_fc1")(feat)
        return nn.Dense(self.num_attrs, name="feat2attr_fc2")(nn.gelu(x))


def split_attributes(attr: jnp.ndarray, sh_degree: int):
    """attribute (..., A) -> (sh, opacity, scale, rotation) slices
    (``autoencoder.py:1129-1133`` layout)."""
    num_sh = 3 * (sh_degree + 1) ** 2
    return (
        attr[..., :num_sh],
        attr[..., num_sh: num_sh + 1],
        attr[..., num_sh + 1: num_sh + 4],
        attr[..., num_sh + 4: num_sh + 8],
    )
