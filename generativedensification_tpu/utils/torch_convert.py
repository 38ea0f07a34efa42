"""torch -> flax parameter conversion for the reference checkpoints.

Maps the reference Lightning checkpoint (``epoch=49.ckpt`` et al., torch
``state_dict`` with ``net.*`` prefixes) onto this framework's parameter
tree, so released weights can validate the whole TPU pipeline numerically
(SURVEY.md §7.3.8).

Primitive layout rules (torch -> flax):
  * Linear:            weight (out, in)            -> kernel (in, out)
  * LayerNorm:         weight/bias                 -> scale/bias
  * Conv2d:            (out, in, kh, kw)           -> (kh, kw, in, out)
  * Conv3d:            (out, in, kd, kh, kw)       -> (kd, kh, kw, in, out)
  * ConvTranspose3d:   (in, out, kd, kh, kw)       -> (kd, kh, kw, in, out)
  * packed qkv Linear: (3C, C)                     -> three (C, C) kernels

The top-level mapping is best-effort: unmapped reference keys and unfilled
target leaves are reported, not silently dropped.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def t2f_linear(w):  # (out, in) -> (in, out)
    return np.ascontiguousarray(np.asarray(w).T)


def t2f_conv2d(w):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def t2f_conv3d(w):  # (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def t2f_convtranspose3d(w):  # (I, O, kd, kh, kw) -> (kd, kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 0, 1)))


def split_qkv(w, b=None):
    """Packed torch qkv (3C, C)/(3C,) -> dict of three flax kernels."""
    w = np.asarray(w)
    C = w.shape[0] // 3
    out = {
        "q": {"kernel": t2f_linear(w[:C])},
        "k": {"kernel": t2f_linear(w[C: 2 * C])},
        "v": {"kernel": t2f_linear(w[2 * C:])},
    }
    if b is not None:
        b = np.asarray(b)
        out["q"]["bias"] = b[:C]
        out["k"]["bias"] = b[C: 2 * C]
        out["v"]["bias"] = b[2 * C:]
    return out


def mha_to_flax_attention(qkv_w, qkv_b, proj_w, proj_b, num_heads):
    """timm/torch fused attention -> flax MultiHeadDotProductAttention tree.

    flax kernels are (in, heads, head_dim) for q/k/v and (heads, head_dim,
    out) for the output projection.
    """
    qkv_w = np.asarray(qkv_w)
    C = qkv_w.shape[1]
    D = C // num_heads
    parts = {}
    names = ("query", "key", "value")
    for i, name in enumerate(names):
        w = qkv_w[i * C: (i + 1) * C]           # (C, C) torch (out, in)
        k = t2f_linear(w).reshape(C, num_heads, D)
        entry = {"kernel": k}
        if qkv_b is not None:
            entry["bias"] = np.asarray(qkv_b)[i * C: (i + 1) * C].reshape(
                num_heads, D
            )
        parts[name] = entry
    out_k = t2f_linear(proj_w).reshape(num_heads, D, C)
    parts["out"] = {"kernel": out_k}
    if proj_b is not None:
        parts["out"]["bias"] = np.asarray(proj_b)
    return parts


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _set(tree: dict, path: str, value: np.ndarray, filled: set):
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        if p not in node:
            raise KeyError(f"target path missing: {path} (at {p})")
        node = node[p]
    leaf = parts[-1]
    if leaf not in node:
        raise KeyError(f"target leaf missing: {path}")
    expect = np.shape(node[leaf])
    if tuple(expect) != tuple(np.shape(value)):
        raise ValueError(
            f"shape mismatch at {path}: target {expect} vs torch {np.shape(value)}"
        )
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    filled.add(path)


def convert_vit(sd: Dict[str, np.ndarray], prefix: str, params: dict,
                target_prefix: str, filled: set, depth: int = 12,
                num_heads: int = 12):
    """timm ViT state dict -> our VisionTransformer tree."""
    g = lambda k: sd[prefix + k]
    _set(params, f"{target_prefix}/cls_token", g("cls_token")[0][None], filled) \
        if g("cls_token").ndim == 3 else None
    _set(params, f"{target_prefix}/pos_embed", g("pos_embed"), filled)
    _set(params, f"{target_prefix}/patch_embed/kernel",
         t2f_conv2d(g("patch_embed.proj.weight")), filled)
    _set(params, f"{target_prefix}/patch_embed/bias",
         g("patch_embed.proj.bias"), filled)
    for i in range(depth):
        bp = f"blocks.{i}."
        tp = f"{target_prefix}/block{i}"
        _set(params, f"{tp}/norm1/scale", g(bp + "norm1.weight"), filled)
        _set(params, f"{tp}/norm1/bias", g(bp + "norm1.bias"), filled)
        attn = mha_to_flax_attention(
            g(bp + "attn.qkv.weight"),
            sd.get(prefix + bp + "attn.qkv.bias"),
            g(bp + "attn.proj.weight"),
            sd.get(prefix + bp + "attn.proj.bias"),
            num_heads,
        )
        for name, sub in attn.items():
            for leaf, val in sub.items():
                _set(params, f"{tp}/attn/{name}/{leaf}", val, filled)
        _set(params, f"{tp}/norm2/scale", g(bp + "norm2.weight"), filled)
        _set(params, f"{tp}/norm2/bias", g(bp + "norm2.bias"), filled)
        _set(params, f"{tp}/mlp_fc1/kernel", t2f_linear(g(bp + "mlp.fc1.weight")), filled)
        _set(params, f"{tp}/mlp_fc1/bias", g(bp + "mlp.fc1.bias"), filled)
        _set(params, f"{tp}/mlp_fc2/kernel", t2f_linear(g(bp + "mlp.fc2.weight")), filled)
        _set(params, f"{tp}/mlp_fc2/bias", g(bp + "mlp.fc2.bias"), filled)
    _set(params, f"{target_prefix}/norm/scale", g("norm.weight"), filled)
    _set(params, f"{target_prefix}/norm/bias", g("norm.bias"), filled)


def synthesize_reference_state_dict(cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """Random state_dict with the reference checkpoint's exact key names and
    shapes for a given :class:`NetworkConfig`.

    Documents the torch schema (derived from
    ``/root/reference/lightning/network.py:85-342`` and
    ``point_decoder/autoencoder.py:237-1185``) and backs the converter's
    round-trip test — every key synthesized here must land in the flax tree.
    """
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def add(name, *shape):
        sd[name] = rng.normal(scale=0.02, size=shape).astype(np.float32)

    # ---- ViT (timm vit_base / our tiny_test stub share the layout)
    if "tiny_test" in cfg.encoder_backbone:
        C, depth, heads = 32, 1, 2
    elif "vit_small" in cfg.encoder_backbone:
        C, depth, heads = 384, 12, 6
    else:
        C, depth, heads = 768, 12, 12
    vp = "net.img_encoder.model."
    add(vp + "cls_token", 1, 1, C)
    add(vp + "pos_embed", 1, 14 * 14 + 1, C)
    add(vp + "patch_embed.proj.weight", C, 3, 16, 16)
    add(vp + "patch_embed.proj.bias", C)
    for i in range(depth):
        bp = vp + f"blocks.{i}."
        add(bp + "norm1.weight", C); add(bp + "norm1.bias", C)
        add(bp + "attn.qkv.weight", 3 * C, C); add(bp + "attn.qkv.bias", 3 * C)
        add(bp + "attn.proj.weight", C, C); add(bp + "attn.proj.bias", C)
        add(bp + "norm2.weight", C); add(bp + "norm2.bias", C)
        add(bp + "mlp.fc1.weight", 4 * C, C); add(bp + "mlp.fc1.bias", 4 * C)
        add(bp + "mlp.fc2.weight", C, 4 * C); add(bp + "mlp.fc2.bias", C)
    add(vp + "norm.weight", C); add(vp + "norm.bias", C)

    # ---- ModLN + view embedding (network.py:218-241, :342)
    add("net.dir_norm.norm.weight", C); add("net.dir_norm.norm.bias", C)
    add("net.dir_norm.mlp.1.weight", 2 * C, 32)
    add("net.dir_norm.mlp.1.bias", 2 * C)
    if cfg.view_embed_dim > 0:
        add("net.view_embed", 1, 4, cfg.view_embed_dim, 1, 1, 1)

    # ---- VolTransformer (network.py:133-192)
    E = cfg.embedding_dim
    cond = C + cfg.view_embed_dim
    R = cfg.vol_embedding_reso
    add("net.vol_decoder.pos_embed", 1, E, R, R, R)
    for i in range(cfg.num_layers):
        bp = f"net.vol_decoder.layers.{i}."
        for n in ("norm1", "norm2", "norm3"):
            add(bp + n + ".weight", E); add(bp + n + ".bias", E)
        add(bp + "cross_attn.q_proj_weight", E, E)
        add(bp + "cross_attn.k_proj_weight", E, cond)
        add(bp + "cross_attn.v_proj_weight", E, cond)
        add(bp + "cross_attn.out_proj.weight", E, E)
        add(bp + "cnn.weight", E, E, 3, 3, 3)
        add(bp + "mlp.0.weight", 2 * E, E); add(bp + "mlp.0.bias", 2 * E)
        add(bp + "mlp.3.weight", E, 2 * E); add(bp + "mlp.3.bias", E)
    add("net.vol_decoder.norm.weight", E); add("net.vol_decoder.norm.bias", E)
    out_dim = cfg.vol_embedding_out_dim
    add("net.vol_decoder.deconv.weight", E, out_dim, 2, 2, 2)
    add("net.vol_decoder.deconv.bias", out_dim)

    # ---- GaussianDecoder (network.py:243-316)
    D_in = out_dim
    gauss_out = 3 + cfg.sh_dim + 1 + 3 + 4
    add("net.decoder.mlp_coarse.0.weight", D_in, D_in)
    add("net.decoder.mlp_coarse.0.bias", D_in)
    add("net.decoder.mlp_coarse.2.weight", D_in, D_in)
    add("net.decoder.mlp_coarse.2.bias", D_in)
    add("net.decoder.mlp_coarse.4.weight", gauss_out * cfg.K, D_in)
    add("net.decoder.mlp_coarse.4.bias", gauss_out * cfg.K)
    add("net.decoder.norm.weight", D_in); add("net.decoder.norm.bias", D_in)
    add("net.decoder.cross_att.q_proj_weight", D_in, D_in)
    add("net.decoder.cross_att.k_proj_weight", D_in, 8)
    add("net.decoder.cross_att.v_proj_weight", D_in, 8)
    add("net.decoder.cross_att.out_proj.weight", D_in, D_in)
    add("net.decoder.mlp_fine.0.weight", D_in, D_in)
    add("net.decoder.mlp_fine.0.bias", D_in)
    add("net.decoder.mlp_fine.2.weight", D_in + cfg.sh_dim, D_in)
    add("net.decoder.mlp_fine.2.bias", D_in + cfg.sh_dim)

    # ---- densification decoder (network.py:435-599, autoencoder.py)
    n_levels = len(cfg.dec_channels)
    num_attrs = 3 * (cfg.sh_degree + 1) ** 2 + 1 + 3 + 4
    for s in range(n_levels):
        sp = f"net.dec.{s}."
        Cs = cfg.dec_channels[s]
        Co = cfg.dec_channels[s + 1] if s < n_levels - 1 else cfg.dec_channels[s]
        for b in range(cfg.dec_depths[s]):
            bp = sp + f"block{b}."
            add(bp + "cpe.0.weight", Cs, 3, 3, 3, Cs)   # spconv v2 (O,k,k,k,I)
            add(bp + "cpe.0.bias", Cs)
            add(bp + "cpe.1.weight", Cs, Cs); add(bp + "cpe.1.bias", Cs)
            add(bp + "attn.qkv.weight", 3 * Cs, Cs)
            add(bp + "attn.qkv.bias", 3 * Cs)
            add(bp + "attn.proj.weight", Cs, Cs); add(bp + "attn.proj.bias", Cs)
            hid = int(Cs * cfg.mlp_ratio)
            add(bp + "mlp.0.fc1.weight", hid, Cs); add(bp + "mlp.0.fc1.bias", hid)
            add(bp + "mlp.0.fc2.weight", Cs, hid); add(bp + "mlp.0.fc2.bias", Cs)
        S = cfg.upscale_factor[s]
        pe_dim = 2 * 3 * cfg.n_frequencies if cfg.n_frequencies > 0 else 3
        add(sp + "up.delta_x.0.weight", Cs, Cs); add(sp + "up.delta_x.0.bias", Cs)
        add(sp + "up.delta_x.2.weight", 3 * S, Cs); add(sp + "up.delta_x.2.bias", 3 * S)
        add(sp + "up.skip.weight", Co, Cs); add(sp + "up.skip.bias", Co)
        add(sp + "up.delta_f.1.weight", Cs, pe_dim + Cs)
        add(sp + "up.delta_f.1.bias", Cs)
        add(sp + "up.delta_f.3.weight", Co, Cs); add(sp + "up.delta_f.3.bias", Co)
        ratio = cfg.non_leaf_ratio[s] if s < n_levels - 1 else 1.0
        if ratio < 1.0:
            add(sp + "mask.net.0.weight", Co, Co); add(sp + "mask.net.0.bias", Co)
            add(sp + "mask.net.2.weight", 1, Co); add(sp + "mask.net.2.bias", 1)
        add(sp + "head.feat2attr.0.weight", Co, Co)
        add(sp + "head.feat2attr.0.bias", Co)
        add(sp + "head.feat2attr.2.weight", num_attrs, Co)
        add(sp + "head.feat2attr.2.bias", num_attrs)
    return sd


class _TrackedSD(dict):
    """state_dict wrapper recording which source keys were consumed."""

    def __init__(self, sd):
        super().__init__(sd)
        self.used: set = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if k in self:
            self.used.add(k)
        return super().get(k, default)


def load_torch_network_params(path: str, init_params: Any) -> Any:
    """Load a reference Lightning checkpoint and convert (see
    :func:`convert_state_dict`)."""
    return convert_state_dict(load_torch_state_dict(path), init_params)


def convert_state_dict(sd: Dict[str, np.ndarray], init_params: Any) -> Any:
    """Best-effort full-network conversion.

    Returns a new params pytree with every mappable reference tensor
    installed; prints a report of unmapped source keys / unfilled targets.
    The decoder-stage mapping covers the release config; exotic configs
    should extend the table.
    """
    import jax

    sd = _TrackedSD(sd)
    params = jax.tree.map(np.asarray, init_params)
    # tree -> plain nested dict for in-place mutation
    import flax

    pd = flax.core.unfreeze(params)["params"] if "params" in params else params
    filled: set = set()

    # ViT (depth from the source keys, heads from the target kernel shape)
    if any(k.startswith("net.img_encoder.model.blocks.") for k in sd):
        vit_depth = 1 + max(
            int(k.split(".")[4])
            for k in sd
            if k.startswith("net.img_encoder.model.blocks.")
        )
        vit_heads = np.shape(
            pd["img_encoder"]["vit"]["block0"]["attn"]["query"]["kernel"]
        )[1]
        convert_vit(
            sd, "net.img_encoder.model.",
            pd, "img_encoder/vit", filled,
            depth=vit_depth, num_heads=int(vit_heads),
        )

    # ModLN (dir_norm)
    def lin(src, dst):
        if src + ".weight" in sd:
            _set(pd, dst + "/kernel", t2f_linear(sd[src + ".weight"]), filled)
            if src + ".bias" in sd:
                _set(pd, dst + "/bias", sd[src + ".bias"], filled)

    def ln(src, dst):
        if src + ".weight" in sd:
            _set(pd, dst + "/scale", sd[src + ".weight"], filled)
            _set(pd, dst + "/bias", sd[src + ".bias"], filled)

    lin("net.dir_norm.mlp.1", "dir_norm/mlp")
    ln("net.dir_norm.norm", "dir_norm/norm")

    if "net.view_embed" in sd:
        ve = sd["net.view_embed"]  # (1, 4, C, 1, 1, 1)
        _set(pd, "view_embed", ve.reshape(1, 4, 1, -1), filled)

    # VolTransformer
    if "net.vol_decoder.pos_embed" in sd:
        pe = sd["net.vol_decoder.pos_embed"]  # (1, C, D, H, W)
        _set(
            pd, "vol_decoder/pos_embed",
            np.transpose(pe, (0, 2, 3, 4, 1)), filled,
        )
    n_layers = len({k.split(".")[3] for k in sd if k.startswith("net.vol_decoder.layers.")})
    for i in range(n_layers):
        bp = f"net.vol_decoder.layers.{i}."
        tp = f"vol_decoder/layer{i}"
        ln(bp + "norm1", tp + "/norm1")
        ln(bp + "norm2", tp + "/norm2")
        ln(bp + "norm3", tp + "/norm3")
        # torch MHA with kdim: q_proj_weight, k_proj_weight, v_proj_weight
        if bp + "cross_attn.q_proj_weight" in sd:
            _set(pd, tp + "/cross_attn/q/kernel",
                 t2f_linear(sd[bp + "cross_attn.q_proj_weight"]), filled)
            _set(pd, tp + "/cross_attn/k/kernel",
                 t2f_linear(sd[bp + "cross_attn.k_proj_weight"]), filled)
            _set(pd, tp + "/cross_attn/v/kernel",
                 t2f_linear(sd[bp + "cross_attn.v_proj_weight"]), filled)
            _set(pd, tp + "/cross_attn/out/kernel",
                 t2f_linear(sd[bp + "cross_attn.out_proj.weight"]), filled)
        if bp + "cnn.weight" in sd:
            _set(pd, tp + "/cnn/kernel", t2f_conv3d(sd[bp + "cnn.weight"]), filled)
        lin(bp + "mlp.0", tp + "/mlp_fc1")
        lin(bp + "mlp.3", tp + "/mlp_fc2")
    ln("net.vol_decoder.norm", "vol_decoder/norm")
    if "net.vol_decoder.deconv.weight" in sd:
        _set(pd, "vol_decoder/deconv/kernel",
             t2f_convtranspose3d(sd["net.vol_decoder.deconv.weight"]), filled)
        _set(pd, "vol_decoder/deconv/bias", sd["net.vol_decoder.deconv.bias"], filled)

    # GaussianDecoder
    lin("net.decoder.mlp_coarse.0", "decoder/coarse_fc0")
    lin("net.decoder.mlp_coarse.2", "decoder/coarse_fc1")
    lin("net.decoder.mlp_coarse.4", "decoder/coarse_out")
    ln("net.decoder.norm", "decoder/fine_norm")
    if "net.decoder.cross_att.q_proj_weight" in sd:
        _set(pd, "decoder/fine_cross/q/kernel",
             t2f_linear(sd["net.decoder.cross_att.q_proj_weight"]), filled)
        _set(pd, "decoder/fine_cross/k/kernel",
             t2f_linear(sd["net.decoder.cross_att.k_proj_weight"]), filled)
        _set(pd, "decoder/fine_cross/v/kernel",
             t2f_linear(sd["net.decoder.cross_att.v_proj_weight"]), filled)
        _set(pd, "decoder/fine_cross/out/kernel",
             t2f_linear(sd["net.decoder.cross_att.out_proj.weight"]), filled)
    lin("net.decoder.mlp_fine.0", "decoder/fine_fc0")
    lin("net.decoder.mlp_fine.2", "decoder/fine_out")

    # densification decoder stages
    n_stages = len({k.split(".")[2] for k in sd if k.startswith("net.dec.")})
    for s in range(n_stages):
        sp = f"net.dec.{s}."
        tp = f"dec{s}"
        for b in range(8):
            bp = sp + f"block{b}."
            btp = f"{tp}/block{b}"
            if bp + "attn.qkv.weight" not in sd:
                continue
            lin(bp + "cpe.1", btp + "/cpe/linear")
            if bp + "cpe.0.weight" in sd:
                # spconv layouts: v2.x native (O, kD, kH, kW, I); some
                # versions/export paths use (kD, kH, kW, I, O) or torch-conv
                # (O, I, kD, kH, kW).  Target: (27, I, O), taps in the
                # (dz, dy, dx) lexicographic order of compute_neighbor_idx.
                w = np.asarray(sd[bp + "cpe.0.weight"])
                if w.ndim == 5:
                    if w.shape[0] == w.shape[1] == w.shape[2] == 3:
                        kern = w.reshape(27, w.shape[3], w.shape[4])
                    elif w.shape[1] == w.shape[2] == w.shape[3] == 3:
                        # (O, kD, kH, kW, I) -> (kD, kH, kW, I, O)
                        kern = np.transpose(w, (1, 2, 3, 4, 0)).reshape(
                            27, w.shape[4], w.shape[0]
                        )
                    else:
                        # (O, I, kD, kH, kW) -> (kD, kH, kW, I, O)
                        kern = np.transpose(w, (2, 3, 4, 1, 0)).reshape(
                            27, w.shape[1], w.shape[0]
                        )
                    _set(pd, btp + "/cpe/kernel", kern, filled)
                if bp + "cpe.0.bias" in sd:
                    _set(pd, btp + "/cpe/bias", sd[bp + "cpe.0.bias"], filled)
            lin(bp + "attn.qkv", btp + "/attn/qkv")
            lin(bp + "attn.proj", btp + "/attn/proj")
            # reference Block wraps MLP in a PointSequential:
            # net.dec.{s}.block{i}.mlp.0.fc1 (autoencoder.py:316-324)
            lin(bp + "mlp.0.fc1", btp + "/mlp/fc1")
            lin(bp + "mlp.0.fc2", btp + "/mlp/fc2")
        # upscale (delta_x: Sequential[Linear, act, Linear]; delta_f:
        # Sequential[LN(no affine), Linear, act, Linear]; autoencoder.py:826-848)
        lin(sp + "up.delta_x.0", f"{tp}/up/delta_x_fc1")
        lin(sp + "up.delta_x.2", f"{tp}/up/delta_x_fc2")
        lin(sp + "up.skip", f"{tp}/up/skip")
        lin(sp + "up.delta_f.1", f"{tp}/up/delta_f_fc1")
        lin(sp + "up.delta_f.3", f"{tp}/up/delta_f_fc2")
        # mask + head (net / feat2attr: Sequential[Linear, act, Linear])
        lin(sp + "mask.net.0", f"{tp}/mask/net_fc1")
        lin(sp + "mask.net.2", f"{tp}/mask/net_fc2")
        lin(sp + "head.feat2attr.0", f"{tp}/head/feat2attr_fc1")
        lin(sp + "head.feat2attr.2", f"{tp}/head/feat2attr_fc2")

    # non-parameter buffers the reference registers (frequencies, grids) and
    # Lightning bookkeeping are expected to be unconsumed
    _expected_unused = ("frequencies", "volume_grid", "group_centers", "grid")
    unmapped = [
        k for k in sd
        if k not in sd.used and not any(t in k for t in _expected_unused)
    ]
    print(f"[torch_convert] filled {len(filled)} target leaves")
    if unmapped:
        print(f"[torch_convert] note: {len(unmapped)} source keys not consumed "
              f"(first: {unmapped[:5]})")

    out = {"params": pd} if "params" in params else pd
    return jax.tree.map(lambda a, b: np.asarray(b, np.asarray(a).dtype), init_params, out)
