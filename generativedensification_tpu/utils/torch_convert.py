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


def load_torch_network_params(path: str, init_params: Any) -> Any:
    """Best-effort full-network conversion.

    Returns a new params pytree with every mappable reference tensor
    installed; prints a report of unmapped source keys / unfilled targets.
    The decoder-stage mapping covers the release config; exotic configs
    should extend the table.
    """
    import jax

    sd = load_torch_state_dict(path)
    params = jax.tree.map(np.asarray, init_params)
    # tree -> plain nested dict for in-place mutation
    import flax

    pd = flax.core.unfreeze(params)["params"] if "params" in params else params
    filled: set = set()

    # ViT
    if any(k.startswith("net.img_encoder.model.") for k in sd):
        convert_vit(
            sd, "net.img_encoder.model.",
            pd, "img_encoder/vit", filled,
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
                w = sd[bp + "cpe.0.weight"]  # spconv (k,k,k,I,O) or (O,I,k,k,k)
                if w.ndim == 5:
                    if w.shape[0] == w.shape[1] == w.shape[2]:
                        kern = w.reshape(27, w.shape[3], w.shape[4])
                    else:
                        kern = np.transpose(w, (2, 3, 4, 1, 0)).reshape(
                            27, w.shape[1], w.shape[0]
                        )
                    _set(pd, btp + "/cpe/kernel", kern, filled)
                if bp + "cpe.0.bias" in sd:
                    _set(pd, btp + "/cpe/bias", sd[bp + "cpe.0.bias"], filled)
            lin(bp + "attn.qkv", btp + "/attn/qkv")
            lin(bp + "attn.proj", btp + "/attn/proj")
            lin(bp + "mlp.fc1", btp + "/mlp")
            lin(bp + "mlp.fc2", btp + "/mlp")
        # upscale
        lin(sp + "up.delta_x.0", f"{tp}/up/delta_x/layers_0")
        lin(sp + "up.delta_x.2", f"{tp}/up/delta_x/layers_2")
        lin(sp + "up.skip", f"{tp}/up/skip")
        lin(sp + "up.delta_f.1", f"{tp}/up/delta_f/layers_1")
        lin(sp + "up.delta_f.3", f"{tp}/up/delta_f/layers_3")
        # mask + head
        lin(sp + "mask.net.0", f"{tp}/mask/net/layers_0")
        lin(sp + "mask.net.2", f"{tp}/mask/net/layers_2")
        lin(sp + "head.feat2attr.0", f"{tp}/head/feat2attr/layers_0")
        lin(sp + "head.feat2attr.2", f"{tp}/head/feat2attr/layers_2")

    unmapped = [k for k in sd if not k.startswith(("net.img_encoder",)) and k not in filled]
    print(f"[torch_convert] filled {len(filled)} target leaves")
    if unmapped[:10]:
        print(f"[torch_convert] note: {len(unmapped)} source keys not consumed "
              f"(first: {unmapped[:5]})")

    out = {"params": pd} if "params" in params else pd
    return jax.tree.map(lambda a, b: np.asarray(b, np.asarray(a).dtype), init_params, out)
