"""Training losses: MSE + MS-SSIM (+ 2DGS regularizers), pure jnp.

Parity with ``lightning/loss.py:8-63``:
  * per prefix ('', '_fine'): MSE + 0.5 * (1 - MS_SSIM),
  * MS-SSIM follows pytorch_msssim (gaussian win 11 σ1.5, K=(0.01, 0.03),
    valid padding, 5 scales with the standard weights, ReLU-clamped cs),
    computed in f32 (the reference forces fp32 under autocast, :45-48),
  * 2DGS extras when ``rend_dist`` is present, iter > 1000, coarse only:
    +1000·distortion + 0.2·normal error (:50-61).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


import os as _os

# SSIM conv precision.  The reference FORCES fp32 SSIM under autocast
# (loss.py:45-48); JAX's DEFAULT conv precision lowers f32 TPU convs to
# ONE bf16 pass (r5 HLO audit: the window convs ran bf16 even under the
# f32 policy — a TPU-only deviation CPU parity tests cannot see).
# GD_SSIM_PREC=highest restores true-f32 convs: measured +20 ms at B=1
# (1170 vs 1150 ms/step) but XLA's f32-conv layout assignment pads the
# B=3 image-stack temps 56x ((3, 3) minor-dim tiles — eighteen 1-4GB
# allocations, 39.7G > HBM), so the DEFAULT here stays the reference-
# batch-feasible bf16-pass form; the measured value delta is recorded in
# PERF.md r5.
_SSIM_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("GD_SSIM_PREC", "default")]


def _blur_conv(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Conv-form separable blur (A/B reference; see ``_blur``)."""
    C = x.shape[-1]
    k = win.shape[0]
    kern_h = jnp.tile(win.reshape(1, k, 1, 1, 1), (1, 1, 1, 1, C)).reshape(k, 1, 1, C)
    kern_w = jnp.tile(win.reshape(k, 1, 1, 1, 1), (1, 1, 1, 1, C)).reshape(1, k, 1, C)
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, C), ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=C, precision=_SSIM_PREC,
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, k, 1, C), ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=C, precision=_SSIM_PREC,
    )
    return x


def _blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-padding gaussian filter, NHWC, per channel.

    Shift-and-add form (the TPU-native choice, r5): k contiguous slices
    x weight, summed — pure f32 VPU elementwise that XLA fuses into one
    pass per axis, layout-neutral, and EXACT f32.  Both conv forms
    failed on TPU: JAX-default precision runs the f32 convs as ONE bf16
    pass, which destroys SSIM's E[x²]-E[x]² variance cancellation
    (measured: ms_ssim 0.9993 vs the true 0.9878 on a 0.05-noise pair —
    the (1-ssim) loss signal 17x too small, gradients garbage); forcing
    f32 convs (GD_SSIM_PREC=highest) makes XLA assign (3,3)-minor padded
    conv layouts that cascade 56x-padded 4GB temps and OOM the B=3
    reference batch.  GD_SSIM_IMPL=conv restores the conv form for A/B.
    """
    if _os.environ.get("GD_SSIM_IMPL", "shift") == "conv":
        return _blur_conv(x, win)
    k = win.shape[0]
    for axis in (1, 2):
        n = x.shape[axis] - k + 1
        y = win[0] * jax.lax.slice_in_dim(x, 0, n, axis=axis)
        for t in range(1, k):
            y = y + win[t] * jax.lax.slice_in_dim(x, t, t + n, axis=axis)
        x = y
    return x


def _ssim_and_cs(img1, img2, data_range=1.0, win_size=11, k=(0.01, 0.03)):
    """Mean SSIM and contrast sensitivity over an NHWC batch."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    C1 = (k[0] * data_range) ** 2
    C2 = (k[1] * data_range) ** 2
    win = _gaussian_window(win_size)

    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = _blur(img1 * img1, win) - mu1_sq
    sigma2 = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu12

    cs_map = (2 * sigma12 + C2) / (sigma1 + sigma2 + C2)
    ssim_map = ((2 * mu12 + C1) / (mu1_sq + mu2_sq + C1)) * cs_map
    return ssim_map.mean(), cs_map.mean()


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Single-scale SSIM, NHWC in [0, data_range] (pytorch_msssim.ssim)."""
    return _ssim_and_cs(img1, img2, data_range)[0]


@jax.custom_vjp
def _avg4(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average of an even-sized NHWC array.

    ``reduce_window`` form: the strided-slice-sum lowered to 4.3 ms
    index-GATHERS per image stack on TPU (52 ms/step total, r5 trace);
    the windowed reduce is a dense single pass.  Same 4-term average up
    to f32 association (the value-parity test allows 1e-6)."""
    s = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )
    return 0.25 * s


def _avg4_fwd(x):
    return _avg4(x), None


def _avg4_bwd(res, ct):
    # Each input pixel sits in exactly ONE 2x2 window, so the exact
    # gradient is 0.25 * nearest-upsample(ct).  Expressed as two MONOTONE
    # repeated-index takes: XLA's default transpose of the strided slices
    # is four interior pads that its TPU backend rewrites into chained
    # row-SCATTERS — 208 ms/step serialized at the flagship loss stacks
    # (r5 step trace, loss.py was the #1 non-render op).  A depthwise
    # lhs-dilated conv form was measured equivalent at B=1 but its f32
    # conv operands force XLA into (3, 3)-minor padded layouts that
    # cascade 56x-padded 4GB temps through the whole loss stack at B=3
    # (OOM; r5 bisect) — takes are layout-neutral.  Bitwise:
    # g = 0.25*ct exactly (one power-of-two multiply).
    del res  # input shape is 2x the output's (even-sized by contract)
    B, H2, W2, C = ct.shape
    hh = jnp.arange(2 * H2, dtype=jnp.int32) // 2
    ww = jnp.arange(2 * W2, dtype=jnp.int32) // 2
    return (0.25 * jnp.take(jnp.take(ct, hh, axis=1), ww, axis=2),)


_avg4.defvjp(_avg4_fwd, _avg4_bwd)


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """avg_pool 2x2 stride 2, zero-padded to even (pytorch_msssim).

    Strided-slice form, NOT reshape(B, H/2, 2, W/2, 2, C).mean((2, 4)):
    the reshape's BACKWARD broadcasts through the 6-D shape with a
    size-2 minor dim that TPU lane-pads 64x — a 4.5GB HLO temp at the
    reference batch (B=3, 512x4V views), the allocation that OOM'd the
    B=3 train step (r4).  The slice form is the same 4-term average (f32
    association differs by ≤1 ulp); its backward is pinned to a dense
    conv by ``_avg4``'s custom_vjp (see there).  GD_DS2=slice restores
    the r4 plain-autodiff slice form (memory-bisect knob)."""
    B, H, W, C = x.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    if _os.environ.get("GD_DS2", "") == "slice":
        return 0.25 * (
            x[:, 0::2, 0::2] + x[:, 0::2, 1::2]
            + x[:, 1::2, 0::2] + x[:, 1::2, 1::2]
        )
    return _avg4(x)


def ms_ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    data_range: float = 1.0,
    weights: tuple = _MSSSIM_WEIGHTS,
) -> jnp.ndarray:
    """Multi-scale SSIM (NHWC).

    Uses as many of the requested scales as the resolution supports
    (each scale needs min(H, W) / 2^(level-1) >= 11 for the valid-window
    filter); truncated weights are renormalized.  At the training
    resolution (512 x V*512) all 5 standard scales are active, matching
    pytorch_msssim exactly.
    """
    levels = len(weights)
    min_side = min(img1.shape[1], img1.shape[2])
    while levels > 1 and (min_side >> (levels - 1)) < 11:
        levels -= 1
    if levels < len(weights):
        total = sum(weights[:levels])
        weights = tuple(w_ / total for w_ in weights[:levels])
    w = jnp.asarray(weights, jnp.float32)
    vals = []
    for i in range(levels):
        s, cs = _ssim_and_cs(img1, img2, data_range)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            img1 = _downsample2(img1)
            img2 = _downsample2(img2)
    vals = jnp.stack([jax.nn.relu(v) for v in vals])
    return jnp.prod(vals**w)


def psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


class Losses:
    """``Losses()(batch, output, step)`` -> (loss, scalar_stats)."""

    def __init__(self, ssim_levels: int = 5):
        self.weights = _MSSSIM_WEIGHTS[:ssim_levels]

    def __call__(self, batch, output, step):
        stats = {}
        loss = 0.0
        B, V, H, W, _ = batch["tar_rgb"].shape
        tar = batch["tar_rgb"].transpose(0, 2, 1, 3, 4).reshape(B, H, V * W, 3)

        for prex in ("", "_fine"):
            if f"acc_map{prex}" not in output:
                continue
            err = (output[f"image{prex}"] - tar) ** 2
            mse = err.mean()
            loss = loss + mse
            stats[f"mse{prex}"] = jax.lax.stop_gradient(mse)
            stats[f"psnr{prex}"] = jax.lax.stop_gradient(psnr(mse))

            # remat the SSIM pyramid at B > 1: its blur residuals are the
            # marginal ~hundreds of MB that push the B=3 reference batch
            # 40MB past HBM (r5); the forward recompute is ~tens of ms.
            # Gradients are identical (remat is exact).
            ssim_fn = lambda a, b: ms_ssim(a, b, weights=self.weights)
            if B > 1:
                ssim_fn = jax.checkpoint(ssim_fn)
            s = ssim_fn(output[f"image{prex}"], tar)
            stats[f"ssim{prex}"] = jax.lax.stop_gradient(s)
            loss = loss + 0.5 * (1.0 - s)

            if f"rend_dist{prex}" in output and prex == "":
                active = (step > 1000).astype(jnp.float32)
                dist = output[f"rend_dist{prex}"].mean()
                stats[f"distortion{prex}"] = jax.lax.stop_gradient(dist)
                rn = output[f"rend_normal{prex}"]
                dn = output[f"depth_normal{prex}"]
                acc = jax.lax.stop_gradient(output[f"acc_map{prex}"])
                nerr = ((1.0 - (rn * dn).sum(-1)) * acc).mean()
                stats[f"normal{prex}"] = jax.lax.stop_gradient(nerr)
                loss = loss + active * (1000.0 * dist + 0.2 * nerr)

        return loss, stats
