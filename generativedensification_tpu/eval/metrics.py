"""Evaluation metrics with the reference's exact definitions.

  * PSNR over [0,1] images (``evaluation.py:124-134``),
  * SSIM = pytorch_msssim.ssim semantics (``evaluation.py:137``),
  * depth abs-err / acc@threshold, masked (``tools/depth.py:3-14``),
  * LPIPS (vgg/alex) — requires pretrained feature weights which cannot be
    downloaded in this environment; ``lpips_fn`` loads a converted weight
    file if present, otherwise raises with instructions (gated exactly like
    open3d/mesh extras).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..train.loss import ms_ssim, ssim


def psnr_img(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def ssim_img(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """NHWC or HWC in [0, 1]."""
    if pred.ndim == 3:
        pred, gt = pred[None], gt[None]
    return ssim(pred, gt)


def ms_ssim_img(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    if pred.ndim == 3:
        pred, gt = pred[None], gt[None]
    return ms_ssim(pred, gt)


def abs_error(pred_depth, gt_depth, mask):
    """Masked mean |pred - gt| (``tools/depth.py:3-7``)."""
    pred = np.asarray(pred_depth)[np.asarray(mask)]
    gt = np.asarray(gt_depth)[np.asarray(mask)]
    return np.abs(pred - gt)


def acc_threshold(pred_depth, gt_depth, mask, threshold):
    """Fraction of masked pixels with |err| < threshold
    (``tools/depth.py:9-14``)."""
    err = abs_error(pred_depth, gt_depth, mask)
    return (err < threshold).astype(np.float32)


_LPIPS_CACHE = {}


def lpips_fn(net: str = "vgg", weights_path: str | None = None):
    """Return ``f(pred, gt) -> scalar`` LPIPS; inputs HWC in [-1, 1].

    Needs converted pretrained weights (VGG16/AlexNet features + linear
    calibration).  Set ``weights_path`` or the env var ``LPIPS_WEIGHTS_NPZ``
    to an .npz produced by ``tools/convert_lpips.py``.
    """
    key = (net, weights_path)
    if key in _LPIPS_CACHE:
        return _LPIPS_CACHE[key]
    path = weights_path or os.environ.get("LPIPS_WEIGHTS_NPZ")
    if path is None or not os.path.exists(path or ""):
        raise NotImplementedError(
            "LPIPS needs pretrained feature weights, which cannot be "
            "downloaded in this environment. Run tools/convert_lpips.py on a "
            "machine with torch+lpips to produce an .npz, then set "
            "LPIPS_WEIGHTS_NPZ."
        )
    from .lpips import load_lpips

    fn = load_lpips(path, net)
    _LPIPS_CACHE[key] = fn
    return fn
