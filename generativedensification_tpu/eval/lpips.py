"""LPIPS perceptual metric in jnp (VGG16 / AlexNet feature backbones).

Architecture-faithful reimplementation of the lpips package: imagenet-
normalized input, backbone feature maps at the standard tap points,
channel-unit-normalized differences, 1x1 linear calibration weights,
spatial mean, sum over taps.  Weights come from an .npz produced by
``tools/convert_lpips.py`` (keys: ``{tap}/conv{i}/kernel|bias`` for the
backbone and ``lin{i}/kernel`` for the calibration heads, plus
``shift``/``scale``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# conv indices (counting convs only) after whose relu features are tapped:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 (lpips vgg16 slices)
_VGG_TAPS = (1, 3, 6, 9, 12)

_ALEX_CFG = [
    # (out, kernel, stride, pad)
    (64, 11, 4, 2),
    ("M",),
    (192, 5, 1, 2),
    ("M",),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]


def _conv(x, w, b, stride=1, pad=1):
    y = jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _unit_normalize(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True))
    return f / (n + eps)


def load_lpips(path: str, net: str = "vgg"):
    data = dict(np.load(path))
    shift = jnp.asarray(data["shift"]).reshape(1, 1, 1, 3)
    scale = jnp.asarray(data["scale"]).reshape(1, 1, 1, 3)

    if net == "vgg":
        def features(x):
            feats = []
            ci = 0
            for v in _VGG_CFG:
                if v == "M":
                    x = _maxpool(x)
                else:
                    w = jnp.asarray(data[f"conv{ci}/kernel"])
                    b = jnp.asarray(data[f"conv{ci}/bias"])
                    x = jax.nn.relu(_conv(x, w, b, 1, 1))
                    if ci in _VGG_TAPS:
                        feats.append(x)
                    ci += 1
            return feats
        n_taps = 5
    elif net == "alex":
        def features(x):
            feats = []
            ci = 0
            for spec in _ALEX_CFG:
                if spec[0] == "M":
                    x = _maxpool(x)
                else:
                    out, k, s, p = spec
                    w = jnp.asarray(data[f"conv{ci}/kernel"])
                    b = jnp.asarray(data[f"conv{ci}/bias"])
                    x = jax.nn.relu(_conv(x, w, b, s, p))
                    feats.append(x)
                    ci += 1
            return feats
        n_taps = 5
    else:
        raise ValueError(f"net must be vgg|alex, got {net}")

    lins = [jnp.asarray(data[f"lin{i}/kernel"]) for i in range(n_taps)]

    @jax.jit
    def lpips(pred, gt):
        """pred/gt: (H, W, 3) or (N, H, W, 3) in [-1, 1]."""
        if pred.ndim == 3:
            pred, gt = pred[None], gt[None]
        x = (pred - shift) / scale
        y = (gt - shift) / scale
        fx = features(x)
        fy = features(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            # 1x1 conv with non-negative calibration weights
            v = jnp.einsum("nhwc,c->nhw", d, lins[i].reshape(-1))
            total = total + v.mean(axis=(1, 2))
        return total.mean()

    return lpips
