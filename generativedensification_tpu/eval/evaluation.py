"""Evaluation loop — reference ``evaluation.py:45-229`` equivalent.

Per scene: forward (coarse + fine), metrics on novel-view columns only
(``eval_novel_view_only`` crops columns past ``W * n_views``), per-scene
PSNR = max(fine, coarse) (``evaluation.py:128-134``), SSIM, optional LPIPS
(gated on converted weights), optional masked depth metrics; dumps the
per-scene JSON schema consumed by ``metric_co3d``.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..data import dataset_dict
from ..data.pipeline import collate, to_device_batch
from ..models.network import Network, NetworkConfig
from .metrics import acc_threshold, abs_error, lpips_fn, psnr_img, ssim_img


def build_model(cfg):
    net_cfg = NetworkConfig.from_config(cfg)
    return Network(net_cfg), net_cfg


def load_params(cfg, net, sample_batch):
    """Restore params from cfg.infer.ckpt_path (orbax dir or torch ckpt)."""
    ckpt = cfg.infer.ckpt_path
    if ckpt in (None, "None"):
        # random init (useful for pipeline smoke runs)
        return net.init({"params": jax.random.PRNGKey(0)}, sample_batch, with_fine=True)
    if os.path.isdir(ckpt):
        from ..train.state import restore_checkpoint, TrainState
        import optax

        template_params = jax.eval_shape(
            lambda: net.init(
                {"params": jax.random.PRNGKey(0)}, sample_batch, with_fine=True
            )
        )
        # restore params-only through a minimal state template
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template_params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=zeros,
            opt_state=optax.identity().init(zeros), rng=jax.random.PRNGKey(0),
        )
        return restore_checkpoint(ckpt, state).params
    if ckpt.endswith((".ckpt", ".pt", ".pth")):
        from ..utils.torch_convert import load_torch_network_params

        init = net.init(
            {"params": jax.random.PRNGKey(0)}, sample_batch, with_fine=True
        )
        return load_torch_network_params(ckpt, init)
    raise FileNotFoundError(ckpt)


def main(cfg: ConfigNode) -> dict:
    icfg = cfg.infer
    ds_cfg = icfg.dataset
    dataset = dataset_dict[ds_cfg.dataset_name](ds_cfg)
    os.makedirs(icfg.save_folder, exist_ok=True)

    n_views = cfg.n_views
    eval_depth = list(icfg.get("eval_depth", []) or [])
    want_lpips = bool(icfg.get("eval_lpips", False))

    net, net_cfg = build_model(cfg)
    sample = to_device_batch(collate([dataset[0]]))
    params = load_params(cfg, net, sample)

    fwd = jax.jit(
        lambda p, b: net.apply(p, b, with_fine=True, deterministic=True)
    )

    lpips_vgg = lpips_alex = None
    if want_lpips:
        lpips_vgg = lpips_fn("vgg")
        lpips_alex = lpips_fn("alex")

    per_scene = {}
    n_scenes = min(len(dataset), int(ds_cfg.get("n_scenes", len(dataset))))
    for i in range(n_scenes):
        sample_np = collate([dataset[i]])
        batch = to_device_batch(sample_np)
        out = fwd(params, batch)

        B, V, H, W, _ = batch["tar_rgb"].shape
        gt = batch["tar_rgb"].transpose(0, 2, 1, 3, 4).reshape(1, H, V * W, 3)
        img_c = out["image"]
        img_f = out["image_fine"]
        if icfg.eval_novel_view_only:
            sl = slice(W * n_views, None)
            gt_e, c_e, f_e = gt[:, :, sl], img_c[:, :, sl], img_f[:, :, sl]
        else:
            gt_e, c_e, f_e = gt, img_c, img_f

        psnr_c = float(psnr_img(c_e, gt_e))
        psnr_f = float(psnr_img(f_e, gt_e))
        scene = sample_np["meta"][0]["scene"]
        rec = {
            "psnr": max(psnr_f, psnr_c),
            "psnr_coarse": psnr_c,
            "psnr_fine": psnr_f,
            "ssim": float(ssim_img(f_e, gt_e)),
        }
        if lpips_vgg is not None:
            rec["lpips_vgg"] = float(lpips_vgg(f_e * 2 - 1, gt_e * 2 - 1))
            rec["lpips_alex"] = float(lpips_alex(f_e * 2 - 1, gt_e * 2 - 1))
        if eval_depth and "tar_dep" in sample_np:
            dep_gt = sample_np["tar_dep"][0]        # (V, H, W)
            msk = sample_np["tar_msk"][0] > 0
            dep_pred = np.asarray(out["depth_fine"][0, ..., 0]).reshape(H, V, W)
            dep_pred = dep_pred.transpose(1, 0, 2)
            nv = slice(n_views, None) if icfg.eval_novel_view_only else slice(None)
            err = abs_error(dep_pred[nv], dep_gt[nv], msk[nv])
            rec["depth_abs_err"] = float(err.mean())
            for t in eval_depth:
                rec[f"depth_acc_{t}"] = float(
                    acc_threshold(dep_pred[nv], dep_gt[nv], msk[nv], t).mean()
                )
        per_scene[scene] = rec

        if i < int(icfg.get("save_images", 8)):
            _save_comparison(icfg.save_folder, scene, np.asarray(gt[0]),
                             np.asarray(img_c[0]), np.asarray(img_f[0]))

    means = {}
    if per_scene:
        keys = next(iter(per_scene.values())).keys()
        means = {k: float(np.mean([v[k] for v in per_scene.values()])) for k in keys}
    result = {"mean": means, "scenes": per_scene}

    metric_path = icfg.get("metric_path", "None")
    if metric_path and metric_path != "None":
        os.makedirs(os.path.dirname(os.path.abspath(metric_path)), exist_ok=True)
        with open(metric_path, "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps(means, indent=2))
    return result


def _save_comparison(folder, scene, gt, coarse, fine):
    import imageio.v2 as imageio

    img = np.concatenate([gt, coarse, fine], axis=0)
    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    imageio.imwrite(os.path.join(folder, f"{scene}.jpg"), img)
