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
    from ..utils.platform import jit_init

    ckpt = cfg.infer.ckpt_path
    if ckpt in (None, "None"):
        # random init (useful for pipeline smoke runs)
        return jit_init(net, sample_batch, with_fine=True)
    if os.path.isdir(ckpt):
        # template-free params-only restore: works on full training
        # checkpoints regardless of the optimizer state they carry
        from ..train.state import restore_params

        return jax.tree.map(jnp.asarray, restore_params(ckpt))
    if ckpt.endswith((".ckpt", ".pt", ".pth")):
        from ..utils.torch_convert import load_torch_network_params

        init = jit_init(net, sample_batch, with_fine=True)
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

    ft_cfg = icfg.get("finetuning", None)
    with_ft = bool(ft_cfg and ft_cfg.get("with_ft", False))

    per_scene = {}
    n_scenes = min(len(dataset), int(ds_cfg.get("n_scenes", len(dataset))))
    for i in range(n_scenes):
        sample_np = collate([dataset[i]])
        batch = to_device_batch(sample_np)
        out = fwd(params, batch)
        if with_ft:
            out = dict(out)
            out["image_fine"], out["render_pkg"] = finetune_scene(
                out, batch, net_cfg, ft_cfg, n_views
            )

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

        video_frames = int(icfg.get("video_frames", 0))
        save_mesh = bool(icfg.get("save_mesh", False))
        if video_frames > 0 or save_mesh:
            gaussians = _fine_gaussians(out["render_pkg"])
            tmats = sample_np.get("transform_mats")
            if tmats is not None:  # (B, 1, 4, 4) or (B, 4, 4) -> (4, 4)
                tmats = np.asarray(tmats).reshape(-1, 4, 4)[0]
            if video_frames > 0:
                _save_video(
                    icfg.save_folder, scene, gaussians, net_cfg,
                    ds_cfg.dataset_name, (H, W), tmats, video_frames,
                )
            if save_mesh:
                _save_mesh(
                    icfg.save_folder, scene, gaussians, net_cfg,
                    ds_cfg.dataset_name, (H, W), tmats,
                    int(icfg.get("mesh_video_frames", 0)),
                )

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


import functools


@functools.partial(jax.jit, static_argnames=("sh_degree", "raster_items"))
def _render_ft(p, shs, cam, bg, *, sh_degree, raster_items):
    """Render finetuned params; module-level + static config so the
    compile cache is shared across all scenes of an eval run."""
    from ..splat.rasterizer import rasterize

    return rasterize(
        p["xyz"], shs, jax.nn.sigmoid(p["opacity"][:, 0]),
        jnp.exp(p["scaling"]), p["rotation"], cam, bg,
        sh_degree, **dict(raster_items),
    ).image


def finetune_scene(out, batch, net_cfg, ft_cfg, n_views):
    """Per-scene Gaussian finetuning against the source views
    (``infer.finetuning`` group; reference machinery ``renderer.py:128-207``).

    Takes the feed-forward fine Gaussians, runs ``steps`` Adam iterations
    of render-MSE with the reference's per-attribute learning rates, then
    re-renders every view.  Returns (image_fine (1, H, V*W, 3), render_pkg
    with the refined last entry).
    """
    from ..core.camera import Camera
    from .finetune import finetune, params_from_gaussians

    centers, sh, op_raw, sc_raw, rot, ok = out["render_pkg"][-1]
    Nf = centers.shape[1]
    # dead slots: pin raw opacity far below the sigmoid knee so they stay
    # invisible through finetuning
    op_masked = jnp.where(ok[0][:, None], op_raw[0], -15.0)
    p = params_from_gaussians(
        centers[0], sh[0].reshape(Nf, -1, 3), op_masked, sc_raw[0], rot[0]
    )

    B, V_total, H, W, _ = batch["tar_rgb"].shape
    cams = Camera.from_c2w(
        batch["tar_c2w"][0], batch["fovx"][0], batch["fovy"][0],
        width=W, height=H,
        znear=batch["near_far"][0, 0], zfar=batch["near_far"][0, 1],
    )
    src_cams = jax.tree.map(lambda x: x[:n_views], cams)
    raster_kw = dict(
        tile_size=net_cfg.tile_size, max_tiles=net_cfg.max_tiles,
        max_per_tile=net_cfg.max_per_tile, chunk=net_cfg.raster_chunk,
    )
    p, _ = finetune(
        p, src_cams, batch["tar_rgb"][0, :n_views],
        batch["bg_color"][0, :n_views],
        sh_degree=net_cfg.sh_degree,
        steps=int(ft_cfg.get("steps", 500)),
        position_lr=float(ft_cfg.get("position_lr", 1.6e-5)),
        feature_lr=float(ft_cfg.get("feature_lr", 2.5e-3)),
        opacity_lr=float(ft_cfg.get("opacity_lr", 0.05)),
        scaling_lr=float(ft_cfg.get("scaling_lr", 5e-3)),
        rotation_lr=float(ft_cfg.get("rotation_lr", 1e-3)),
        raster_kw=raster_kw,
    )

    shs = jnp.concatenate([p["sh_dc"], p["sh_rest"]], axis=1)
    raster_items = tuple(sorted(raster_kw.items()))
    imgs = jnp.stack([
        _render_ft(
            p, shs, jax.tree.map(lambda x: x[j], cams),
            batch["bg_color"][0, j],
            sh_degree=net_cfg.sh_degree, raster_items=raster_items,
        )
        for j in range(V_total)
    ])  # (V, H, W, 3)
    image_fine = imgs.transpose(1, 0, 2, 3).reshape(1, H, V_total * W, 3)

    refined_pkg = list(out["render_pkg"])
    refined_pkg[-1] = (
        p["xyz"][None], shs.reshape(1, Nf, -1), p["opacity"][None, :, 0:1],
        p["scaling"][None], p["rotation"][None], ok,
    )
    return image_fine, refined_pkg


def _save_comparison(folder, scene, gt, coarse, fine):
    import imageio.v2 as imageio

    img = np.concatenate([gt, coarse, fine], axis=0)
    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    imageio.imwrite(os.path.join(folder, f"{scene}.jpg"), img)


def _fine_gaussians(render_pkg):
    """Cached fine Gaussians (reference ``return_buffer`` contract) ->
    activated attribute 5-tuple for re-rendering."""
    centers, sh, op_raw, sc_raw, rot, ok = render_pkg[-1]
    opa = jnp.where(ok[0], jax.nn.sigmoid(op_raw[0].reshape(-1)), 0.0)
    return (
        centers[0],
        sh[0].reshape(sh.shape[1], -1, 3),
        opa,
        jnp.exp(sc_raw[0]),
        rot[0],
    )


def _renderer(net_cfg):
    from ..splat import Renderer

    return Renderer(sh_degree=net_cfg.sh_degree, white_background=True)


def _render_frames(gaussians, cams, net_cfg):
    r = _renderer(net_cfg)

    # one jit over the Camera pytree — orbit/mesh paths render 16-48
    # frames of identical shape, eager execution is ~50x slower
    @jax.jit
    def one(cam, centers, sh, opa, scales, rot):
        return r.render_img(cam, None, centers, sh, opa, scales, rot,
                            max_tiles=net_cfg.max_tiles,
                            max_per_tile=net_cfg.max_per_tile)

    return [np.asarray(one(cam, *gaussians)["image"]) for cam in cams]


def _save_video(folder, scene, gaussians, net_cfg, ds_name, img_size, tmats,
                n_frames):
    """Orbit video of the cached fine Gaussians (``evaluation.py:169-194``)."""
    import imageio.v2 as imageio

    from ..tools.video_path import uni_video_path

    cams = uni_video_path(n_frames, ds_name, img_size, transform_mats=tmats)
    frames = _render_frames(gaussians, cams, net_cfg)
    arr = (np.clip(np.stack(frames), 0, 1) * 255).astype(np.uint8)
    try:
        imageio.mimwrite(os.path.join(folder, f"{scene}.mp4"), arr, fps=24)
    except Exception:  # no ffmpeg backend: fall back to per-frame PNGs
        for j, fr in enumerate(arr):
            imageio.imwrite(os.path.join(folder, f"{scene}_f{j:03d}.png"), fr)


def _save_mesh(folder, scene, gaussians, net_cfg, ds_name, img_size, tmats,
               turntable_frames):
    """TSDF-fuse fine-Gaussian RGB-D renders -> obj
    (``evaluation.py:197-208``, ``meshExtractor.py:31-139``)."""
    from ..tools.mesh_extractor import MeshExtractor, save_obj
    from ..tools.video_path import uni_mesh_path

    half = 0.5 * net_cfg.scene_size
    aabb = np.array([[-half] * 3, [half] * 3], np.float32)
    cams = uni_mesh_path(16, ds_name, img_size, transform_mats=tmats)
    mesh = MeshExtractor(_renderer(net_cfg), aabb).extract(
        gaussians, cams,
        max_tiles=net_cfg.max_tiles, max_per_tile=net_cfg.max_per_tile,
    )
    verts, faces, colors = mesh
    path = os.path.join(folder, f"{scene}.obj")
    save_obj(path, verts, faces, colors)
    if turntable_frames > 0 and len(faces):
        import imageio.v2 as imageio

        from ..tools.mesh_render import turntable_frames as tt

        frames = tt(verts, faces, n_frames=turntable_frames,
                    colors=colors, size=img_size[0])
        arr = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
        for j, fr in enumerate(arr):
            imageio.imwrite(
                os.path.join(folder, f"{scene}_mesh{j:03d}.png"), fr
            )
