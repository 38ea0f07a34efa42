"""Evaluation-loop smoke test: metrics JSON schema + the orbit-video and
TSDF-mesh side outputs (reference ``evaluation.py:45-229``), tiny config on
the synthetic dataset with random init."""

import json
import os

from generativedensification_tpu.config import load_config
from generativedensification_tpu.eval.evaluation import main as eval_main

TINY = [
    "n_views=2",
    "model.encoder_backbone=tiny_test",
    "model.n_groups=[4]",
    "model.n_offset_groups=8",
    "model.num_layers=2",
    "model.num_heads=4",
    "model.view_embed_dim=8",
    "model.embedding_dim=32",
    "model.vol_feat_reso=4",
    "model.vol_embedding_reso=8",
    "model.vol_embedding_out_dim=16",
    "model.k_num=96",
    "model.dec_depths=[1,1]",
    "model.dec_channels=[32,48]",
    "model.dec_num_head=[4,6]",
    "model.dec_patch_size=[48,48]",
    "model.drop_path=0.0",
    "model.non_leaf_ratio=[0.75]",
    "model.upscale_factor=[2,4]",
    "model.mask_pool=192",
    "tpu.tile_size=16",
    "tpu.max_tiles=8",
    "tpu.max_per_tile=256",
    "tpu.raster_chunk=16",
]


def test_eval_loop_with_video_and_mesh(tmp_path):
    cfg = load_config(
        overrides=TINY + [
            "infer.dataset.dataset_name=synthetic",
            "infer.dataset.n_scenes=1",
            "infer.dataset.img_size=[64,64]",
            "infer.dataset.n_views=2",
            "infer.ckpt_path=None",
            f"infer.save_folder={tmp_path}",
            f"infer.metric_path={tmp_path}/metrics.json",
            "infer.video_frames=2",
            "infer.save_mesh=True",
            "infer.mesh_video_frames=1",
            "infer.eval_lpips=False",
            "infer.save_images=1",
        ],
        infer=True,
    )
    result = eval_main(cfg)
    assert result["mean"]["psnr"] > 0
    scenes = result["scenes"]
    assert len(scenes) == 1
    rec = next(iter(scenes.values()))
    for k in ("psnr", "psnr_coarse", "psnr_fine", "ssim"):
        assert k in rec

    with open(tmp_path / "metrics.json") as f:
        assert json.load(f)["mean"]["psnr"] == result["mean"]["psnr"]

    files = os.listdir(tmp_path)
    assert any(f.endswith(".jpg") for f in files), files            # comparison
    assert any(f.endswith((".mp4", ".png")) and "_mesh" not in f
               for f in files), files                               # video
    assert any(f.endswith(".obj") for f in files), files            # mesh


import pytest


@pytest.mark.slow
def test_eval_finetuning_improves_source_mse(tmp_path):
    """infer.finetuning.with_ft wiring (VERDICT r1 item 6): the eval loop
    runs per-scene finetuning and the refined Gaussians render the source
    views with lower MSE than the feed-forward output."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from generativedensification_tpu.data.pipeline import collate, to_device_batch
    from generativedensification_tpu.data.synthetic import SyntheticDataset
    from generativedensification_tpu.eval.evaluation import (
        build_model,
        finetune_scene,
        load_params,
    )

    cfg = load_config(
        None,
        TINY + [
            "infer.dataset.dataset_name=synthetic",
            "infer.dataset.n_scenes=1",
            "infer.dataset.img_size=[64,64]",
            "infer.dataset.n_group=2",
            "infer.finetuning.with_ft=True",
            "infer.finetuning.steps=40",
            f"infer.save_folder={tmp_path}",
        ],
        infer=True,
    )
    net, net_cfg = build_model(cfg)
    ds = SyntheticDataset(cfg.infer.dataset)
    sample = collate([ds[0]])
    batch = to_device_batch(sample)
    params = load_params(cfg, net, batch)
    out = jax.jit(
        lambda p, b: net.apply(p, b, with_fine=True, deterministic=True)
    )(params, batch)

    B, V, H, W, _ = batch["tar_rgb"].shape
    n_views = cfg.n_views
    gt = batch["tar_rgb"].transpose(0, 2, 1, 3, 4).reshape(1, H, V * W, 3)
    src = slice(0, W * n_views)
    mse_before = float(jnp.mean(
        (out["image_fine"][:, :, src] - gt[:, :, src]) ** 2
    ))
    image_fine, _ = finetune_scene(
        out, batch, net_cfg, cfg.infer.finetuning, n_views
    )
    mse_after = float(jnp.mean(
        (image_fine[:, :, src] - gt[:, :, src]) ** 2
    ))
    assert np.isfinite(mse_after)
    assert mse_after < mse_before, (mse_before, mse_after)
