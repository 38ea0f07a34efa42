"""End-to-end quality regression: overfit one synthetic scene.

The reference's de-facto acceptance suite is eval of released checkpoints
(SURVEY.md §4) — unavailable offline; this is the standing substitute:
train the tiny full pipeline (coarse + selection + densifier + fine render)
on one procedurally rendered scene and require real PSNR movement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from generativedensification_tpu.models.network import Network, NetworkConfig
from generativedensification_tpu.train.loss import Losses
from generativedensification_tpu.train.optim import make_optimizer
from generativedensification_tpu.train.state import create_train_state
from generativedensification_tpu.train.step import make_train_step


class _Cfg(dict):
    def __getattr__(self, k):
        return self[k]

    def get(self, k, d=None):
        return super().get(k, d)


def _scene_batch():
    from generativedensification_tpu.data.pipeline import collate, to_device_batch
    from generativedensification_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(_Cfg(
        img_size=[64, 64], n_group=2, n_scenes=1, n_gaussians=96,
    ))
    return to_device_batch(collate([ds[0]]))


def test_overfit_single_scene():
    cfg = NetworkConfig(
        n_views=2, encoder_backbone="tiny_test", n_groups=(4,),
        n_offset_groups=8, num_layers=1, num_heads=4, view_embed_dim=8,
        embedding_dim=32, vol_feat_reso=4, vol_embedding_reso=8,
        vol_embedding_out_dim=16, k_num=96, dec_depths=(1, 1),
        dec_channels=(32, 48), dec_num_head=(4, 6), dec_patch_size=(48, 48),
        drop_path=0.0, non_leaf_ratio=(0.75,), upscale_factor=(2, 4),
        # geometry-proof budgets: the 64px image has 4x4=16 tiles at 16px,
        # so max_tiles=16 makes binning exact for ANY splat size (early
        # training legitimately grows splats past a 4-tile budget, and the
        # trajectory is chaotic enough that a tight budget makes the
        # overflow==0 assertion below flaky); max_per_tile=1024 similarly
        # exceeds any possible per-tile occupancy of this scene
        mask_pool=192, tile_size=16, max_tiles=16, max_per_tile=1024,
        raster_chunk=16, vmap_renders=True,
    )
    net = Network(cfg)
    batch = _scene_batch()
    params = net.init({"params": jax.random.PRNGKey(0)}, batch, with_fine=True)
    tx, _ = make_optimizer(params, lr=2e-3, warmup_iters=20, accumulate=1)
    state = create_train_state(params, tx)
    step = make_train_step(net, tx, Losses(ssim_levels=2), with_fine=True)

    first_psnr = None
    stats = {}
    for i in range(90):
        state, stats = step(state, batch)
        if i == 4:
            first_psnr = float(stats["psnr"])
    final_psnr = float(stats["psnr"])
    final_fine = float(stats["psnr_fine"])

    assert np.isfinite(final_psnr) and np.isfinite(final_fine)
    assert final_psnr - first_psnr > 1.5, (
        f"coarse PSNR did not improve: {first_psnr:.2f} -> {final_psnr:.2f}"
    )
    assert final_psnr > 14.0, f"final coarse PSNR too low: {final_psnr:.2f}"
    assert float(stats["overflow"]) == 0.0


def test_overfit_single_scene_2dgs():
    """Config-4 quality regression: the surfel renderer + distortion/normal
    regularizers (reference ``renderer_2dgs.py`` + ``loss.py:50-61``) must
    also overfit the synthetic scene — PSNR moves, regularizer terms are
    live and finite, budgets drop nothing."""
    cfg = NetworkConfig(
        n_views=2, encoder_backbone="tiny_test", n_groups=(4,),
        n_offset_groups=8, num_layers=1, num_heads=4, view_embed_dim=8,
        embedding_dim=32, vol_feat_reso=4, vol_embedding_reso=8,
        vol_embedding_out_dim=16, k_num=96, dec_depths=(1, 1),
        dec_channels=(32, 48), dec_num_head=(4, 6), dec_patch_size=(48, 48),
        drop_path=0.0, non_leaf_ratio=(0.75,), upscale_factor=(2, 4),
        # geometry-proof budgets (see the 3DGS test above) — except
        # max_per_tile: the 1000x distortion weight legitimately blows
        # early-training surfels up until every one covers every 16px
        # tile, so per-tile occupancy reaches the full coarse set (16³ =
        # 4096), not the ~1k the 3DGS trajectory stays under (measured:
        # 12.4k dropped pairs at max_per_tile=1024)
        mask_pool=192, tile_size=16, max_tiles=16, max_per_tile=4096,
        raster_chunk=64, vmap_renders=True,
        renderer="2dgs",
    )
    net = Network(cfg)
    batch = _scene_batch()
    params = net.init({"params": jax.random.PRNGKey(0)}, batch, with_fine=True)
    tx, _ = make_optimizer(params, lr=2e-3, warmup_iters=20, accumulate=1)
    state = create_train_state(params, tx)
    # start past the iter>1000 gate so the distortion/normal terms are live
    state = state.replace(step=jnp.asarray(2000, jnp.int32))
    step = make_train_step(net, tx, Losses(ssim_levels=2), with_fine=True)

    first_fine = None
    stats = {}
    # 25 steps (was 60): the movement assert needs ~1/4 of the measured
    # 16.8 -> 23.1 trajectory, and the r3 budget review requires the slow
    # suite's worst file to fit a bounded CI chunk (pytest.ini)
    for i in range(25):
        state, stats = step(state, batch)
        if i == 4:
            first_fine = float(stats["psnr_fine"])
    final_fine = float(stats["psnr_fine"])

    assert "distortion" in stats and "normal" in stats
    assert np.isfinite(float(stats["distortion"]))
    assert np.isfinite(float(stats["normal"]))
    assert np.isfinite(float(stats["psnr"])) and np.isfinite(final_fine)
    # the coarse render is regularizer-dominated on this one tiny scene
    # (the reference's 1000x distortion weight, loss.py:50-61, applies to
    # the coarse prefix only) — the fine branch is the one that must
    # drive image quality (measured: 16.8 -> 23.1 over 60 steps)
    assert final_fine - first_fine > 1.0, (
        f"2DGS fine PSNR did not improve: {first_fine:.2f} -> {final_fine:.2f}"
    )
    assert float(stats["overflow"]) == 0.0


def test_overfit_single_scene_residual():
    """Config-3 quality regression: residual attribute mode
    (``enable_residual_attribute=True`` — ``epoch=49_residual.ckpt`` in
    the reference acceptance matrix) trains end-to-end: the
    MaskResModule softmax gate + GaussianResModule parent-attribute
    accumulation must let fine PSNR improve, with budgets dropping
    nothing."""
    cfg = NetworkConfig(
        n_views=2, encoder_backbone="tiny_test", n_groups=(4,),
        n_offset_groups=8, num_layers=1, num_heads=4, view_embed_dim=8,
        embedding_dim=32, vol_feat_reso=4, vol_embedding_reso=8,
        vol_embedding_out_dim=16, k_num=96, dec_depths=(1, 1),
        dec_channels=(32, 48), dec_num_head=(4, 6), dec_patch_size=(48, 48),
        drop_path=0.0, non_leaf_ratio=(0.75,), upscale_factor=(2, 4),
        # geometry-proof budgets (see the 3DGS test above)
        mask_pool=192, tile_size=16, max_tiles=16, max_per_tile=4096,
        raster_chunk=64, vmap_renders=True,
        enable_residual_attribute=True,
    )
    net = Network(cfg)
    batch = _scene_batch()
    params = net.init({"params": jax.random.PRNGKey(0)}, batch, with_fine=True)
    tx, _ = make_optimizer(params, lr=2e-3, warmup_iters=10, accumulate=1)
    state = create_train_state(params, tx)
    step = make_train_step(net, tx, Losses(ssim_levels=2), with_fine=True)

    first_fine = None
    stats = {}
    for i in range(30):
        state, stats = step(state, batch)
        if i == 2:
            first_fine = float(stats["psnr_fine"])
    final_fine = float(stats["psnr_fine"])

    assert np.isfinite(float(stats["psnr"])) and np.isfinite(final_fine)
    assert final_fine - first_fine > 0.5, (
        f"residual fine PSNR did not improve: {first_fine:.2f} -> {final_fine:.2f}"
    )
    assert float(stats["overflow"]) == 0.0
