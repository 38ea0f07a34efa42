"""End-to-end smoke tests of the full Network on a tiny config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # whole-network compiles (minutes on 1 CPU core)

from generativedensification_tpu.core.camera import fov_to_intrinsics
from generativedensification_tpu.core.rays import build_rays
from generativedensification_tpu.models.network import Network, NetworkConfig

H = W = 64
V_TOTAL = 4
V_SRC = 2
B = 2


def tiny_config(**over):
    kw = dict(
        n_views=V_SRC,
        encoder_backbone="tiny_test",
        n_groups=(4,),
        n_offset_groups=8,
        sh_degree=1,
        num_layers=2,
        num_heads=4,
        view_embed_dim=8,
        embedding_dim=32,
        vol_feat_reso=4,
        vol_embedding_reso=8,     # coarse grid = 16³ = 4096
        vol_embedding_out_dim=16,
        k_num=96,
        dec_depths=(1, 1),
        dec_channels=(32, 48),
        dec_num_head=(4, 6),
        dec_patch_size=(48, 48),
        drop_path=0.0,
        non_leaf_ratio=(0.75,),   # 192 -> 144 non-leaf / 48 leaf
        upscale_factor=(2, 4),
        mask_pool=192,
        tile_size=16,
        max_tiles=16,
        max_per_tile=512,
        raster_chunk=16,
    )
    kw.update(over)
    return NetworkConfig(**kw)


def make_batch(seed=0):
    from generativedensification_tpu.data.synthetic import orbit_c2ws
    from generativedensification_tpu.data.utils import align_first_view

    rng = np.random.default_rng(seed)
    c2ws = orbit_c2ws(V_TOTAL)
    c2ws, w2cs, _, _ = align_first_view(c2ws, np.linalg.inv(c2ws))
    fov = 0.7
    ixt = np.asarray(fov_to_intrinsics(fov, fov, W, H))
    rays_down = np.stack(
        [
            np.asarray(
                build_rays(
                    jnp.asarray(c2ws[:V_SRC]),
                    jnp.asarray(np.tile(ixt, (V_SRC, 1, 1))),
                    H,
                    W,
                    scale=1 / 16,
                )
            )
        ]
        * B
    )
    batch = {
        "tar_rgb": jnp.asarray(
            rng.uniform(size=(B, V_TOTAL, H, W, 3)), jnp.float32
        ),
        "tar_c2w": jnp.asarray(np.tile(c2ws, (B, 1, 1, 1))),
        "tar_w2c": jnp.asarray(np.tile(w2cs, (B, 1, 1, 1))),
        "tar_ixt": jnp.asarray(np.tile(ixt, (B, V_TOTAL, 1, 1))),
        "fovx": jnp.full((B,), fov),
        "fovy": jnp.full((B,), fov),
        "near_far": jnp.asarray(np.tile([0.5, 3.5], (B, 1)), jnp.float32),
        "bg_color": jnp.ones((B, V_TOTAL, 3), jnp.float32),
        "tar_rays_down": jnp.asarray(rays_down),
    }
    return batch


@pytest.fixture(scope="module")
def setup_net():
    cfg = tiny_config()
    net = Network(cfg)
    batch = make_batch()
    params = net.init(
        {"params": jax.random.PRNGKey(0)},
        batch,
        with_fine=True,
    )
    return cfg, net, batch, params


class TestCoarse:
    def test_shapes_and_finiteness(self, setup_net):
        cfg, net, batch, params = setup_net
        out = net.apply(params, batch, with_fine=False)
        assert out["image"].shape == (B, H, V_TOTAL * W, 3)
        assert out["depth"].shape == (B, H, V_TOTAL * W, 1)
        assert out["acc_map"].shape == (B, H, V_TOTAL * W)
        assert np.isfinite(np.asarray(out["image"])).all()
        centers, shs, opacity, scaling, rotation = out["render_pkg"][0]
        n_coarse = (cfg.vol_embedding_reso * 2) ** 3 * cfg.K
        assert centers.shape == (B, n_coarse, 3)
        assert shs.shape == (B, n_coarse, 4, 3)
        # coarse centers stay within one offset cell of the voxel grid
        assert float(jnp.abs(centers).max()) <= 0.5 + 0.5 * 0.5 / cfg.n_offset_groups


class TestFine:
    def test_full_pipeline(self, setup_net):
        cfg, net, batch, params = setup_net
        out = net.apply(params, batch, with_fine=True)
        assert out["image_fine"].shape == (B, H, V_TOTAL * W, 3)
        assert np.isfinite(np.asarray(out["image_fine"])).all()
        fine_pkg = out["render_pkg"][1]
        centers, sh, op, sc, rot, ok = fine_pkg
        # static union size: leaf0 + leaf1 + pool remainder
        sizes = cfg.level_sizes()
        expected = sizes[0]["leaf"] + sizes[1]["leaf"] + (cfg.mask_pool - cfg.k_num)
        assert centers.shape == (B, expected, 3)
        assert ok.dtype == bool

    def test_gradients_flow(self, setup_net):
        cfg, net, batch, params = setup_net

        def loss(p):
            out = net.apply(p, batch, with_fine=True)
            gt = jnp.concatenate(
                [batch["tar_rgb"][:, v] for v in range(V_TOTAL)], axis=2
            )
            return jnp.mean((out["image_fine"] - gt) ** 2) + jnp.mean(
                (out["image"] - gt) ** 2
            )

        g = jax.grad(loss)(params)
        flat = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        # the densifier head must receive gradient
        total = sum(float(jnp.abs(x).sum()) for x in flat)
        assert total > 0

    def test_residual_mode(self):
        cfg = tiny_config(enable_residual_attribute=True)
        net = Network(cfg)
        batch = make_batch(1)
        params = net.init({"params": jax.random.PRNGKey(1)}, batch, with_fine=True)
        out = net.apply(params, batch, with_fine=True)
        assert np.isfinite(np.asarray(out["image_fine"])).all()


class Test2DGSTraining:
    def test_train_step_with_surfel_renderer(self):
        """tpu.renderer=2dgs end-to-end: one train step, 2DGS regularizer
        terms active and finite gradients (VERDICT r1 item 4)."""
        from generativedensification_tpu.data.synthetic import make_probe_batch
        from generativedensification_tpu.train.loss import Losses
        from generativedensification_tpu.train.optim import make_optimizer
        from generativedensification_tpu.train.state import create_train_state
        from generativedensification_tpu.train.step import make_train_step

        cfg = NetworkConfig(
            n_views=2, encoder_backbone="tiny_test", n_groups=(4,),
            n_offset_groups=8, num_layers=1, num_heads=4, view_embed_dim=8,
            embedding_dim=32, vol_feat_reso=4, vol_embedding_reso=8,
            vol_embedding_out_dim=16, k_num=96, dec_depths=(1, 1),
            dec_channels=(32, 48), dec_num_head=(4, 6),
            dec_patch_size=(48, 48), drop_path=0.0, non_leaf_ratio=(0.75,),
            upscale_factor=(2, 4), mask_pool=192, tile_size=16, max_tiles=4,
            max_per_tile=256, raster_chunk=16, vmap_renders=True,
            renderer="2dgs",
        )
        net = Network(cfg)
        batch = make_probe_batch(B=1, V_total=4, H=64, W=64, n_views=2)
        params = net.init(
            {"params": jax.random.PRNGKey(0)}, batch, with_fine=True
        )
        tx, _ = make_optimizer(params, accumulate=1)
        state = create_train_state(params, tx)
        # step > 1000 so the distortion/normal loss terms are active
        state = state.replace(step=jnp.asarray(2000, jnp.int32))
        step_fn = make_train_step(net, tx, Losses(ssim_levels=2),
                                  with_fine=True, donate=False)
        new_state, stats = step_fn(state, batch)
        assert "distortion" in stats and "normal" in stats
        assert np.isfinite(float(stats["loss"]))
        assert np.isfinite(float(stats["grad_norm"]))
        assert float(stats["grad_norm"]) > 0


class TestStartFineSwitch:
    def test_coarse_phase_step_freezes_fine_params(self):
        """start_fine >= 0 runs a with_fine=False step until the switch:
        no fine losses, and the untouched fine-stage params must not decay
        (reference: Lightning DDP(find_unused_parameters) + torch AdamW
        skip grad-less params; VERDICT r1 item 7)."""
        from generativedensification_tpu.data.synthetic import make_probe_batch
        from generativedensification_tpu.train.loss import Losses
        from generativedensification_tpu.train.optim import make_optimizer
        from generativedensification_tpu.train.state import create_train_state
        from generativedensification_tpu.train.step import make_train_step

        cfg = NetworkConfig(
            n_views=2, encoder_backbone="tiny_test", n_groups=(4,),
            n_offset_groups=8, num_layers=1, num_heads=4, view_embed_dim=8,
            embedding_dim=32, vol_feat_reso=4, vol_embedding_reso=8,
            vol_embedding_out_dim=16, k_num=96, dec_depths=(1, 1),
            dec_channels=(32, 48), dec_num_head=(4, 6),
            dec_patch_size=(48, 48), drop_path=0.0, non_leaf_ratio=(0.75,),
            upscale_factor=(2, 4), mask_pool=192, tile_size=16, max_tiles=4,
            max_per_tile=256, raster_chunk=16, vmap_renders=True,
        )
        net = Network(cfg)
        batch = make_probe_batch(B=1, V_total=4, H=64, W=64, n_views=2)
        params = net.init(
            {"params": jax.random.PRNGKey(0)}, batch, with_fine=True
        )
        tx, _ = make_optimizer(params, accumulate=1, warmup_iters=1)
        state = create_train_state(params, tx)
        step_coarse = make_train_step(net, tx, Losses(ssim_levels=2),
                                      with_fine=False, donate=False)
        new_state, stats = step_coarse(state, batch)
        assert "psnr_fine" not in stats
        # fine-stage (densifier) params bitwise untouched
        for k in ("dec0", "dec1"):
            before = jax.tree.leaves(params["params"][k])
            after = jax.tree.leaves(new_state.params["params"][k])
            for a, b in zip(before, after):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # coarse-path params did move
        moved = any(
            np.any(np.asarray(a) != np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(params["params"]["vol_decoder"]),
                jax.tree.leaves(new_state.params["params"]["vol_decoder"]),
            )
        )
        assert moved


class TestExactSourceViews:
    def test_forward_with_only_source_views(self, setup_net):
        """A batch supplying exactly n_views views (no extra targets) must
        trace: the fused-selection path used to concat with an empty
        rest-render (r2 review finding)."""
        cfg, net, batch, params = setup_net
        per_view = {"tar_rgb", "tar_c2w", "tar_w2c", "tar_ixt", "bg_color"}
        b2 = {
            k: (v[:, :V_SRC] if k in per_view else v)
            for k, v in batch.items()
        }
        out = net.apply(params, b2, with_fine=True)
        assert out["image"].shape == (B, H, V_SRC * W, 3)
        assert np.isfinite(np.asarray(out["image_fine"])).all()



class TestOverflowWarmup:
    """r5 (VERDICT r4 ask #2): random-init splats must bin without drops
    under the WARMUP budgets (generous max_tiles/enum window, pair budget
    off), while deliberately tight budgets show the overflow instrument
    fires — the mechanism behind ``tpu.overflow_warmup_steps``.  The
    flagship-scale proof (512², 64³, overflow == 0 from random init at
    MT=9/ET=16/MPT=8192) is the BASELINE.md warmup-probe row."""

    def _overflow_at(self, over):
        from generativedensification_tpu.train.loss import Losses
        from generativedensification_tpu.train.optim import make_optimizer
        from generativedensification_tpu.train.state import create_train_state
        from generativedensification_tpu.train.step import make_train_step

        cfg = tiny_config(**over)
        net = Network(cfg)
        batch = make_batch(seed=7)
        params = net.init({"params": jax.random.PRNGKey(3)}, batch,
                          with_fine=True)
        tx, _ = make_optimizer(params)
        state = create_train_state(params, tx)
        step = make_train_step(net, tx, Losses(), with_fine=True)
        _, stats = step(state, batch)
        return float(stats["overflow"])

    @pytest.mark.slow
    def test_warmup_budgets_overflow_free_tight_overflows(self):
        # warmup-style: enum window larger than the slot budget, pair
        # budget off, generous per-tile cap
        assert self._overflow_at(dict(max_tiles=9, enum_tiles=16,
                                      max_per_tile=1024,
                                      pair_budget=0.0)) == 0.0
        # deliberately starved budgets: the instrument must see drops
        assert self._overflow_at(dict(max_tiles=1, enum_tiles=0,
                                      max_per_tile=8,
                                      pair_budget=0.0)) > 0.0
