"""The full Generative Densification network, TPU-native.

Re-design of ``lightning/network.py:318-979`` under JAX's static-shape
discipline (SURVEY.md §7.3):

  * the per-sample / per-view Python render loops (:813-840, :964-973)
    become ``vmap`` over (B, V) of the tiled rasterizer;
  * the dynamic opacity mask (:804-805) + ``_check_mask`` heuristics
    (:725-732) become a *static* top-``mask_pool`` opacity gather with a
    validity mask;
  * gradient-guided selection (:842-896) is a plain ``jax.grad`` of an
    isolated render-MSE closure — the AbsGS channels arrive as the
    gradient of the zero ``screen_abs`` input (custom-VJP contract of
    ``splat.composite``), exactly the reference's ``means2D.grad[:, 2:4]``;
  * top-k selection has static ``k_num``; every decoder level count is
    static (12k -> 24k -> 19.2k/4.8k -> 76.8k for the release config);
  * the fine render unions the decoder leaves with the non-selected pool
    remainder (:947-959), all sizes static, dead slots culled by mask.

Note on selection loss: the reference accidentally broadcasts the rendered
sample against every sample's ground truth (``network.py:858-861``); we
compute the per-sample MSE against its own ground truth (monotone rescaling
doesn't change the top-k ranking).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flax import struct

from ..core.camera import Camera
from ..core.rays import camera_rays, rays_to_plucker
from ..core.sh import rsh_cart
from ..points.modules import (
    Block,
    GaussianModule,
    GlobalPooling,
    MaskModule,
    MaskResModule,
    UpscaleModule,
    split_attributes,
)
from ..points.ops import topk_split
from ..points.structure import (
    PointSet,
    compute_neighbor_idx,
    serialize_pointset,
)
from ..splat.rasterizer import rasterize
from ..splat.surfel import depth_to_normal, rasterize_surfels
from .backbone import (
    GaussianDecoder,
    ModLN,
    VolTransformer,
    bilinear_sample,
    build_dense_grid,
    project_points,
)
from .vit import DinoEncoder


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    """Static hyperparameters (mirrors ``configs/base.yaml`` model group)."""

    n_views: int = 4
    encoder_backbone: str = "vit_base_patch16_224.dino"
    n_groups: tuple = (16,)
    n_offset_groups: int = 32
    K: int = 1
    sh_degree: int = 1
    num_layers: int = 12
    num_heads: int = 16
    view_embed_dim: int = 32
    embedding_dim: int = 256
    vol_feat_reso: int = 16
    vol_embedding_reso: int = 32
    vol_embedding_out_dim: int = 80
    # point decoder
    k_num: int = 12000
    order: tuple = ("z", "z-trans", "hilbert", "hilbert-trans")
    stride: tuple = (2,)
    dec_depths: tuple = (2, 2)
    dec_channels: tuple = (160, 256)
    dec_num_head: tuple = (20, 32)
    dec_patch_size: tuple = (48, 48)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.3
    pre_norm: bool = True
    shuffle_orders: bool = True
    enable_ada_lnnorm: bool = True
    upscale_factor: tuple = (2, 4)
    n_frequencies: int = 15
    enable_absolute_pe: bool = False
    enable_upscale_drop_path: bool = True
    use_mask: bool = True
    temperature: float = 1.0
    non_leaf_ratio: tuple = (0.8,)
    mask_sampling_type: str = "topk"
    enable_residual_attribute: bool = False
    pdnorm_ln: bool = False
    pdnorm_conditions: tuple = ("ScanNet", "S3DIS", "Structured3D")
    # TPU static-shape knobs (no reference counterpart)
    mask_pool: int = 49152        # static stand-in for the opacity mask
    tile_size: int = 32
    max_tiles: int = 4   # slot budget per Gaussian; every slot-space cost is
                         # linear in it and the voxel-scale primitives of
                         # this pipeline never cover more than 4 tiles at
                         # 32px (outputs carry an `overflow` counter)
    max_per_tile: int = 4096
    enum_tiles: int = 0  # >max_tiles: enumerate+compact that many rect
                         # tiles per gaussian before the slot budget
                         # (binning.py culling; 0 = enumerate max_tiles)
    raster_chunk: int = 32
    white_bkgd: bool = True
    scene_size: float = 0.5
    # bf16-mixed policy (reference: precision="bf16-mixed",
    # train_lightning.py:79): transformers/MLPs compute in compute_dtype
    # with f32 params; fp32 islands = softmax stats, LN stats, Gaussian
    # heads, rasterizer, loss.  "float32" disables.
    compute_dtype: str = "float32"
    renderer: str = "3dgs"  # "3dgs" | "2dgs" (tpu.renderer config knob)
    depth_ratio: float = 0.0  # 2DGS expected/median depth blend
                              # (renderer_2dgs.py:261; 0 = expected)
    backend: str = "auto"     # rasterizer backend: auto | pallas | xla
    # vmap the per-sample render/selection loops over B instead of Python
    # unrolling.  On TPU the unrolled form is faster (vmap loses the
    # rasterizer data plane's layout pinning, PERF.md) but the unroll
    # traces B copies of the graph — on the virtual CPU mesh (dryrun,
    # tests, B = n_devices) vmap cuts compile time ~B-fold.
    vmap_renders: bool = False
    # fuse the selection-gradient pass with the coarse source-view render
    # (one jax.vjp; saves V forward rasterizations/sample/step).  Off
    # reproduces the reference's isolated re-render closure exactly.
    share_selection: bool = True
    # rematerialize each view's render in the backward.  True trades one
    # full forward recompute per render (~35ms at 262k: slab gather + fwd
    # kernel + binning) for ~50MB of saved residuals per render — needed
    # when many renders' residuals would OOM the chip (B>1 at 512²).
    remat_renders: bool = True
    # static live-pair budget as avg (gaussian, tile) pairs per gaussian
    # (0 = off, worst-case N*max_tiles slots).  Voxel-scale primitives
    # average well under 2 covered tiles at 512²/32px; every slot-space
    # cost (slab gathers, kernels, grad slab) scales with this budget.
    # Dropped pairs count into the overflow diagnostic.
    pair_budget: float = 0.0

    @classmethod
    def from_config(cls, cfg: Any) -> "NetworkConfig":
        m = cfg.model
        tpu = cfg.get("tpu", {})
        get = lambda node, k, d: node.get(k, d) if hasattr(node, "get") else d
        return cls(
            n_views=cfg.n_views,
            encoder_backbone=m.encoder_backbone,
            n_groups=tuple(m.n_groups),
            n_offset_groups=m.n_offset_groups,
            K=m.K,
            sh_degree=m.sh_degree,
            num_layers=m.num_layers,
            num_heads=m.num_heads,
            view_embed_dim=m.view_embed_dim,
            embedding_dim=m.embedding_dim,
            vol_feat_reso=m.vol_feat_reso,
            vol_embedding_reso=m.vol_embedding_reso,
            vol_embedding_out_dim=m.vol_embedding_out_dim,
            k_num=m.k_num,
            order=tuple(m.order),
            stride=tuple(m.stride),
            dec_depths=tuple(m.dec_depths),
            dec_channels=tuple(m.dec_channels),
            dec_num_head=tuple(m.dec_num_head),
            dec_patch_size=tuple(m.dec_patch_size),
            mlp_ratio=m.mlp_ratio,
            qkv_bias=m.qkv_bias,
            qk_scale=m.qk_scale,
            attn_drop=m.attn_drop,
            proj_drop=m.proj_drop,
            drop_path=m.drop_path,
            pre_norm=m.pre_norm,
            shuffle_orders=m.shuffle_orders,
            enable_ada_lnnorm=m.enable_ada_lnnorm,
            upscale_factor=tuple(m.upscale_factor),
            n_frequencies=m.n_frequencies,
            enable_absolute_pe=m.enable_absolute_pe,
            enable_upscale_drop_path=m.enable_upscale_drop_path,
            use_mask=m.use_mask,
            temperature=m.temperature,
            non_leaf_ratio=tuple(m.non_leaf_ratio),
            mask_sampling_type=m.mask_sampling_type,
            enable_residual_attribute=m.enable_residual_attribute,
            pdnorm_ln=get(m, "pdnorm_ln", cls.pdnorm_ln),
            pdnorm_conditions=tuple(
                get(m, "pdnorm_conditions", cls.pdnorm_conditions) or ()
            ),
            mask_pool=get(m, "mask_pool", cls.mask_pool),
            tile_size=get(tpu, "tile_size", cls.tile_size),
            max_tiles=get(tpu, "max_tiles", cls.max_tiles),
            max_per_tile=get(tpu, "max_per_tile", cls.max_per_tile),
            enum_tiles=get(tpu, "enum_tiles", cls.enum_tiles),
            compute_dtype=get(tpu, "compute_dtype", cls.compute_dtype),
            renderer=get(tpu, "renderer", cls.renderer),
            depth_ratio=get(tpu, "depth_ratio", cls.depth_ratio),
            vmap_renders=get(tpu, "vmap_renders", cls.vmap_renders),
            backend=get(tpu, "rasterizer_backend", cls.backend),
            share_selection=get(tpu, "share_selection", cls.share_selection),
            remat_renders=get(tpu, "remat_renders", cls.remat_renders),
            pair_budget=get(tpu, "pair_budget", cls.pair_budget),
        )

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def sh_dim(self) -> int:
        return 3 * (self.sh_degree + 1) ** 2

    @property
    def voxel_size(self) -> float:
        return 2.0 / (self.vol_embedding_reso * 2)

    @property
    def opacity_shift(self) -> float:
        return -2.1792

    @property
    def scaling_shift(self) -> float:
        return math.log(0.5 * self.voxel_size / 3.0)

    @property
    def fine_scaling_shift(self) -> float:
        return math.log(0.5 * self.voxel_size / (8 * 3.0))

    def level_sizes(self) -> list[dict]:
        """Static per-level point counts of the densification decoder."""
        sizes = []
        n = self.k_num
        n_levels = len(self.dec_channels)
        for s in range(n_levels):
            up = n * self.upscale_factor[s]
            ratio = self.non_leaf_ratio[s] if s < n_levels - 1 else 1.0
            k = math.ceil(up * ratio) if ratio < 1.0 else up
            sizes.append(
                dict(level=s, in_pts=n, up_pts=up, non_leaf=k,
                     leaf=(up - k) if ratio < 1.0 else up)
            )
            n = k
        return sizes


@struct.dataclass
class SurfelViewRenders:
    """Per-view 2DGS render outputs (the reference renderer_2dgs.py:224-269
    surface): the extra normal/distortion maps drive the 2DGS regularizers
    in ``train/loss.py:142-152``."""

    image: jnp.ndarray         # (V, H, W, 3)
    alpha: jnp.ndarray         # (V, H, W)
    depth: jnp.ndarray         # (V, H, W) surf_depth blend
    radii: jnp.ndarray         # (V, N)
    overflow: jnp.ndarray      # (V,)
    dist: jnp.ndarray          # (V, H, W) distortion map
    rend_normal: jnp.ndarray   # (V, H, W, 3) world-space rendered normal
    depth_normal: jnp.ndarray  # (V, H, W, 3) depth-derived pseudo normal
    sel_abs: jnp.ndarray | None = None  # (V, N, 2) fused AbsGS selection


class DensifierStage(nn.Module):
    """One decoder level: [serialize] -> blocks -> upscale -> mask/head."""

    cfg: NetworkConfig
    stage: int

    @nn.compact
    def __call__(self, ps: PointSet, deterministic: bool = True):
        cfg = self.cfg
        s = self.stage
        n_levels = len(cfg.dec_channels)
        last = s == n_levels - 1
        out_ch = cfg.dec_channels[s + 1] if not last else cfg.dec_channels[s]
        ratio = cfg.non_leaf_ratio[s] if not last else 1.0
        if not cfg.use_mask:
            ratio = 1.0

        # reversed drop-path schedule (network.py:436-438)
        total = sum(cfg.dec_depths)
        dpr = [cfg.drop_path * i / max(total - 1, 1) for i in range(total)][::-1]
        off = sum(cfg.dec_depths[:s])
        dpr_s = dpr[off: off + cfg.dec_depths[s]]

        if s == 0 and cfg.enable_ada_lnnorm:
            ps = GlobalPooling(name="global")(ps)

        shuffle_key = (
            self.make_rng("shuffle")
            if (cfg.shuffle_orders and not deterministic and self.has_rng("shuffle"))
            else None
        )
        ps = serialize_pointset(ps, cfg.order, shuffle_key=shuffle_key)
        ps = compute_neighbor_idx(ps)

        for i in range(cfg.dec_depths[s]):
            ps = Block(
                channels=cfg.dec_channels[s],
                num_heads=cfg.dec_num_head[s],
                patch_size=cfg.dec_patch_size[s],
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale,
                attn_drop=cfg.attn_drop,
                proj_drop=cfg.proj_drop,
                drop_path=dpr_s[i],
                pre_norm=cfg.pre_norm,
                order_index=i % len(cfg.order),
                dtype=cfg.dtype,
                pdnorm_n=len(cfg.pdnorm_conditions) if cfg.pdnorm_ln else 0,
                name=f"block{i}",
            )(ps, deterministic=deterministic)

        ps = UpscaleModule(
            in_channels=cfg.dec_channels[s],
            out_channels=out_ch,
            upscale_factor=cfg.upscale_factor[s],
            n_frequencies=cfg.n_frequencies,
            drop_path=dpr_s[-1] if cfg.enable_upscale_drop_path else 0.0,
            enable_absolute_pe=cfg.enable_absolute_pe,
            is_first=(s == 0),
            carry_attribute=cfg.enable_residual_attribute,
            dtype=cfg.dtype,
            pdnorm_n=len(cfg.pdnorm_conditions) if cfg.pdnorm_ln else 0,
            name="up",
        )(ps, deterministic=deterministic)

        if cfg.enable_residual_attribute:
            # head first, then mask (network.py:542-569)
            attr = GaussianModule(out_ch, cfg.sh_degree, name="head")(ps.feat)
            if ps.attribute is not None and s > 0:
                attr = attr + ps.attribute
            ps = ps.replace(attribute=attr)
            ps, split_idx, non_leaf_mask = MaskResModule(
                out_ch, cfg.temperature, ratio, cfg.mask_sampling_type,
                name="mask",
            )(ps)
            if split_idx is None and non_leaf_mask is not None:
                # top_p: full-size sets with validity masks (points/ops.py)
                non_leaf = ps.replace(mask=non_leaf_mask)
                leaf = ps.replace(mask=ps.mask & ~non_leaf_mask)
            elif split_idx is None:
                non_leaf, leaf = ps, ps
            else:
                from ..points.structure import gather_points

                top_idx, rest_idx = split_idx
                non_leaf = gather_points(ps, top_idx)
                non_leaf = non_leaf.replace(
                    mask=jnp.take_along_axis(non_leaf_mask, top_idx, axis=1)
                )
                leaf = gather_points(ps, rest_idx)
                leaf = leaf.replace(
                    mask=jnp.take_along_axis(
                        (~non_leaf_mask) & ps.mask, rest_idx, axis=1
                    )
                )
            if not last:
                # next level serializes at a finer grid (autoencoder.py:1027)
                non_leaf = non_leaf.replace(
                    grid_size=non_leaf.grid_size / cfg.stride[s]
                )
            return non_leaf, leaf
        else:
            non_leaf, leaf = MaskModule(
                out_ch, cfg.temperature, ratio, cfg.mask_sampling_type,
                name="mask",
            )(ps)
            attr = GaussianModule(out_ch, cfg.sh_degree, name="head")(leaf.feat)
            leaf = leaf.replace(attribute=attr)
            if not last:
                non_leaf = non_leaf.replace(
                    grid_size=non_leaf.grid_size / cfg.stride[s]
                )
            return non_leaf, leaf


class Network(nn.Module):
    """End-to-end coarse + generative-densification model."""

    cfg: NetworkConfig

    def setup(self):
        cfg = self.cfg
        self.img_encoder = DinoEncoder(cfg.encoder_backbone, dtype=cfg.dtype)
        self.dir_norm = ModLN(self.img_encoder.num_features, dtype=cfg.dtype)
        if cfg.view_embed_dim > 0:
            self.view_embed = self.param(
                "view_embed",
                nn.initializers.normal(cfg.view_embed_dim**-0.5),
                (1, 4, 1, cfg.view_embed_dim),
            )
        self.vol_decoder = VolTransformer(
            embed_dim=cfg.embedding_dim,
            image_feat_dim=self.img_encoder.num_features + cfg.view_embed_dim,
            n_groups=cfg.n_groups,
            vol_low_res=cfg.vol_embedding_reso,
            out_dim=cfg.vol_embedding_out_dim,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            dtype=cfg.dtype,
        )
        self.decoder = GaussianDecoder(
            in_dim=cfg.vol_embedding_out_dim,
            sh_dim=cfg.sh_dim,
            K=cfg.K,
        )
        self.stages = [
            DensifierStage(cfg, s, name=f"dec{s}")
            for s in range(len(cfg.dec_channels))
        ]

        self.volume_grid = build_dense_grid(cfg.vol_feat_reso, cfg.scene_size)
        self.group_centers = build_dense_grid(
            cfg.vol_embedding_reso * 2, cfg.scene_size
        )

    # ---------------------------------------------------------------- utils

    def _cameras_all(self, batch):
        """(B, V_total)-batched Camera pytree."""
        H, W = batch["tar_rgb"].shape[2:4]

        def one(c2w, fovx, fovy, near_far):
            return Camera.from_c2w(
                c2w, fovx, fovy, width=W, height=H,
                znear=near_far[0], zfar=near_far[1],
            )

        return jax.vmap(one)(
            batch["tar_c2w"], batch["fovx"], batch["fovy"], batch["near_far"]
        )

    def _over_batch(self, fn, *args):
        """Apply a per-sample fn over the leading batch dim: vmap when
        cfg.vmap_renders (one traced instance), else Python unroll + stack
        (B instances, but TPU-preferred layouts — see vmap_renders doc)."""
        if self.cfg.vmap_renders:
            return jax.vmap(fn)(*args)
        B = jax.tree_util.tree_leaves(args[0])[0].shape[0]
        outs = [fn(*jax.tree.map(lambda x: x[b], args)) for b in range(B)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def _render_views(self, cams, bgs, centers, shs, opacity_raw, scaling_raw,
                      rotation_raw, valid, screen_offset=None, screen_abs=None,
                      sel_gt=None):
        """Render one sample's V views (unrolled or under vmap-over-B).

        ``sel_gt`` (V, H, W, 3): fused AbsGS selection — each view's output
        carries ``sel_abs`` computed against its ground truth from the
        shared forward (no second rasterization).
        """
        cfg = self.cfg
        opacity = jax.nn.sigmoid(opacity_raw.reshape(-1))
        opacity = jnp.where(valid, opacity, 0.0)
        scales = jnp.exp(scaling_raw)

        # 2DGS surfel path (tpu.renderer=2dgs; reference swaps the renderer
        # import, lightning/network.py:9-10).  Fused selection (sel_gt)
        # rides the surfel rasterizer's own AbsGS screen-translation
        # backward (the reference closure consumes the active renderer's
        # means2D.grad[:, 2:4]); only the isolated-closure pass (explicit
        # screen args) falls through to the 3DGS rasterizer.
        if (cfg.renderer == "2dgs" and screen_offset is None
                and screen_abs is None):
            return self._render_views_2dgs(
                cams, bgs, centers, shs, opacity, scales, rotation_raw,
                sel_gt=sel_gt,
            )

        N_g = centers.shape[0]
        max_pairs = (
            int(N_g * cfg.pair_budget) if cfg.pair_budget > 0 else None
        )

        def one(cam, bg, gt):
            return rasterize(
                centers,
                shs,
                opacity,
                scales,
                rotation_raw,
                cam,
                bg,
                cfg.sh_degree,
                tile_size=cfg.tile_size,
                max_tiles=cfg.max_tiles,
                max_per_tile=cfg.max_per_tile,
                chunk=cfg.raster_chunk,
                screen_offset=screen_offset,
                screen_abs=screen_abs,
                backend=cfg.backend,
                sel_gt=gt,
                max_pairs=max_pairs,
                enum_tiles=cfg.enum_tiles or None,
            )

        # UNROLLED over views, not vmapped: vmap batches the rasterizer's
        # backward data plane into giant (V·N·D, 16) gathers whose layout
        # pinning is lost (profiled 1.45s/step of {0,1} strided gathers at
        # the flagship config; unrolled views compile like the fast
        # single-view path).  remat_renders additionally rematerializes
        # each view so only one view's binning/slab residuals are live.
        if cfg.remat_renders:
            one = jax.checkpoint(
                one,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "sel_abs"
                ),
            )
        outs = [
            one(jax.tree.map(lambda x: x[j], cams), bgs[j],
                None if sel_gt is None else sel_gt[j])
            for j in range(bgs.shape[0])
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def _render_views_2dgs(self, cams, bgs, centers, shs, opacity, scales,
                           rotation_raw, sel_gt=None):
        """Surfel rasterization of one sample's views + the 2DGS auxiliary
        maps (``renderer_2dgs.py:224-269``): surf_depth blend, world-space
        rendered normal, depth->normal lift, distortion."""
        cfg = self.cfg

        def one(cam, bg, gt):
            out = rasterize_surfels(
                centers,
                shs,
                opacity,
                scales[..., :2],
                rotation_raw,
                cam,
                bg,
                cfg.sh_degree,
                tile_size=cfg.tile_size,
                max_tiles=cfg.max_tiles,
                max_per_tile=cfg.max_per_tile,
                chunk=cfg.raster_chunk,
                backend=cfg.backend,
                enum_tiles=cfg.enum_tiles or None,
                sel_gt=gt,
            )
            alpha = out.alpha
            exp_norm = out.depth_expected / jnp.maximum(alpha, 1e-6)
            surf_depth = (
                (1.0 - cfg.depth_ratio) * exp_norm
                + cfg.depth_ratio * out.depth_median
            )
            wvt = cam.world_view_transform
            rend_normal = out.normal @ wvt[:3, :3].T
            rays = camera_rays(cam)
            d_normal = depth_to_normal(surf_depth, rays, alpha)
            return SurfelViewRenders(
                image=out.image,
                alpha=alpha,
                depth=surf_depth,
                radii=out.radii,
                overflow=out.overflow,
                dist=out.dist,
                rend_normal=rend_normal,
                depth_normal=d_normal,
                sel_abs=out.sel_abs,
            )

        if cfg.remat_renders:
            one = jax.checkpoint(
                one,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "sel_abs"
                ),
            )
        outs = [
            one(jax.tree.map(lambda x: x[j], cams), bgs[j],
                None if sel_gt is None else sel_gt[j])
            for j in range(bgs.shape[0])
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    # -------------------------------------------------------------- forward

    def __call__(self, batch, with_fine: bool = True, deterministic: bool = True):
        cfg = self.cfg
        B, V_total, H, W, _ = batch["tar_rgb"].shape
        V = cfg.n_views  # source views

        src = batch["tar_rgb"][:, :V].reshape(B * V, H, W, 3)

        # -- image encoder -> (B*V, h, w, C) token grid
        tokens = self.img_encoder(src, deterministic)
        L = tokens.shape[1]
        token_hw = int(math.isqrt(L))
        feat_hw = tokens.reshape(B * V, token_hw, token_hw, -1)

        # -- Plücker ray modulation (network.py:708-715)
        rays_down = batch["tar_rays_down"][:, :V].reshape(
            B * V, *batch["tar_rays_down"].shape[2:]
        )
        plucker = rays_to_plucker(rays_down)
        cond = jnp.concatenate(
            [rsh_cart(plucker[..., :3], 3), rsh_cart(plucker[..., 3:6], 3)],
            axis=-1,
        )
        feat_hw = self.dir_norm(feat_hw, cond)

        # -- lift to a 16³ feature volume (network.py:696-723)
        R = cfg.vol_feat_reso
        w2cs = batch["tar_w2c"][:, :V].reshape(B * V, 4, 4)
        ixts = batch["tar_ixt"][:, :V].reshape(B * V, 3, 3)
        xy, _ = project_points(self.volume_grid, w2cs, ixts)  # (B*V, R³, 2)
        img_wh = jnp.asarray([W, H], jnp.float32)
        xy_norm = (xy + 0.5) / img_wh * 2.0 - 1.0
        # sample the *token* grid: normalized coords index the token map
        feat_vol = jax.vmap(bilinear_sample)(feat_hw, xy_norm)  # (B*V, R³, C)
        feat_vol = feat_vol.reshape(B, V, R, R, R, -1)

        if cfg.view_embed_dim > 0:
            ve = jnp.broadcast_to(
                self.view_embed[:, :V, None, None, :, :].reshape(
                    1, V, 1, 1, 1, cfg.view_embed_dim
                ),
                (B, V, R, R, R, cfg.view_embed_dim),
            )
            feat_vol = jnp.concatenate([feat_vol, ve], axis=-1)

        # -- volume transformer -> (B, 64³, 80)
        volume_feat = self.vol_decoder(feat_vol)

        # -- coarse Gaussians (network.py:798-811)
        offset, shs_c, scaling_c, rotation_c, opacity_c = self.decoder.coarse(
            volume_feat, cfg.opacity_shift, cfg.scaling_shift
        )
        half_cell = 0.5 * cfg.scene_size / cfg.n_offset_groups
        base_centers = jnp.repeat(
            self.group_centers[:, None, :], cfg.K, axis=1
        ).reshape(1, -1, 3)
        centers = base_centers + offset * half_cell  # (B, 64³·K, 3)

        N = centers.shape[1]
        all_valid = jnp.ones((B, N), bool)

        # -- coarse renders, all V_total views
        cams_all = self._cameras_all(batch)      # (B, V_total) Camera pytree
        bgs_all = batch["bg_color"]

        def render_one(cams, bgs, gs, screen=None, sabs=None):
            c, s_, o, sc, r, v = gs
            return self._render_views(cams, bgs, c, s_, o, sc, r, v, screen, sabs)

        gs_all = (centers, shs_c, opacity_c, scaling_c, rotation_c, all_valid)

        share_sel = with_fine and cfg.share_selection
        if share_sel:
            # Fused coarse render + gradient-guided selection (reference
            # network.py:842-896 runs a SECOND full render of the source
            # views inside an isolated vjp closure; SURVEY §7.3.4): render
            # the source views once under jax.vjp over the zero screen
            # inputs — the primal doubles as the supervision render (still
            # differentiable w.r.t. the attributes by the outer AD), and
            # one backward application with the explicit MSE image
            # cotangent yields the AbsGS selection scores.  Deletes V full
            # forward rasterizations (+ their binning data planes) per
            # sample per step.
            gt_all = batch["tar_rgb"][:, :V]

            def sel_render_one(cams, bgs, gt, gs):
                c, s_, o, sc, r, valid = gs
                cams_v = jax.tree.map(lambda x: x[:V], cams)
                cams_rest = jax.tree.map(lambda x: x[V:], cams)
                out_v = self._render_views(
                    cams_v, bgs[:V], c, s_, o, sc, r, valid, sel_gt=gt
                )
                # per-view abs grads sum across views; each view's
                # cotangent is the per-view MSE's (2/(H*W*3)), while the
                # reference differentiates ONE mean over the V-view concat
                # (network.py:865-872) — divide by V so the scores match
                # the isolated-closure path bit-for-scale
                score = (
                    jnp.linalg.norm(jnp.sum(out_v.sel_abs, axis=0), axis=-1)
                    / V
                )
                out_v = out_v.replace(sel_abs=None)

                if bgs.shape[0] > V:
                    out_rest = self._render_views(
                        cams_rest, bgs[V:], c, s_, o, sc, r, valid
                    )
                    out_full = jax.tree.map(
                        lambda a, b: jnp.concatenate([a, b], axis=0),
                        out_v, out_rest,
                    )
                else:
                    # batch supplies exactly n_views views: nothing to
                    # render beyond the source views
                    out_full = out_v
                return out_full, score

            coarse, sel_score_shared = self._over_batch(
                sel_render_one, cams_all, bgs_all, gt_all, gs_all
            )
        else:
            coarse = self._over_batch(render_one, cams_all, bgs_all, gs_all)

        outputs = {
            "image": _cat_views(coarse.image),
            "depth": _cat_views(coarse.depth)[..., None],
            "acc_map": _cat_views(coarse.alpha),
            "overflow": coarse.overflow,
        }
        if cfg.renderer == "2dgs":
            # extra 2DGS maps activate the distortion/normal regularizers
            # (loss.py:142-152 <- reference lightning/loss.py:50-61)
            outputs["rend_dist"] = _cat_views(coarse.dist)
            outputs["rend_normal"] = _cat_views(coarse.rend_normal)
            outputs["depth_normal"] = _cat_views(coarse.depth_normal)
        render_pkg = [
            (centers, shs_c, opacity_c, scaling_c, rotation_c)
        ]

        if not with_fine:
            outputs["render_pkg"] = render_pkg
            return outputs

        # ================= fine stage =================
        opacity_act = jax.nn.sigmoid(opacity_c[..., 0])
        opacity_ok = opacity_act > 0.005                          # (B, N)

        # -- gradient-guided selection (network.py:842-896)
        if share_sel:
            sel_score = sel_score_shared                        # (B, N)
        else:
            # Isolated re-render closure (reference semantics; also the
            # 2DGS path, where the supervision render is the surfel
            # rasterizer while the selection closure re-renders through
            # the 3DGS rasterizer whose backward provides AbsGS channels)
            cams_v = jax.tree.map(lambda x: x[:, :V], cams_all)
            bgs_v = bgs_all[:, :V]
            gt_all = batch["tar_rgb"][:, :V]

            def sel_one(cams, bgs, gt, gs):
                gs_sg = tuple(jax.lax.stop_gradient(g) for g in gs[:5]) + (gs[5],)

                def sel_loss(screen, sabs):
                    out = render_one(cams, bgs, gs_sg, screen, sabs)
                    return jnp.mean((out.image - gt) ** 2)

                zeros = jnp.zeros((N, 2), jnp.float32)
                _, g_abs = jax.grad(sel_loss, argnums=(0, 1))(zeros, zeros)
                return jnp.linalg.norm(g_abs, axis=-1)

            sel_score = jax.lax.stop_gradient(
                self._over_batch(sel_one, cams_v, bgs_v, gt_all, gs_all)
            )  # (B, N)

        pool_idx = static_opacity_pool(opacity_act, cfg.mask_pool)
        M = pool_idx.shape[1]
        take2 = lambda a: jnp.take_along_axis(a, pool_idx[..., None], axis=1)
        take1 = lambda a: jnp.take_along_axis(a, pool_idx, axis=1)
        pool_valid = take1(opacity_ok)
        pool_centers = take2(centers)
        pool_score = jnp.where(pool_valid, take1(sel_score), -1.0)

        # -- per-view point features + fine head (network.py:734-754, 898-906)
        point_feats = self._over_batch(
            self._point_feats,
            batch["tar_w2c"][:, :V], batch["tar_ixt"][:, :V],
            batch["tar_rgb"][:, :V], pool_centers,
            coarse.image[:, :V], coarse.alpha[:, :V], coarse.depth[:, :V],
        )                                             # (B, M, V, 8)

        pool_vol_feat = take2(volume_feat)            # (B, M, 80)
        fine_feat, sh_res = self.decoder.fine(pool_vol_feat, point_feats)
        pool_shs = take2(shs_c.reshape(B, N, -1)).reshape(B, M, -1, 3)
        fine_shs = sh_res.reshape(B, M, -1, 3) + pool_shs
        features160 = jnp.concatenate([fine_feat, pool_vol_feat], axis=-1)

        # -- split pool into selected (to densifier) and remainder
        k = cfg.k_num
        sel_idx, rest_idx, sel_ok, rest_ok = topk_split(pool_score, pool_valid, k)
        tsel2 = lambda a: jnp.take_along_axis(a, sel_idx[..., None], axis=1)
        trest2 = lambda a: jnp.take_along_axis(a, rest_idx[..., None], axis=1)

        sel_centers = tsel2(pool_centers)
        sel_feats = tsel2(features160)
        if cfg.enable_residual_attribute:
            ps = PointSet(
                coord=sel_centers * 2.0,
                feat=sel_feats,
                mask=sel_ok,
                grid_size=cfg.voxel_size,
            )
        else:
            ps = PointSet(
                coord=sel_centers,
                feat=sel_feats,
                mask=sel_ok,
                grid_size=0.5 * cfg.voxel_size,
            )

        # -- densification decoder levels
        leaves = []
        for stage in self.stages:
            ps, leaf = stage(ps, deterministic=deterministic)
            leaves.append(leaf)

        # -- union decoder leaves (network.py:947-959, :601-624)
        xyz_u, sh_u, op_u, sc_u, rot_u, ok_u = [], [], [], [], [], []
        for leaf in leaves:
            sh, op, sc, rot = split_attributes(leaf.attribute, cfg.sh_degree)
            coords = leaf.coord / 2.0 if cfg.enable_residual_attribute else leaf.coord
            xyz_u.append(coords)
            sh_u.append(sh)
            op_u.append(op + cfg.opacity_shift)
            sc_u.append(sc + cfg.fine_scaling_shift)
            rot_u.append(rot)
            ok_u.append(leaf.mask)

        # -- non-selected pool remainder keeps coarse attrs + fine SH
        xyz_u.append(trest2(pool_centers))
        sh_u.append(trest2(fine_shs.reshape(B, M, -1)))
        op_u.append(trest2(take2(opacity_c)))
        sc_u.append(trest2(take2(scaling_c)))
        rot_u.append(trest2(take2(rotation_c)))
        ok_u.append(rest_ok)

        fine_centers = jnp.concatenate(xyz_u, axis=1)
        fine_sh = jnp.concatenate(
            [s.reshape(B, s.shape[1], -1) for s in sh_u], axis=1
        )
        fine_op = jnp.concatenate(op_u, axis=1)
        fine_sc = jnp.concatenate(sc_u, axis=1)
        fine_rot = jnp.concatenate(rot_u, axis=1)
        fine_ok = jnp.concatenate(ok_u, axis=1)

        gs_fine = (
            fine_centers,
            fine_sh.reshape(B, fine_sh.shape[1], -1, 3),
            fine_op,
            fine_sc,
            fine_rot,
            fine_ok,
        )
        fine = self._over_batch(render_one, cams_all, bgs_all, gs_fine)

        outputs.update(
            {
                "image_fine": _cat_views(fine.image),
                "depth_fine": _cat_views(fine.depth)[..., None],
                "acc_map_fine": _cat_views(fine.alpha),
            }
        )
        # the fine renders (the largest point set, hence the most likely
        # to hit a static budget) must feed the overflow diagnostic too —
        # a drop there silently zeroes that pair's gradients
        outputs["overflow"] = outputs["overflow"] + fine.overflow
        render_pkg.append(
            (fine_centers, fine_sh, fine_op, fine_sc, fine_rot, fine_ok)
        )
        outputs["render_pkg"] = render_pkg
        return outputs

    def _point_feats(self, w2cs, ixts, src, points, imgs, accs, depths):
        """8-channel per-view point features (network.py:734-754):
        [src RGB(3), render RGB(3), acc(1), |render_depth - point_z|(1)].
        Per-sample: w2cs/ixts/src over this sample's V source views."""
        H, W = imgs.shape[1:3]
        xy, z = project_points(points, w2cs, ixts)     # (V, M, 2), (V, M, 1)
        img_wh = jnp.asarray([W, H], jnp.float32)
        xy_norm = (xy + 0.5) / img_wh * 2.0 - 1.0

        stacked = jnp.concatenate(
            [src, imgs, accs[..., None], depths[..., None]], axis=-1
        )                                              # (V, H, W, 8)
        sampled = jax.vmap(bilinear_sample)(stacked, xy_norm)  # (V, M, 8)
        z_diff = jnp.abs(sampled[..., 7:8] - z)
        feats = jnp.concatenate([sampled[..., :7], z_diff], axis=-1)
        return feats.transpose(1, 0, 2)                # (M, V, 8)


def static_opacity_pool(opacity_act: jnp.ndarray, mask_pool: int) -> jnp.ndarray:
    """Static stand-in for the reference's dynamic opacity mask: (B, M)
    indices of the top ``min(mask_pool, N)`` points by activated opacity.

    The reference keeps every coarse Gaussian with ``sigmoid(op) > 0.005``
    in the fine union (network.py:804-805 at eval; training thins >50%
    masks randomly, :725-732).  A dynamic boolean mask is shape-unstable
    under jit, so the pool fixes the budget; whenever the pool covers the
    true mask count the downstream union (which re-applies the 0.005
    validity per pooled point) is EXACTLY the dynamic-mask set.
    ``mask_pool >= N`` short-circuits to the identity — the eval config
    (defaults.py INFER) sets pool = n_voxels for provably exact inference.
    """
    B, N = opacity_act.shape
    M = min(mask_pool, N)
    if M == N:
        return jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    return topk_split(
        jax.lax.stop_gradient(opacity_act),
        jnp.ones(opacity_act.shape, bool),
        M,
    )[0]


def _cat_views(x: jnp.ndarray) -> jnp.ndarray:
    """(B, V, H, W[, C]) -> (B, H, V*W[, C]) — the reference's width-concat
    output layout (network.py:974-978)."""
    if x.ndim == 5:
        B, V, H, W, C = x.shape
        return x.transpose(0, 2, 1, 3, 4).reshape(B, H, V * W, C)
    B, V, H, W = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, H, V * W)
