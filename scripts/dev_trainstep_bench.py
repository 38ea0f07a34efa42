"""Time one full flagship train step (fwd+bwd+adamw) on the TPU chip."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from generativedensification_tpu.models.network import Network, NetworkConfig
from generativedensification_tpu.train.optim import make_optimizer
from generativedensification_tpu.train.state import create_train_state
from generativedensification_tpu.train.step import make_train_step
from __graft_entry__ import _make_batch

B = int(os.environ.get("B", 1))
H = W = int(os.environ.get("RES", 512))
cfg = NetworkConfig(
    n_views=4,
    encoder_backbone="vit_base_patch16_224.dino",
    n_groups=(16,),
    num_layers=12,
    num_heads=16,
    embedding_dim=256,
    vol_feat_reso=16,
    vol_embedding_reso=int(os.environ.get("VRESO", 32)),  # 64³ coarse grid
    vol_embedding_out_dim=80,
    k_num=int(os.environ.get("KNUM", 12000)),
    dec_depths=(2, 2),
    dec_channels=(160, 256),
    dec_num_head=(20, 32),
    dec_patch_size=(48, 48),
    non_leaf_ratio=(0.8,),
    upscale_factor=(2, 4),
    mask_pool=int(os.environ.get("MASKPOOL", 49152)),
    tile_size=int(os.environ.get("TS", 32)),
    max_tiles=int(os.environ.get("MT", 4)),
    enum_tiles=int(os.environ.get("ET", 0)),
    max_per_tile=int(os.environ.get("MPT", 4096)),
    raster_chunk=32,
    compute_dtype=os.environ.get("DTYPE", "float32"),
    renderer=os.environ.get("RENDERER", "3dgs"),
    share_selection=os.environ.get("SHARESEL", "1") == "1",
    remat_renders=os.environ.get("REMAT", "1") == "1",
    pair_budget=float(os.environ.get("PAIRS", "0")),
)
net = Network(cfg)
batch = _make_batch(B=B, V_total=8, H=H, W=W, n_views=cfg.n_views)
t0 = time.time()
from generativedensification_tpu.utils.platform import jit_init
params = jit_init(net, batch, with_fine=True)
print(f"init: {time.time()-t0:.1f}s; params:",
      sum(x.size for x in jax.tree.leaves(params)) / 1e6, "M")
tx, _ = make_optimizer(params, accumulate=int(os.environ.get("ACCUM", 1)))
state = create_train_state(params, tx)
# donate like the real training loop: the state is threaded through the
# python loop and never reused, and donation reclaims ~1.6GB of param +
# optimizer buffers at runtime (B=3 OOM'd without it, r4)
step = make_train_step(net, tx, with_fine=True,
                       donate=os.environ.get("DONATE", "1") == "1")
t0 = time.time()
state, stats = step(state, batch)
jax.block_until_ready(state.params)
print(f"compile+first step: {time.time()-t0:.1f}s, loss={float(stats['loss']):.4f}")
iters = 5
t0 = time.time()
for _ in range(iters):
    state, stats = step(state, batch)
jax.block_until_ready(state.params)
dt = (time.time() - t0) / iters
print(f"train step: {dt*1e3:.1f} ms  ({B} samples, {H}x{W}, steps/s {1/dt:.2f})")
# the reference-scale contract row (VERDICT r4 ask #2): renders/s/chip
# (coarse + fine both rasterize ALL V_total supervision views per sample
# per step, like the reference's renderer calls), samples/s, overflow,
# peak HBM
V_TOTAL = 8  # _make_batch(V_total=8)
renders = B * V_TOTAL * 2
mem = jax.devices()[0].memory_stats() or {}
print(
    f"samples/s/chip: {B/dt:.3f}  renders/s/chip: {renders/dt:.2f}  "
    f"overflow: {float(stats.get('overflow', float('nan')))}  "
    f"peak_hbm_gb: {mem.get('peak_bytes_in_use', 0)/2**30:.2f}"
)
