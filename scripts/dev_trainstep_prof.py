"""Profile one flagship train step on TPU."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from generativedensification_tpu.models.network import Network, NetworkConfig
from generativedensification_tpu.train.optim import make_optimizer
from generativedensification_tpu.train.state import create_train_state
from generativedensification_tpu.train.step import make_train_step
from generativedensification_tpu.utils.platform import jit_init
from __graft_entry__ import _make_batch

cfg = NetworkConfig(
    n_views=4, encoder_backbone="vit_base_patch16_224.dino", n_groups=(16,),
    num_layers=12, num_heads=16, embedding_dim=256, vol_feat_reso=16,
    vol_embedding_reso=32, vol_embedding_out_dim=80, k_num=12000,
    dec_depths=(2, 2), dec_channels=(160, 256), dec_num_head=(20, 32),
    dec_patch_size=(48, 48), non_leaf_ratio=(0.8,), upscale_factor=(2, 4),
    mask_pool=49152, tile_size=32, max_tiles=4, max_per_tile=4096,
    raster_chunk=32,
)
net = Network(cfg)
batch = _make_batch(B=1, V_total=8, H=512, W=512, n_views=cfg.n_views)
params = jit_init(net, batch, with_fine=True)
tx, _ = make_optimizer(params, accumulate=1)
state = create_train_state(params, tx)
step = make_train_step(net, tx, with_fine=True, donate=False)
t0 = time.time()
state, stats = step(state, batch)
jax.block_until_ready(state.params)
print(f"compile+first: {time.time()-t0:.1f}s loss={float(stats['loss']):.4f}")
import time as _t
_t0=_t.time()
for _ in range(3):
    state, stats = step(state, batch)
jax.block_until_ready(state.params)
print(f"step avg: {(_t.time()-_t0)/3*1e3:.0f} ms")
with jax.profiler.trace("/tmp/train_trace"):
    state, stats = step(state, batch)
    jax.block_until_ready(state.params)
print("traced")
