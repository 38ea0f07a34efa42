"""Isolate the optimizer update cost on the flagship parameter tree.

Backs the PERF.md round-5 "tail decomposed" table: the full
clip-by-global-norm + AdamW + apply_updates chain over the 133.3M-param /
484-leaf flagship tree measures ~4.8 ms/step on a v5e chip (donated) —
XLA fuses the per-leaf elementwise chains, so a raveled "fused optimizer"
rework has nothing to win.  Reference optimizer config:
``lightning/system.py:87-127``.
"""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from generativedensification_tpu.models.network import Network, NetworkConfig
from generativedensification_tpu.train.optim import make_optimizer
from generativedensification_tpu.utils.platform import jit_init
from __graft_entry__ import _make_batch
import optax

cfg = NetworkConfig(
    n_views=4, encoder_backbone="vit_base_patch16_224.dino", n_groups=(16,),
    num_layers=12, num_heads=16, embedding_dim=256, vol_feat_reso=16,
    vol_embedding_reso=32, vol_embedding_out_dim=80, k_num=12000,
    dec_depths=(2, 2), dec_channels=(160, 256), dec_num_head=(20, 32),
    dec_patch_size=(48, 48), non_leaf_ratio=(0.8,), upscale_factor=(2, 4),
    mask_pool=49152, tile_size=32, max_tiles=4, max_per_tile=4096,
    raster_chunk=32, compute_dtype="bfloat16",
)
net = Network(cfg)
batch = _make_batch(B=1, V_total=8, H=512, W=512, n_views=cfg.n_views)
params = jit_init(net, batch, with_fine=True)
n = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n/1e6:.1f}M over {len(jax.tree.leaves(params))} leaves")
tx, _ = make_optimizer(params, accumulate=1)
opt_state = tx.init(params)
grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, params)

def upd(grads, opt_state, params):
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state

for donate, label in (((), "no donation"), ((1, 2), "donated")):
    f = jax.jit(upd, donate_argnums=donate)
    p2, o2 = f(grads, opt_state, params)
    jax.block_until_ready(p2)
    t0 = time.time()
    for _ in range(10):
        p2, o2 = f(grads, o2, p2)
    jax.block_until_ready(p2)
    print(f"optimizer update: {(time.time()-t0)/10*1e3:.1f} ms ({label})")
