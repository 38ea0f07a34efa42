"""Dump the optimized HLO of the flagship train step to find hot fusions."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    raster_chunk=32, compute_dtype="float32", renderer="3dgs",
    share_selection=True, remat_renders=False, pair_budget=2.0,
)
net = Network(cfg)
batch = _make_batch(B=1, V_total=8, H=512, W=512, n_views=cfg.n_views)
params = jit_init(net, batch, with_fine=True)
tx, _ = make_optimizer(params, accumulate=1)
state = create_train_state(params, tx)
step = make_train_step(net, tx, with_fine=True, donate=False)
t0 = time.time()
compiled = step.lower(state, batch).compile()
print(f"lower+compile: {time.time()-t0:.1f}s", flush=True)
txt = compiled.as_text()
out = os.environ.get("OUT", "/tmp/r5_step_hlo.txt")
with open(out, "w") as f:
    f.write(txt)
print(f"wrote {len(txt)/1e6:.1f} MB to {out}")
