"""Round-5: per-op device trace of the FLAGSHIP train step (VERDICT r4 ask #1).

Runs the B=1 (or B=$B) flagship step (ViT-B + 64^3 volume + 12k densifier +
AdamW, 512^2, 8 supervision views coarse+fine), then prints the top device
ops with long HLO names so the step budget can be bucketed into renders /
binning / model stack / selection / loss / optimizer in PERF.md.
"""
import sys, os, glob, gzip, json, time, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from generativedensification_tpu.models.network import Network, NetworkConfig
from generativedensification_tpu.train.optim import make_optimizer
from generativedensification_tpu.train.state import create_train_state
from generativedensification_tpu.train.step import make_train_step
from generativedensification_tpu.utils.platform import jit_init
from __graft_entry__ import _make_batch

B = int(os.environ.get("B", 1))
cfg = NetworkConfig(
    n_views=4, encoder_backbone="vit_base_patch16_224.dino", n_groups=(16,),
    num_layers=12, num_heads=16, embedding_dim=256, vol_feat_reso=16,
    vol_embedding_reso=32, vol_embedding_out_dim=80, k_num=12000,
    dec_depths=(2, 2), dec_channels=(160, 256), dec_num_head=(20, 32),
    dec_patch_size=(48, 48), non_leaf_ratio=(0.8,), upscale_factor=(2, 4),
    mask_pool=49152, tile_size=32, max_tiles=4, max_per_tile=4096,
    raster_chunk=32,
    compute_dtype=os.environ.get("DTYPE", "bfloat16"),
    renderer=os.environ.get("RENDERER", "3dgs"),
    share_selection=True,
    remat_renders=os.environ.get("REMAT", "0") == "1",
    pair_budget=float(os.environ.get("PAIRS", "2.0")),
)
net = Network(cfg)
batch = _make_batch(B=B, V_total=8, H=512, W=512, n_views=cfg.n_views)
t0 = time.time()
params = jit_init(net, batch, with_fine=True)
print(f"init: {time.time()-t0:.1f}s", flush=True)
tx, _ = make_optimizer(params, accumulate=1)
state = create_train_state(params, tx)
step = make_train_step(net, tx, with_fine=True, donate=False)
t0 = time.time()
state, stats = step(state, batch)
jax.block_until_ready(state.params)
print(f"compile+first: {time.time()-t0:.1f}s loss={float(stats['loss']):.4f} "
      f"overflow={float(stats.get('overflow', -1)):.0f}", flush=True)
t0 = time.time()
for _ in range(3):
    state, stats = step(state, batch)
jax.block_until_ready(state.params)
print(f"step avg: {(time.time()-t0)/3*1e3:.0f} ms", flush=True)

tdir = os.environ.get("TDIR", "/tmp/r5_step_trace")
os.system(f"rm -rf {tdir}")
NTRACE = 2
with jax.profiler.trace(tdir):
    for _ in range(NTRACE):
        state, stats = step(state, batch)
    jax.block_until_ready(state.params)
print("traced", flush=True)

f = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))[-1]
ev = json.loads(gzip.open(f).read())["traceEvents"]
by_name = collections.defaultdict(float)
long_names = {}
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        name = e.get("name", "")
        args = e.get("args") or {}
        if "run_id" in args or "long_name" in args:
            by_name[name] += e["dur"]
            ln = args.get("long_name", "")
            if ln and name not in long_names:
                long_names[name] = ln
total = sum(v for k, v in by_name.items() if not k.startswith("jit_"))
print(f"total traced device ms/iter: {total/NTRACE/1e3:.1f}")
for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:120]:
    ln = long_names.get(name, "")[:260]
    print(f"{us/NTRACE:9.1f} us  {name[:44]:44s} {ln}")
