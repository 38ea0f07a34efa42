"""Trace the bench step and print top device ops WITH long hlo names."""
import sys, os, glob, gzip, json, time, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat import rasterize

rng = np.random.default_rng(0)
n = int(os.environ.get("N", 131072))
H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa_raw = jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32)
scale_raw = jnp.asarray(rng.uniform(np.log(0.002), np.log(0.01), size=(n, 3)), jnp.float32)
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)
bg = jnp.ones(3)
gt = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)

KW = dict(sh_degree=1, tile_size=int(os.environ.get("TS", "32")),
          max_tiles=int(os.environ.get("MT", "4")),
          max_per_tile=4096, chunk=32)
et = int(os.environ.get("ET", "0"))
if et:
    KW["enum_tiles"] = et
if os.environ.get("PAIRS"):
    KW["max_pairs"] = int(os.environ["PAIRS"])

def loss_fn(means, shs, opa_raw, scale_raw, quats):
    out = rasterize(means, shs, jax.nn.sigmoid(opa_raw), jnp.exp(scale_raw),
                    quats, cam, bg, **KW)
    return jnp.mean((out.image - gt) ** 2)

step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
g = step(means, shs, opa_raw, scale_raw, quats); jax.block_until_ready(g)
t0 = time.perf_counter()
for _ in range(20):
    g = step(means, shs, opa_raw, scale_raw, quats)
jax.block_until_ready(g)
dt = (time.perf_counter() - t0) / 20
print(f"fwd+bwd: {dt*1e3:.2f} ms  ({1/dt:.1f} renders/s)", flush=True)

tdir = "/tmp/bench_trace3"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for _ in range(3):
        g = step(means, shs, opa_raw, scale_raw, quats)
    jax.block_until_ready(g)

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
print(f"total traced device us/iter: {total/3:.0f}")
for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:50]:
    ln = long_names.get(name, "")[:180]
    print(f"{us/3:9.1f} us  {name[:40]:40s} {ln}")
