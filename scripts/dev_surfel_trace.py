"""Trace the surfel (2DGS) fwd+bwd step and print top device ops.

Same protocol as dev_trace_names.py but driving rasterize_surfels with
the dev_surfel_bench scene (131k, 512², ts=32/mt=4).
env: TS/MT/ET like dev_trace_names; GRAD=0 traces forward only.
"""
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
from generativedensification_tpu.splat.surfel import rasterize_surfels

rng = np.random.default_rng(0)
n = int(os.environ.get("N", 131072))
H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32))
scales = jnp.exp(jnp.asarray(
    rng.uniform(np.log(0.004), np.log(0.02), size=(n, 2)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)
bg = jnp.ones(3)

KW = dict(sh_degree=1, tile_size=int(os.environ.get("TS", "32")),
          max_tiles=int(os.environ.get("MT", "4")),
          max_per_tile=4096, chunk=32, backend="pallas")
et = int(os.environ.get("ET", "0"))
if et:
    KW["enum_tiles"] = et


def loss(m):
    o = rasterize_surfels(m, shs, opa, scales, quats, cam, bg, **KW)
    return (jnp.mean(o.image) + 0.01 * jnp.sum(o.dist) / (H * W)
            + 0.01 * jnp.mean(o.normal))


if os.environ.get("GRAD", "1") == "1":
    step = jax.jit(jax.grad(loss))
else:
    step = jax.jit(loss)

g = step(means); jax.block_until_ready(g)
t0 = time.perf_counter()
for _ in range(20):
    g = step(means)
jax.block_until_ready(g)
dt = (time.perf_counter() - t0) / 20
print(f"step: {dt*1e3:.2f} ms", flush=True)

tdir = "/tmp/surfel_trace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for _ in range(3):
        g = step(means)
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
for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
    ln = long_names.get(name, "")[:160]
    print(f"{us/3:9.1f} us  {name[:40]:40s} {ln}")
