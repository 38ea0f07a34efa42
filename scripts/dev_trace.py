import sys; sys.path.insert(0, "/root/repo")
import glob, gzip, json, os
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat import rasterize

rng = np.random.default_rng(0)
n = 131072; H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32))
scales = jnp.exp(jnp.asarray(rng.uniform(np.log(0.002), np.log(0.01), size=(n, 3)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)
kw = dict(tile_size=32, max_tiles=8, max_per_tile=4096, chunk=32)
fp = jax.jit(lambda m: rasterize(m, shs, opa, scales, quats, cam, jnp.ones(3), 1, backend="pallas", **kw).image)
r = fp(means); jax.block_until_ready(r)

jax.profiler.start_trace("/tmp/trace")
for _ in range(3):
    r = fp(means)
jax.block_until_ready(r)
jax.profiler.stop_trace()

# parse trace events
files = glob.glob("/tmp/trace/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
ev = []
for f in files:
    with gzip.open(f) as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 500:
            ev.append((e["dur"], e.get("name", "?")[:90]))
ev.sort(reverse=True)
seen = {}
for d, name in ev:
    seen.setdefault(name, 0)
    seen[name] += d
for name, tot in sorted(seen.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{tot/1e3/3:9.2f} ms  {name}")
