"""Surfel (2DGS) rasterizer perf on TPU: pallas vs xla backends.

env: BACKENDS=pallas (skip the slow XLA-scan rows), PARITY=0 (skip the
full-res XLA parity grad — several minutes of extra compile),
TS/MT/ET (tile size / max_tiles / enum_tiles A/Bs)."""
import sys; sys.path.insert(0, "/root/repo")
import os
import time
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.surfel import rasterize_surfels

rng = np.random.default_rng(0)
n = 131072; H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32))
scales = jnp.exp(jnp.asarray(rng.uniform(np.log(0.004), np.log(0.02), size=(n, 2)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)
bg = jnp.ones(3)

def timeit(f, *a, iters=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3

KW = dict(tile_size=int(os.environ.get("TS", "32")),
          max_tiles=int(os.environ.get("MT", "4")),
          max_per_tile=4096, chunk=32)
if int(os.environ.get("ET", "0")):
    KW["enum_tiles"] = int(os.environ["ET"])

for be in os.environ.get("BACKENDS", "pallas,xla").split(","):
    fwd = jax.jit(lambda m, be=be: rasterize_surfels(
        m, shs, opa, scales, quats, cam, bg, 1, backend=be, **KW).image)
    print(f"{be} fwd:", timeit(fwd, means), "ms")
    ovf = jax.jit(lambda m, be=be: rasterize_surfels(
        m, shs, opa, scales, quats, cam, bg, 1, backend=be, **KW).overflow)
    print(f"{be} overflow:", int(ovf(means)))
    def loss(m, be=be):
        o = rasterize_surfels(m, shs, opa, scales, quats, cam, bg, 1,
                              backend=be, **KW)
        return jnp.mean(o.image) + 0.01*jnp.sum(o.dist)/ (H*W) + 0.01*jnp.mean(o.normal)
    g = jax.jit(jax.grad(loss))
    print(f"{be} fwd+bwd:", timeit(g, means), "ms")
    if be == "pallas" and os.environ.get("PARITY", "1") == "1":
        gx = jax.jit(jax.grad(lambda m: loss(m, "xla")))(means)
        gp = g(means)
        rel = float(jnp.abs(gx - gp).max() / (jnp.abs(gx).max() + 1e-12))
        print("pallas-vs-xla grad rel:", rel)
