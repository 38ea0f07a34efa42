"""Profile the rasterizer stages on the TPU chip."""
import sys; sys.path.insert(0, "/root/repo")
import time, json
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians
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
bg = jnp.ones(3)

def timeit(f, *a, iters=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters

proj_f = jax.jit(lambda: project_gaussians(means, None, shs, opa, cam, 1, scales=scales, rotations=quats))
print("project:", timeit(proj_f)*1e3, "ms")
proj = proj_f()
bins_f = jax.jit(lambda: bin_gaussians(proj, H, W, 32, 8))
print("binning(sort):", timeit(bins_f)*1e3, "ms")
bins = bins_f()
print("max tile count:", int(bins.tile_counts.max()), "total pairs:", int(bins.tile_counts.sum()), "overflow:", int(bins.overflow))

fwd = jax.jit(lambda: rasterize(means, shs, opa, scales, quats, cam, bg, 1, tile_size=32, max_tiles=8, max_per_tile=4096, chunk=32).image)
print("full fwd:", timeit(fwd)*1e3, "ms")

def loss(m):
    return jnp.mean(rasterize(m, shs, opa, scales, quats, cam, bg, 1, tile_size=32, max_tiles=8, max_per_tile=4096, chunk=32).image)
g = jax.jit(jax.grad(loss))
print("fwd+bwd:", timeit(g, means)*1e3, "ms")

# smaller max_per_tile
fwd2 = jax.jit(lambda: rasterize(means, shs, opa, scales, quats, cam, bg, 1, tile_size=32, max_tiles=8, max_per_tile=1024, chunk=32).image)
print("full fwd mpt=1024:", timeit(fwd2)*1e3, "ms")
fwd3 = jax.jit(lambda: rasterize(means, shs, opa, scales, quats, cam, bg, 1, tile_size=16, max_tiles=8, max_per_tile=1024, chunk=32).image)
print("full fwd ts=16 mpt=1024:", timeit(fwd3)*1e3, "ms")

# pallas backend timings
fwd_p = jax.jit(lambda: rasterize(means, shs, opa, scales, quats, cam, bg, 1, tile_size=32, max_tiles=8, max_per_tile=4096, chunk=32, backend="pallas").image)
print("pallas fwd:", timeit(fwd_p)*1e3, "ms")
def loss_p(m):
    return jnp.mean(rasterize(m, shs, opa, scales, quats, cam, bg, 1, tile_size=32, max_tiles=8, max_per_tile=4096, chunk=32, backend="pallas").image)
g_p = jax.jit(jax.grad(loss_p))
print("pallas fwd+bwd:", timeit(g_p, means)*1e3, "ms")
