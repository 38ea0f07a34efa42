"""Break down the pallas backward path stages on TPU."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians
from generativedensification_tpu.splat import composite as Cm
from generativedensification_tpu.splat.pallas_kernels import (
    CHUNK, SLAB_W, pallas_composite_bwd,
)

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

proj = jax.jit(lambda: project_gaussians(means, None, shs, opa, cam, 1, scales=scales, rotations=quats))()
bins = jax.jit(lambda: bin_gaussians(proj, H, W, 32, 8))()
ba = (bins.sorted_ids, bins.sorted_o, bins.sorted_valid, bins.sorted_rank, bins.depth_order, bins.tile_starts, bins.tile_counts)
tiles_x = tiles_y = 16; ts = 32; num_tiles = 256
xy, conic, color, opacity, depth = proj.xy, proj.conic, proj.color, jnp.where(proj.valid, proj.opacity, 0.), proj.depth

def timeit(f, *a, iters=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3

# forward to get residuals
fwd = jax.jit(lambda xy: Cm._fwd_impl(xy, jnp.zeros_like(xy), conic, color, opacity, depth, bg, ba, tiles_x, tiles_y, ts, 4096, 32, "pallas"))
out, res = fwd(xy)
C_fin, D_fin, T_fin, src, astarts, apos = res
cot = (jnp.ones_like(out[0]) / out[0].size, jnp.zeros_like(out[1]), jnp.zeros_like(out[2]))
saved = (xy, conic, color, opacity, depth, bg, ba, res)

f_bc = jax.jit(lambda: Cm._bwd_common(saved, cot, tiles_x, tiles_y, ts))
print("bwd_common:", timeit(f_bc), "ms")
gC, gA, gD, G, gTf, d_bg = f_bc()

f_slab = jax.jit(lambda: Cm._slab_from_src(xy, conic, color, opacity, depth, src))
print("slab rebuild:", timeit(f_slab), "ms")
slab_t = f_slab()

f_k = jax.jit(lambda: pallas_composite_bwd(slab_t, astarts, bins.tile_counts, gC, gA, gD, G, gTf, tiles_x, tiles_y, ts))
print("bwd kernel:", timeit(f_k), "ms")
grad_t = f_k()

f_sc = jax.jit(lambda g, ap: jnp.take(g[:, :16], ap, axis=0, mode="clip").reshape(n, -1, 16).sum(axis=1))
print("grad gather-reduce:", timeit(f_sc, grad_t, apos), "ms")

f_all = jax.jit(lambda: Cm._pallas_bwd(saved, cot, tiles_x, tiles_y, ts)[:6])
print("pallas_bwd total:", timeit(f_all), "ms")

# incremental prefixes of the fused graph
def pre_a():
    r = Cm._bwd_common(saved, cot, tiles_x, tiles_y, ts)
    return sum(x.sum() for x in r[:5])

def pre_b():
    gC, gA, gD, G, gTf, d_bg = Cm._bwd_common(saved, cot, tiles_x, tiles_y, ts)
    s = Cm._slab_from_src(xy, conic, color, opacity, depth, src)
    return s.sum() + gC.sum() + G.sum() + gTf.sum()

def pre_c():
    gC, gA, gD, G, gTf, d_bg = Cm._bwd_common(saved, cot, tiles_x, tiles_y, ts)
    s = Cm._slab_from_src(xy, conic, color, opacity, depth, src)
    g = pallas_composite_bwd(s, astarts, bins.tile_counts, gC, gA, gD, G, gTf, tiles_x, tiles_y, ts)
    return g.sum()

def pre_d():
    gC, gA, gD, G, gTf, d_bg = Cm._bwd_common(saved, cot, tiles_x, tiles_y, ts)
    s = Cm._slab_from_src(xy, conic, color, opacity, depth, src)
    g = pallas_composite_bwd(s, astarts, bins.tile_counts, gC, gA, gD, G, gTf, tiles_x, tiles_y, ts)
    rows = jnp.take(g[:, :16], apos, axis=0, mode="clip").reshape(n, -1, 16).sum(axis=1)
    return rows.sum()

for name, f in [("pre_a", pre_a), ("pre_b", pre_b), ("pre_c", pre_c), ("pre_d", pre_d)]:
    print(name, ":", timeit(jax.jit(f)), "ms")
