"""Break down the srcal slab build stages."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians
from generativedensification_tpu.splat.composite import _pack_table, _aligned_layout
from generativedensification_tpu.splat.pallas_kernels import CHUNK, SLAB_W

rng = np.random.default_rng(0)
n = 131072; H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32))
scales = jnp.exp(jnp.asarray(rng.uniform(np.log(0.002), np.log(0.01), size=(n, 3)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)

proj = jax.jit(lambda: project_gaussians(means, None, shs, opa, cam, 1, scales=scales, rotations=quats))()
bins = jax.jit(lambda: bin_gaussians(proj, H, W, 32, 8))()
ids, tile_starts, tile_counts = bins.sorted_ids, bins.tile_starts, bins.tile_counts
num_tiles = 256
xy, conic, color, opacity, depth = proj.xy, proj.conic, proj.color, jnp.where(proj.valid, proj.opacity, 0.), proj.depth
P = ids.shape[0]
BLK = 2048

def timeit(f, *a, iters=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3

def ru(x, m): return (x + m - 1) // m * m

al = jax.jit(lambda: _aligned_layout(tile_starts, tile_counts, P, num_tiles))
print("aligned_layout:", timeit(al), "ms")
astarts, pos, live, P_al = al()
M = ru(P_al + CHUNK, BLK)

sc = jax.jit(lambda: jnp.full((M,), n, jnp.int32).at[pos].set(
    ids, mode="drop", unique_indices=True, indices_are_sorted=True))
print("int scatter:", timeit(sc), "ms")
src = sc()

pt = jax.jit(lambda: _pack_table(xy, conic, color, opacity, depth))
print("pack_table:", timeit(pt), "ms")
table = pt()
table_pad = jnp.concatenate([table, jnp.zeros((1, SLAB_W), jnp.float32)])

ga = jax.jit(lambda: jnp.take(table_pad, src, axis=0, mode="clip"))
print("row gather (M,16):", timeit(ga), "ms")
rows = ga()

tr = jax.jit(lambda: rows.T)
print("transpose alone:", timeit(tr), "ms")

gat = jax.jit(lambda: jnp.take(table_pad, src, axis=0, mode="clip").T)
print("gather+T fused:", timeit(gat), "ms")

# gather on transposed operand (16, N) along axis=1
table_t = table_pad.T
ga2 = jax.jit(lambda: jnp.take(table_t, src, axis=1, mode="clip"))
print("col gather (16,M):", timeit(ga2), "ms")
