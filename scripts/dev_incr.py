import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians
from generativedensification_tpu.splat.composite import (
    _aligned_layout, _build_slab_t)
from generativedensification_tpu.splat.pallas_kernels import (
    pallas_composite_fwd, CHUNK)

rng = np.random.default_rng(0)
n = 131072; H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32))
scales = jnp.exp(jnp.asarray(rng.uniform(np.log(0.002), np.log(0.01), size=(n, 3)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)

def timeit(f, iters=10):
    r = f(means); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(means)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/iters*1e3

def upto(stage):
    def fn(m):
        proj = project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats)
        if stage == 1: return proj.xy.sum()
        bins = bin_gaussians(proj, H, W, 32, 8)
        if stage == 2: return bins.sorted_ids.sum()
        ids = bins.sorted_ids
        g = [jnp.take(proj.xy, ids, 0), jnp.take(proj.conic, ids, 0),
             jnp.take(proj.color, ids, 0), jnp.take(proj.opacity, ids, 0),
             jnp.take(proj.depth, ids, 0)]
        if stage == 3: return sum(x.sum() for x in g)
        P = ids.shape[0]
        astarts, pos, live, P_al = _aligned_layout(bins.tile_starts, bins.tile_counts, P, 256)
        if stage == 4: return pos.sum() + astarts.sum()
        slab_t = _build_slab_t(g[0], g[1], g[2], g[3], g[4], bins.sorted_valid, pos, P_al + CHUNK)
        if stage == 5: return slab_t.sum()
        outs = pallas_composite_fwd(slab_t, astarts, bins.tile_counts, 16, 16, 32)
        return outs[0].sum()
    return jax.jit(fn)

for st in range(1, 7):
    print("stage", st, ":", round(timeit(upto(st)), 2), "ms", flush=True)
