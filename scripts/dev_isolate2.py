import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians
from generativedensification_tpu.splat.composite import composite_tiles

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
ids = jax.block_until_ready(bins.sorted_ids)
sxy = jnp.take(proj.xy, ids, 0); scon = jnp.take(proj.conic, ids, 0)
scol = jnp.take(proj.color, ids, 0); sopa = jnp.take(proj.opacity, ids, 0)
sdep = jnp.take(proj.depth, ids, 0)
ba = (bins.tile_starts, bins.tile_counts, bins.sorted_valid)

def timeit(f, iters=20):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f()
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/iters*1e3

comp = jax.jit(lambda xy: composite_tiles(xy, jnp.zeros_like(xy), scon, scol, sopa, sdep,
    jnp.ones(3), ba, 16, 16, 32, 4096, 32, "pallas")[0])
print("composite(pallas incl layout/slab/kernel) ms:", timeit(lambda: comp(sxy)))

# gather alone inside jit
gath = jax.jit(lambda: [jnp.take(a, bins.sorted_ids, 0).sum() for a in
                        (proj.xy, proj.conic, proj.color, proj.opacity, proj.depth)])
print("gathers ms:", timeit(lambda: gath()))
