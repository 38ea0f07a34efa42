import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians
from generativedensification_tpu.splat.composite import _build_slab, _aligned_layout
from generativedensification_tpu.splat.pallas_kernels import pallas_composite_fwd, SLAB_W

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
ids = bins.sorted_ids
slab = _build_slab(jnp.take(proj.xy, ids, 0), jnp.take(proj.conic, ids, 0),
                   jnp.take(proj.color, ids, 0), jnp.take(proj.opacity, ids, 0),
                   jnp.take(proj.depth, ids, 0), bins.sorted_valid)
P = slab.shape[0]
astarts, pos, live, P_al = _aligned_layout(bins.tile_starts, bins.tile_counts, P, 256)
slab_al = jnp.zeros((P_al, SLAB_W), jnp.float32).at[pos].set(slab, mode="drop")
slab_al = jax.block_until_ready(slab_al)
astarts = jax.block_until_ready(astarts)

def timeit(f, iters=20):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0)/iters*1e3

kern = jax.jit(lambda s: pallas_composite_fwd(s, astarts, bins.tile_counts, 16, 16, 32))
print("kernel alone ms:", timeit(lambda: kern(slab_al)))

prep = jax.jit(lambda: jnp.zeros((P_al, SLAB_W), jnp.float32).at[pos].set(
    _build_slab(jnp.take(proj.xy, ids, 0), jnp.take(proj.conic, ids, 0),
                jnp.take(proj.color, ids, 0), jnp.take(proj.opacity, ids, 0),
                jnp.take(proj.depth, ids, 0), bins.sorted_valid), mode="drop"))
print("slab prep (gather+scatter) ms:", timeit(lambda: prep()))
al = jax.jit(lambda: _aligned_layout(bins.tile_starts, bins.tile_counts, P, 256))
print("aligned layout ms:", timeit(lambda: al()))

# full fwd with pallas to compare
from generativedensification_tpu.splat import rasterize
kw = dict(tile_size=32, max_tiles=8, max_per_tile=4096, chunk=32)
full = jax.jit(lambda m: rasterize(m, shs, opa, scales, quats, cam, jnp.ones(3), 1, backend="pallas", **kw).image)
print("full pallas fwd ms:", timeit(lambda: full(means)))
just_bin = jax.jit(lambda: bin_gaussians(project_gaussians(means, None, shs, opa, cam, 1, scales=scales, rotations=quats), H, W, 32, 8).sorted_ids)
print("proj+bin ms:", timeit(lambda: just_bin()))
