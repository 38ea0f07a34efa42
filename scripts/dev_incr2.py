import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians

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

def gath(barrier):
    def fn(m):
        proj = project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats)
        bins = bin_gaussians(proj, H, W, 32, 8)
        ids = bins.sorted_ids
        arrs = (proj.xy, proj.conic, proj.color, proj.opacity, proj.depth)
        if barrier:
            ids, *arrs = jax.lax.optimization_barrier((ids, *arrs))
        return sum(jnp.take(a, ids, 0).sum() for a in arrs)
    return jax.jit(fn)

def sort_only(m):
    proj = project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats)
    bins = bin_gaussians(proj, H, W, 32, 8)
    return bins.sorted_ids.sum() + sum(a.sum() for a in (proj.xy, proj.conic, proj.color, proj.opacity, proj.depth))

print("proj+bin+sums:", round(timeit(jax.jit(sort_only)),2), flush=True)
print("gathers no barrier:", round(timeit(gath(False)),2), flush=True)
print("gathers with barrier:", round(timeit(gath(True)),2), flush=True)

# gather with ids only barriered
def gath2(m):
    proj = project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats)
    bins = bin_gaussians(proj, H, W, 32, 8)
    ids = jax.lax.optimization_barrier(bins.sorted_ids)
    # barrier ONLY ids; gather from value-materialized copies via +0 trick
    return sum(jnp.take(a, ids, 0).sum() for a in (proj.xy, proj.conic, proj.color, proj.opacity, proj.depth))
print("gathers ids-barrier:", round(timeit(jax.jit(gath2)),2), flush=True)

def gath3(m):
    proj = project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats)
    bins = bin_gaussians(proj, H, W, 32, 8)
    ids = jnp.arange(bins.sorted_ids.shape[0], dtype=jnp.int32) % n  # no sort dep
    return sum(jnp.take(a, ids, 0).sum() for a in (proj.xy, proj.conic, proj.color, proj.opacity, proj.depth)) + bins.sorted_ids.sum()
print("gathers iota-ids (sort still computed):", round(timeit(jax.jit(gath3)),2), flush=True)

def gath4(m):
    proj = project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats)
    bins = bin_gaussians(proj, H, W, 32, 8)
    ids = bins.sorted_ids
    return sum(jnp.take(a, ids, 0, mode="promise_in_bounds").sum()
               for a in (proj.xy, proj.conic, proj.color, proj.opacity, proj.depth))
print("gathers promise_in_bounds:", round(timeit(jax.jit(gath4)),2), flush=True)
