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

def packed(m):
    proj = project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats)
    bins = bin_gaussians(proj, H, W, 32, 8)
    table = jnp.concatenate([
        proj.xy, proj.conic, proj.color, proj.opacity[:, None],
        proj.depth[:, None], jnp.zeros((n, 7), jnp.float32)], axis=1)
    g = jnp.take(table, bins.sorted_ids, axis=0)
    return g.sum()
print("packed single row-gather:", round(timeit(jax.jit(packed)),2), flush=True)

def clipmode(m):
    proj = project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats)
    bins = bin_gaussians(proj, H, W, 32, 8)
    ids = bins.sorted_ids
    return sum(jnp.take(a, ids, 0, mode="clip").sum()
               for a in (proj.xy, proj.conic, proj.color, proj.opacity, proj.depth))
print("gathers mode=clip:", round(timeit(jax.jit(clipmode)),2), flush=True)

# two separate jits: does splitting restore speed?
f1 = jax.jit(lambda m: (lambda proj, bins: (proj.xy, proj.conic, proj.color, proj.opacity, proj.depth, bins.sorted_ids))(
    project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats),
    bin_gaussians(project_gaussians(m, None, shs, opa, cam, 1, scales=scales, rotations=quats), H, W, 32, 8)))
outs = f1(means); jax.block_until_ready(outs)
f2 = jax.jit(lambda arrs, ids: sum(jnp.take(a, ids, 0).sum() for a in arrs))
def split(m):
    *arrs, ids = f1(m)
    return f2(tuple(arrs), ids)
print("split two jits:", round(timeit(split),2), flush=True)
