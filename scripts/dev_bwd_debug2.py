import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians
from generativedensification_tpu.splat.composite import composite_tiles

rng = np.random.default_rng(0)
n = 4096; H = W = 128
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.3, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)), jnp.float32))
scales = jnp.exp(jnp.asarray(rng.uniform(np.log(0.005), np.log(0.03), size=(n, 3)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)
bg = jnp.asarray([0.2, 0.5, 0.8])

proj = project_gaussians(means, None, shs, opa, cam, 1, scales=scales, rotations=quats)
bins = bin_gaussians(proj, H, W, tile_size=32, max_tiles=16)
ids = bins.sorted_ids
sxy = jnp.take(proj.xy, ids, axis=0)
scon = jnp.take(proj.conic, ids, axis=0)
scol = jnp.take(proj.color, ids, axis=0)
sopa = jnp.take(proj.opacity, ids, axis=0)
sdep = jnp.take(proj.depth, ids, axis=0)
sabs = jnp.zeros_like(sxy)
ba = (bins.tile_starts, bins.tile_counts, bins.sorted_valid)
print("P =", sxy.shape[0], "counts sum", int(bins.tile_counts.sum()), "max", int(bins.tile_counts.max()))

def loss(be, xy, xy_abs, con, col, op, dep):
    img, alpha, depm = composite_tiles(xy, xy_abs, con, col, op, dep, bg, ba,
                                       bins.tiles_x, bins.tiles_y, 32, 2048, 32, be)
    return jnp.sum(img * 0.3) + 0.2 * jnp.sum(alpha) + 0.1 * jnp.sum(depm)

for be in ["xla", "pallas"]:
    v = jax.jit(lambda *a: loss(be, *a))(sxy, sabs, scon, scol, sopa, sdep)
    g = jax.jit(jax.grad(lambda *a: loss(be, *a), argnums=(0,1,2,3,4,5)))(
        sxy, sabs, scon, scol, sopa, sdep)
    print(be, "loss", float(v), "grads:", [float(jnp.abs(x).sum()) for x in g])
