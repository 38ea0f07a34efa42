import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.splat.composite import composite_tiles

# ONE 32x32 tile, 3 gaussians
P = 128
starts = jnp.asarray([0], jnp.int32)
counts = jnp.asarray([3], jnp.int32)
xy = jnp.zeros((P, 2), jnp.float32).at[0].set([8., 8.]).at[1].set([16., 16.]).at[2].set([24., 24.])
conic = jnp.tile(jnp.asarray([[0.05, 0.0, 0.05]], jnp.float32), (P, 1))
color = jnp.zeros((P, 3), jnp.float32).at[0].set([1,0,0]).at[1].set([0,1,0]).at[2].set([0,0,1])
opa = jnp.zeros(P, jnp.float32).at[:3].set(0.8)
depth = jnp.ones(P, jnp.float32)
valid = jnp.arange(P) < 3
bg = jnp.zeros(3)
bins = (starts, counts, valid)
for be in ["xla", "pallas"]:
    img, alpha, dep = jax.jit(lambda: composite_tiles(
        xy, jnp.zeros_like(xy), conic, color, opa, depth, bg, bins,
        1, 1, 32, 128, 32, be))()
    print(be, "alpha@centers:", float(alpha[8,8]), float(alpha[16,16]), float(alpha[24,24]),
          "img@8,8:", np.asarray(img[8,8]).round(3), "img@16,16:", np.asarray(img[16,16]).round(3))
