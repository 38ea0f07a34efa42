import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.splat.composite import composite_tiles

P = 128
n = 8
starts = jnp.asarray([0], jnp.int32)
counts = jnp.asarray([n], jnp.int32)
cx = [2,6,10,14,18,22,26,30]
xy = jnp.zeros((P,2), jnp.float32)
for i,c in enumerate(cx): xy = xy.at[i].set([float(c), float(c)])
conic = jnp.tile(jnp.asarray([[0.5, 0.0, 0.5]], jnp.float32), (P,1))
color = jnp.zeros((P,3), jnp.float32).at[:n].set(1.0)
opa = jnp.zeros(P, jnp.float32).at[:n].set(0.7)
depth = jnp.ones(P, jnp.float32)
valid = jnp.arange(P) < n
bins = (starts, counts, valid)
for be in ["xla", "pallas"]:
    img, alpha, dep = jax.jit(lambda: composite_tiles(
        xy, jnp.zeros_like(xy), conic, color, opa, depth, jnp.zeros(3), bins,
        1, 1, 32, 128, 32, be))()
    a = np.asarray(alpha)
    print(be, [round(float(a[c, c]), 3) for c in cx])
