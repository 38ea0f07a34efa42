import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.splat.composite import (
    composite_tiles, _build_slab, _aligned_layout)
from generativedensification_tpu.splat.pallas_kernels import (
    pallas_composite_bwd, SLAB_W, CHUNK)

rng = np.random.default_rng(0)
P = 256
tiles_x = tiles_y = 2; ts = 32
num_tiles = 4
# synthetic sorted slot data: every tile has 50 slots
counts = jnp.asarray([50, 60, 0, 40], jnp.int32)
starts = jnp.asarray([0, 50, 110, 110], jnp.int32)
xy = jnp.asarray(rng.uniform(0, 64, (P, 2)), jnp.float32)
conic = jnp.tile(jnp.asarray([[0.05, 0.0, 0.05]], jnp.float32), (P, 1))
color = jnp.asarray(rng.uniform(0, 1, (P, 3)), jnp.float32)
opa = jnp.asarray(rng.uniform(0.2, 0.9, P), jnp.float32)
depth = jnp.asarray(rng.uniform(1, 3, P), jnp.float32)
valid = jnp.ones(P, bool)
bg = jnp.asarray([1.0, 1.0, 1.0])
bins = (starts, counts, valid)
zeros2 = jnp.zeros((P, 2))

def loss(be, xy, xy_abs, conic, color, opa, depth):
    img, alpha, dep = composite_tiles(xy, xy_abs, conic, color, opa, depth,
                                      bg, bins, tiles_x, tiles_y, ts, 128, 32, be)
    return jnp.sum(img * 0.3) + jnp.sum(alpha) * 0.2 + jnp.sum(dep) * 0.1

for be in ["xla", "pallas"]:
    v = jax.jit(lambda *a: loss(be, *a))(xy, zeros2, conic, color, opa, depth)
    g = jax.jit(jax.grad(lambda *a: loss(be, *a), argnums=(0,1,2,3,4,5)))(
        xy, zeros2, conic, color, opa, depth)
    print(be, "loss", float(v), "grad norms:",
          [float(jnp.abs(x).sum()) for x in g])
