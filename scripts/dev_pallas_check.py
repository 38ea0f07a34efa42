"""Compare pallas vs xla rasterizer backends on the TPU chip."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat import rasterize

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
kw = dict(tile_size=32, max_tiles=16, max_per_tile=2048, chunk=32)

fx = jax.jit(lambda: rasterize(means, shs, opa, scales, quats, cam, bg, 1, backend="xla", **kw))
fp = jax.jit(lambda: rasterize(means, shs, opa, scales, quats, cam, bg, 1, backend="pallas", **kw))
ox = fx(); op = fp()
di = float(jnp.abs(ox.image - op.image).max())
da = float(jnp.abs(ox.alpha - op.alpha).max())
dd = float(jnp.abs(ox.depth - op.depth).max())
print("fwd max diffs: image", di, "alpha", da, "depth", dd)

wimg = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
def loss(be, m, s, o, sc, q, soff, sabs):
    out = rasterize(m, s, o, sc, q, cam, bg, 1, backend=be,
                    screen_offset=soff, screen_abs=sabs, **kw)
    return jnp.sum(out.image * wimg) + 0.2 * jnp.sum(out.alpha) + 0.1 * jnp.sum(out.depth)
zeros = jnp.zeros((n, 2))
gx = jax.jit(jax.grad(lambda *a: loss("xla", *a), argnums=(0,1,2,3,4,5,6)))(means, shs, opa, scales, quats, zeros, zeros)
gp = jax.jit(jax.grad(lambda *a: loss("pallas", *a), argnums=(0,1,2,3,4,5,6)))(means, shs, opa, scales, quats, zeros, zeros)
for a, b, nm in zip(gx, gp, ["means","shs","opa","scales","quats","soff","sabs"]):
    sc_ = max(1e-6, float(jnp.abs(a).max()))
    d = float(jnp.abs(a - b).max()) / sc_
    print(f"grad rel-max-diff {nm}: {d:.2e} (scale {sc_:.3g})")
