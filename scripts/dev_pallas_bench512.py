import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat import rasterize

rng = np.random.default_rng(0)
n = 131072; H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32))
scales = jnp.exp(jnp.asarray(rng.uniform(np.log(0.002), np.log(0.01), size=(n, 3)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)
bg = jnp.ones(3)
kw = dict(tile_size=32, max_tiles=8, max_per_tile=4096, chunk=32)

# correctness at bench scale
fx = jax.jit(lambda m: rasterize(m, shs, opa, scales, quats, cam, bg, 1, backend="xla", **kw).image)
fp = jax.jit(lambda m: rasterize(m, shs, opa, scales, quats, cam, bg, 1, backend="pallas", **kw).image)
ix = fx(means); ip = fp(means)
print("image max diff:", float(jnp.abs(ix - ip).max()), "mean img:", float(ip.mean()))

def timeit(f, *a, iters=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3

print("xla fwd ms:", timeit(fx, means))
print("pallas fwd ms:", timeit(fp, means))

def lossx(m): return jnp.mean(fx(m))
def lossp(m): return jnp.mean(rasterize(m, shs, opa, scales, quats, cam, bg, 1, backend="pallas", **kw).image)
gp = jax.jit(jax.grad(lossp))
gx = jax.jit(jax.grad(lambda m: jnp.mean(rasterize(m, shs, opa, scales, quats, cam, bg, 1, backend="xla", **kw).image)))
dgx = gx(means); dgp = gp(means)
print("grad diff:", float(jnp.abs(dgx - dgp).max()), "grad norm:", float(jnp.abs(dgx).sum()))
print("xla fwd+bwd ms:", timeit(gx, means))
print("pallas fwd+bwd ms:", timeit(gp, means))
