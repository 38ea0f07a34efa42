"""A/B the bilinear_sample custom VJP vs plain autodiff on TPU (flagship shapes)."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.models.backbone import bilinear_sample

V, H, W, C, M = 4, 512, 512, 8, 49152
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(size=(V, H, W, C)), jnp.float32)
xys = jnp.asarray(rng.uniform(-1, 1, (V, M, 2)), jnp.float32)

def plain(img, xy_norm):
    Hh, Ww, Cc = img.shape
    x = ((xy_norm[..., 0] + 1.0) * Ww - 1.0) * 0.5
    y = ((xy_norm[..., 1] + 1.0) * Hh - 1.0) * 0.5
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = (x - x0)[..., None]; wy = (y - y0)[..., None]
    def tap(xi, yi):
        inb = (xi >= 0) & (xi < Ww) & (yi >= 0) & (yi < Hh)
        v = img[jnp.clip(yi, 0, Hh - 1).astype(jnp.int32),
                jnp.clip(xi, 0, Ww - 1).astype(jnp.int32)]
        return jnp.where(inb[..., None], v, 0.0)
    return (tap(x0, y0) * (1 - wx) * (1 - wy) + tap(x0 + 1, y0) * wx * (1 - wy)
            + tap(x0, y0 + 1) * (1 - wx) * wy + tap(x0 + 1, y0 + 1) * wx * wy)

def bench(f, label):
    def loss(imgs, xys):
        return jnp.sum(jax.vmap(f)(imgs, xys) ** 2)
    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def chain(imgs, xys, n):
        def body(i, c):
            im, xy = c
            gi, gx = g(im, xy)
            # serial dependence through both operands
            return im + 1e-20 * gi, xy + 1e-20 * gx
        return jax.lax.fori_loop(0, n, body, (imgs, xys))
    r = chain(imgs, xys, 2); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = chain(imgs, xys, 20); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 20
    print(f"{label}: {dt*1e3:.2f} ms/iter (fwd+bwd)", flush=True)

bench(bilinear_sample, "custom windowed-scatter VJP")
bench(plain, "plain autodiff (4 row-scatters)")
