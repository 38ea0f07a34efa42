"""Compare surfel (2DGS) pallas vs xla backends ON THE TPU CHIP.

Covers what tests/test_{surfel,pallas_surfel}.py prove in CPU interpret
mode: forward maps, full backward grads, and the fused AbsGS selection
(sel_abs) — the on-chip validation VERDICT r2 asked for (the interpret
path shares the kernel code but not Mosaic's lowering).
"""
import sys; sys.path.insert(0, "/root/repo")
import os
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.surfel import rasterize_surfels

rng = np.random.default_rng(3)
n = 4096; H = W = 128
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.3, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)), jnp.float32))
scales = jnp.exp(jnp.asarray(
    rng.uniform(np.log(0.01), np.log(0.05), size=(n, 2)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)
bg = jnp.asarray([0.2, 0.5, 0.8])
gt = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
kw = dict(sh_degree=1, tile_size=32, max_tiles=8, max_per_tile=2048, chunk=32)

fx = jax.jit(lambda: rasterize_surfels(
    means, shs, opa, scales, quats, cam, bg, backend="xla", **kw))
fp = jax.jit(lambda: rasterize_surfels(
    means, shs, opa, scales, quats, cam, bg, backend="pallas", **kw))
ox, op = fx(), fp()
for f in ("image", "alpha", "depth_expected", "depth_median", "normal",
          "dist"):
    d = float(jnp.abs(getattr(ox, f) - getattr(op, f)).max())
    print(f"fwd max diff {f}: {d:.3e}")

wimg = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)


def loss(be, m, s, o, sc, q):
    out = rasterize_surfels(m, s, o, sc, q, cam, bg, backend=be, **kw)
    return (jnp.sum(out.image * wimg) + 0.2 * jnp.sum(out.alpha)
            + 0.05 * jnp.sum(out.depth_expected)
            + 0.05 * jnp.sum(out.depth_median)
            + 0.02 * jnp.sum(out.normal) + 0.01 * jnp.sum(out.dist))


args = (means, shs, opa, scales, quats)
gx = jax.jit(jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3, 4)))(*args)
gp = jax.jit(jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4)))(*args)
for a, b, nm in zip(gx, gp, ["means", "shs", "opa", "scales", "quats"]):
    sc_ = max(1e-6, float(jnp.abs(a).max()))
    d = np.abs(np.asarray(a - b)).ravel() / sc_
    q = np.quantile(d, [0.99, 0.999, 1.0])
    print(f"grad rel diff {nm}: p99 {q[0]:.1e} p99.9 {q[1]:.1e} "
          f"max {q[2]:.1e} (scale {sc_:.3g}, "
          f">1e-3: {int((d > 1e-3).sum())}/{d.size})")

sx = jax.jit(lambda: rasterize_surfels(
    means, shs, opa, scales, quats, cam, bg, backend="xla", sel_gt=gt,
    **kw).sel_abs)()
sp = jax.jit(lambda: rasterize_surfels(
    means, shs, opa, scales, quats, cam, bg, backend="pallas", sel_gt=gt,
    **kw).sel_abs)()
sc_ = max(1e-8, float(jnp.abs(sx).max()))
print(f"sel_abs rel-max-diff: {float(jnp.abs(sx - sp).max()) / sc_:.2e} "
      f"(scale {sc_:.3g})")
