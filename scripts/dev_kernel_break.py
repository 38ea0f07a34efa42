"""Cycle breakdown of the fwd/bwd kernel INTERNALS on real TPU.

Compiles stripped variants of the fwd kernel (same grid/DMA/loop shell,
stages progressively enabled) on the bench scene so each stage's
incremental cost is measured, not modeled.  Strictly serial (tunnel rule).

Stages:
  dma      — DMA + trivial row sum of the slab (loop shell + bandwidth)
  power    — + the quadratic-form MXU matmul
  alpha    — + exp/culling elementwise block
  trans    — + transmittance ladder + W
  full     — + color accumulation matmul (== production fwd)
"""
import sys, os, time, functools

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians
from generativedensification_tpu.splat import composite as Cm
from generativedensification_tpu.splat import pallas_kernels as pk

rng = np.random.default_rng(0)
n = 131072; H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32))
scales = jnp.exp(jnp.asarray(
    rng.uniform(np.log(0.002), np.log(0.01), size=(n, 3)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)

TS = 32
MT = 4
proj = jax.jit(lambda: project_gaussians(
    means, None, shs, opa, cam, 1, scales=scales, rotations=quats))()
bins = jax.jit(lambda: bin_gaussians(proj, H, W, TS, MT))()
tiles_x = tiles_y = 512 // TS
slab = jax.jit(lambda: Cm._sorted_slab(
    proj.xy, proj.conic, proj.color,
    jnp.where(proj.valid, proj.opacity, 0.0), proj.depth,
    bins.sorted_ids, bins.depth_order, bins.sorted_rank))()
starts, counts = bins.tile_starts, bins.tile_counts

CHUNK, SLAB_W = pk.CHUNK, pk.SLAB_W


def make_fwd(stage: str):
    npix = TS * TS

    def kernel(starts_ref, counts_ref, slab_hbm, c4_out, buf, sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        head = jax.lax.rem(start, CHUNK)
        base = start - head
        count = counts_ref[t]
        X, Y, ox, oy = pk._pixel_rows(t, tiles_x, TS)
        basis8 = pk._basis8(X, Y)
        n_chunks = pl.cdiv(head + count, CHUNK)

        def dma(slot, c):
            off = pl.multiple_of(base + c * CHUNK, CHUNK)
            boff = pl.multiple_of(slot * SLAB_W, SLAB_W)
            return pltpu.make_async_copy(
                slab_hbm.at[:, pl.ds(off, CHUNK)],
                buf.at[pl.ds(boff, SLAB_W)], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            dma(0, 0).start()

        ones_row = jnp.ones((1, npix), jnp.float32)

        def body(state):
            c, T_raw, C4 = state

            @pl.when(c + 1 < n_chunks)
            def _():
                dma((c + 1) % 2, c + 1).start()

            dma(c % 2, c).wait()
            boff = pl.multiple_of((c % 2) * SLAB_W, SLAB_W)
            A = buf[pl.ds(boff, SLAB_W)]
            if stage == "dma":
                # touch the data so nothing is elided; tiny row add
                C4 = C4 + jnp.sum(A) * jnp.ones((8, npix), jnp.float32) * 1e-30
                return (c + 1, T_raw, C4)
            AT = A.T
            if stage == "power":
                # matmul only (reuse the production coef path minus mask)
                a_r = A[pk._A:pk._A + 1]; b_r = A[pk._B:pk._B + 1]
                c_r = A[pk._C:pk._C + 1]
                x_r = A[pk._X:pk._X + 1] - ox; y_r = A[pk._Y:pk._Y + 1] - oy
                z = jnp.zeros_like(a_r)
                coefs = jnp.concatenate(
                    [-0.5 * a_r, -0.5 * c_r, -b_r,
                     a_r * x_r + b_r * y_r, c_r * y_r + b_r * x_r,
                     -0.5 * (a_r * x_r * x_r + 2 * b_r * x_r * y_r
                             + c_r * y_r * y_r), z, z], axis=0)
                power = jax.lax.dot_general(
                    coefs.T, basis8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                C4 = C4 + power[:8] * 1e-30
                return (c + 1, T_raw, C4)
            alpha = pk._alpha_matrix(A, AT, c * CHUNK - head, count,
                                     basis8, ox, oy)
            if stage == "alpha":
                C4 = C4 + alpha[:8] * 1e-30
                return (c + 1, T_raw, C4)
            W, T_exc, inc, T_raw = pk._transmittance(alpha, T_raw)
            if stage == "trans":
                C4 = C4 + W[:8] * 1e-30
                return (c + 1, T_raw, C4)
            C4 = C4 + jax.lax.dot_general(
                pk._color_lhs(A), W, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return (c + 1, T_raw, C4)

        def cond(state):
            c, T_raw = state[0], state[1]
            return (c < n_chunks) & (jnp.max(T_raw) >= pk.T_EPS)

        c, T_raw, C4 = jax.lax.while_loop(
            cond, body, (0, ones_row, jnp.zeros((8, npix), jnp.float32)))

        @pl.when(c < n_chunks)
        def _():
            dma(c % 2, c).wait()

        c4_out[0] = C4

    num_tiles = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, npix), lambda t, *p: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * SLAB_W, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    return jax.jit(lambda s, st, ct: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((num_tiles, 8, npix),
                                               jnp.float32),
        grid_spec=grid_spec)(st, ct, s))


def timeit(f, *a, iters=30):
    r = f(*a); jax.block_until_ready(r)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*a)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


stages = sys.argv[1:] or ["dma", "power", "alpha", "trans", "full"]
prev = 0.0
for st in stages:
    f = make_fwd(st)
    ms = timeit(f, slab, starts, counts)
    print(f"{st:8s} {ms:7.3f} ms  (+{ms - prev:6.3f})", flush=True)
    prev = ms
