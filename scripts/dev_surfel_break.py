"""Stripped-stage roofline of the SURFEL (2DGS) fwd kernel on real TPU.

Port of ``dev_kernel_break.py``'s protocol (VERDICT r4 ask #4): same
grid/DMA/loop shell as the production ``pallas_surfel._fwd_kernel``,
stages progressively enabled, each timed on the chip so the incremental
cost of every stage is measured, not modeled.

Stages:
  noop   — grid shell only
  dma    — + slab DMA + trivial touch (loop shell + bandwidth)
  alpha  — + ray-plane geometry, 2D filter, culling (depth=False)
  geomd  — + the depth mapping block (m via rdet path)
  trans  — + transmittance ladder
  acc    — + the 8-row accumulation matmul (color+normal+ΣW)
  full   — + depth/moment sums + median crossing + dist epilogue
           (== production fwd)

Scene: the 3DGS-comparable bench scene (overflow-free; SCALES=free for
the historical 0.004-0.02 free-scale scene).
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
from generativedensification_tpu.splat import surfel as S
from generativedensification_tpu.splat import pallas_surfel as psf
from generativedensification_tpu.splat import binning as Bn
from generativedensification_tpu.splat.projection import ProjectedGaussians

rng = np.random.default_rng(0)
n = 131072; H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32))
_smin, _smax = (
    (0.004, 0.02) if os.environ.get("SCALES", "") == "free" else (0.002, 0.01)
)
scales = jnp.exp(jnp.asarray(
    rng.uniform(np.log(_smin), np.log(_smax), size=(n, 2)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)

TS = int(os.environ.get("TS", "32"))
MT = int(os.environ.get("MT", "4"))
tiles_x = tiles_y = W // TS

# -- surfel data plane up to the sorted slab (production path pieces)
def build():
    M, n_view, xy, depth, color, radius, valid = S._surfel_setup(
        means, scales, quats, opa, shs, cam, 1
    )
    acr, bcr, ccr, det = S._surfel_coeffs(M)
    opacity_f = opa.astype(jnp.float32)
    tau = jnp.log(jnp.maximum(opacity_f, 1e-12) * 255.0)
    lam = 2.0 * jnp.maximum(tau, 1e-6) / jnp.maximum(radius, 1.0) ** 2
    conic_circ = jnp.stack([lam, jnp.zeros_like(lam), lam], axis=-1)
    proj = ProjectedGaussians(
        xy=xy, depth=depth, conic=conic_circ, color=color,
        opacity=opacity_f, radius=radius, valid=valid,
    )
    bins = Bn.bin_gaussians(proj, H, W, tile_size=TS, max_tiles=MT)
    opacity_eff = jnp.where(valid, proj.opacity, 0.0)
    slab_t = psf._sorted_surfel_slab(
        acr, bcr, ccr, det, xy, radius, color, opacity_eff, n_view,
        bins.sorted_ids, bins.depth_order, bins.sorted_rank,
    )
    return slab_t, bins.tile_starts, jnp.minimum(bins.tile_counts, 4096), bins.overflow

slab, starts, counts, overflow = jax.jit(build)()
print(f"slab {slab.shape}, overflow {int(overflow)}", flush=True)
scal = jnp.asarray([0.1, 10.0], jnp.float32)

CHUNK, SLAB_W2 = psf.CHUNK, psf.SLAB_W2


def make_fwd(stage: str):
    npix = TS * TS

    def kernel(starts_ref, counts_ref, scal_ref, slab_hbm, c8_out, ex_out,
               buf, sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        head = jax.lax.rem(start, CHUNK)
        base = start - head
        count = counts_ref[t]
        znear = scal_ref[0]; zfar = scal_ref[1]
        Xl, Yl, ox, oy = psf._pix_rows(t, tiles_x, TS)
        n_chunks = pl.cdiv(head + count, CHUNK)

        def dma(slot, c):
            off = pl.multiple_of(base + c * CHUNK, CHUNK)
            boff = pl.multiple_of(slot * SLAB_W2, SLAB_W2)
            return pltpu.make_async_copy(
                slab_hbm.at[:, pl.ds(off, CHUNK)],
                buf.at[pl.ds(boff, SLAB_W2)], sem.at[slot])

        zeros = jnp.zeros((1, npix), jnp.float32)
        if stage == "noop":
            c8_out[0] = jnp.zeros((8, npix), jnp.float32)
            ex_out[0] = jnp.zeros((8, npix), jnp.float32)
            return

        @pl.when(n_chunks > 0)
        def _():
            dma(0, 0).start()

        ones = jnp.ones((1, npix), jnp.float32)

        def body(state):
            c, T_raw, C8, Dexp, Dmed, m1, m2 = state

            @pl.when(c + 1 < n_chunks)
            def _():
                dma((c + 1) % 2, c + 1).start()

            dma(c % 2, c).wait()
            boff = pl.multiple_of((c % 2) * SLAB_W2, SLAB_W2)
            A = buf[pl.ds(boff, SLAB_W2)]
            if stage == "dma":
                # touch via one tiny MXU matmul (scalar reduces of the
                # 32-row slab crash Mosaic two different ways; the 1e-30
                # ones operand keeps XLA from constant-folding it away)
                C8 = C8 + jax.lax.dot_general(
                    A[:8], jnp.full((CHUNK, npix), 1e-30, jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return (c + 1, T_raw, C8, Dexp, Dmed, m1, m2)
            AT = A.T
            depth_on = stage not in ("alpha",)
            alpha, _, _, _, _, zhit, m, _, _, _ = psf._chunk_geometry(
                AT, Xl, Yl, ox, oy, c * CHUNK - head, count, znear, zfar,
                depth=depth_on, bwd=False,
            )
            if stage == "alpha" or stage == "geomd":
                C8 = C8 + alpha[:8] * 1e-30
                return (c + 1, T_raw, C8, Dexp, Dmed, m1, m2)
            Wm, T_exc, inc, T_raw_new, U = psf._transmittance(alpha, T_raw)
            if stage == "trans":
                C8 = C8 + Wm[:8] * 1e-30
                return (c + 1, T_raw_new, C8, Dexp, Dmed, m1, m2)
            C8 = C8 + jax.lax.dot_general(
                psf._acc_lhs(A, with_ones=True), Wm,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if stage == "acc":
                return (c + 1, T_raw_new, C8, Dexp, Dmed, m1, m2)
            wm = Wm * m
            wm2 = wm * m
            Dexp = Dexp + jnp.sum(Wm * zhit, axis=0, keepdims=True)
            m1 = m1 + jnp.sum(wm, axis=0, keepdims=True)
            m2 = m2 + jnp.sum(wm2, axis=0, keepdims=True)
            crossed = ((T_exc > 0.5) & (U < 0.5) & (alpha > 0.0)).astype(
                jnp.float32)
            zmed = jnp.sum(crossed * zhit, axis=0, keepdims=True)
            any_cross = jnp.sum(crossed, axis=0, keepdims=True) > 0.0
            Dmed = jnp.where((Dmed == 0.0) & any_cross, zmed, Dmed)
            return (c + 1, T_raw_new, C8, Dexp, Dmed, m1, m2)

        def cond(state):
            c, T_raw = state[0], state[1]
            return (c < n_chunks) & (jnp.max(T_raw) >= psf.T_EPS)

        c, T_raw, C8, Dexp, Dmed, m1, m2 = jax.lax.while_loop(
            cond, body,
            (0, ones, jnp.zeros((8, npix), jnp.float32),
             zeros, zeros, zeros, zeros))

        @pl.when(c < n_chunks)
        def _():
            dma(c % 2, c).wait()

        c8_out[0] = C8
        wsum = C8[6:7]
        dist = wsum * m2 - m1 * m1
        ex_out[0] = jnp.concatenate(
            [wsum, Dexp, Dmed, dist, m1, m2, 1.0 - wsum, zeros], axis=0)

    num_tiles = tiles_x * tiles_y
    npix = TS * TS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, 8, npix), lambda t, *p: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npix), lambda t, *p: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2 * SLAB_W2, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    return jax.jit(lambda s, st, ct: pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, 8, npix), jnp.float32),
                   jax.ShapeDtypeStruct((num_tiles, 8, npix), jnp.float32)],
        grid_spec=grid_spec)(st, ct, scal, s))


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


stages = sys.argv[1:] or ["noop", "dma", "alpha", "geomd", "trans", "acc", "full"]
prev = 0.0
for st in stages:
    f = make_fwd(st)
    ms = timeit(f, slab, starts, counts)
    print(f"{st:8s} {ms:7.3f} ms  (+{ms - prev:6.3f})", flush=True)
    prev = ms
