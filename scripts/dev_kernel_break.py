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
slab = jax.jit(lambda: jnp.pad(Cm._sorted_slab(
    proj.xy, proj.conic, proj.color,
    jnp.where(proj.valid, proj.opacity, 0.0), proj.depth,
    bins.sorted_ids, bins.depth_order, bins.sorted_rank),
    ((0, 0), (0, 512))))()   # extra overrun pad for CHUNK=256 variants
starts, counts = bins.tile_starts, bins.tile_counts

CHUNK, SLAB_W = pk.CHUNK, pk.SLAB_W


def make_fwd(stage: str):
    npix = TS * TS
    fori = stage.endswith("_fori")
    stage = stage.removesuffix("_fori")
    CHUNK = 256 if stage.endswith("_c256") else pk.CHUNK
    stage = stage.removesuffix("_c256")
    if stage.endswith("_high"):
        pk.MM_PRECISION = jax.lax.Precision.HIGH
    elif stage.endswith("_dflt"):
        pk.MM_PRECISION = jax.lax.Precision.DEFAULT
    else:
        pk.MM_PRECISION = jax.lax.Precision.HIGHEST
    stage = stage.removesuffix("_high").removesuffix("_dflt")

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

        if stage == "noop":
            c4_out[0] = jnp.zeros((8, npix), jnp.float32)
            return

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
            if stage in ("pvpu", "fullvpu"):
                # power via VPU elementwise with column broadcasts (no MXU)
                a_c = AT[:, pk._A:pk._A + 1]
                b_c = AT[:, pk._B:pk._B + 1]
                c_c = AT[:, pk._C:pk._C + 1]
                dx = X - (AT[:, pk._X:pk._X + 1] - ox)
                dy = Y - (AT[:, pk._Y:pk._Y + 1] - oy)
                power = dx * (-0.5 * a_c * dx - b_c * dy) - 0.5 * c_c * dy * dy
                pos16 = (c * CHUNK - head) + jax.lax.broadcasted_iota(
                    jnp.int32, AT.shape, 0)
                masked = jnp.where((pos16 >= 0) & (pos16 < count), AT, 0.0)
                opa_m = jnp.where(
                    masked[:, pk._VAL:pk._VAL + 1] > 0.0,
                    masked[:, pk._OPA:pk._OPA + 1], 0.0)
                alpha = jnp.minimum(pk.ALPHA_MAX,
                                    opa_m * jnp.exp(jnp.minimum(power, 0.0)))
                alpha = jnp.where(alpha >= pk.ALPHA_MIN, alpha, 0.0)
                if stage == "pvpu":
                    C4 = C4 + alpha[:8] * 1e-30
                    return (c + 1, T_raw, C4)
                W, T_exc, inc, T_raw, _ = pk._transmittance(alpha, T_raw)
                C4 = C4 + jax.lax.dot_general(
                    pk._color_lhs(A), W, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                return (c + 1, T_raw, C4)
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
                    precision=pk.MM_PRECISION)
                C4 = C4 + power[:8] * 1e-30
                return (c + 1, T_raw, C4)
            alpha = pk._alpha_matrix(A, AT, c * CHUNK - head, count,
                                     basis8, ox, oy)
            if stage == "alpha":
                C4 = C4 + alpha[:8] * 1e-30
                return (c + 1, T_raw, C4)
            W, T_exc, inc, T_raw, _ = pk._transmittance(alpha, T_raw)
            if stage == "trans":
                C4 = C4 + W[:8] * 1e-30
                return (c + 1, T_raw, C4)
            C4 = C4 + jax.lax.dot_general(
                pk._color_lhs(A), W, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=pk.MM_PRECISION)
            return (c + 1, T_raw, C4)

        if fori:
            c, T_raw, C4 = jax.lax.fori_loop(
                0, n_chunks, lambda i, s: body(s),
                (0, ones_row, jnp.zeros((8, npix), jnp.float32)))
        else:
            def cond(state):
                c, T_raw = state[0], state[1]
                return (c < n_chunks) & (jnp.max(T_raw) >= pk.T_EPS)

            c, T_raw, C4 = jax.lax.while_loop(
                cond, body, (0, ones_row, jnp.zeros((8, npix), jnp.float32)))

            @pl.when(c < n_chunks)
            def _():
                dma(c % 2, c).wait()

        if stage == "cprobe":
            # report executed trips + assigned trips in spare output rows
            C4 = jnp.concatenate(
                [C4[:6],
                 jnp.full((1, npix), c, jnp.float32),
                 jnp.full((1, npix), n_chunks, jnp.float32)], axis=0)
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


def make_fwd_hbm(stage: str):
    """fwd with an HBM output + manual double-buffered output DMA."""
    npix = TS * TS
    num_tiles = tiles_x * tiles_y

    def kernel(starts_ref, counts_ref, slab_hbm, out_hbm, buf, sem,
               obuf, osem):
        t = pl.program_id(0)
        oslot = jax.lax.rem(t, 2)

        def dma_o(slot, tt):
            return pltpu.make_async_copy(
                obuf.at[slot], out_hbm.at[tt], osem.at[slot])

        if stage == "noop_hbm":
            @pl.when(t >= 2)
            def _():
                dma_o(oslot, t - 2).wait()
            obuf[oslot] = jnp.zeros((8, npix), jnp.float32)
            dma_o(oslot, t).start()
        else:
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
                AT = A.T
                alpha = pk._alpha_matrix(A, AT, c * CHUNK - head, count,
                                         basis8, ox, oy)
                W, T_exc, inc, T_raw, _ = pk._transmittance(alpha, T_raw)
                C4 = C4 + jax.lax.dot_general(
                    pk._color_lhs(A), W, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=pk.MM_PRECISION)
                return (c + 1, T_raw, C4)

            def cond(state):
                c, T_raw = state[0], state[1]
                return (c < n_chunks) & (jnp.max(T_raw) >= pk.T_EPS)

            c, T_raw, C4 = jax.lax.while_loop(
                cond, body, (0, ones_row, jnp.zeros((8, npix), jnp.float32)))

            @pl.when(c < n_chunks)
            def _():
                dma(c % 2, c).wait()

            @pl.when(t >= 2)
            def _():
                dma_o(oslot, t - 2).wait()
            obuf[oslot] = C4
            dma_o(oslot, t).start()

        # drain on the final grid step
        @pl.when(t == num_tiles - 1)
        def _():
            @pl.when(t >= 1)
            def _():
                dma_o(jax.lax.rem(t - 1, 2), t - 1).wait()
            dma_o(oslot, t).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.VMEM((2 * SLAB_W, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.VMEM((2, 8, npix), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    return jax.jit(lambda s, st, ct: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((num_tiles, 8, npix),
                                               jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(st, ct, s))


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


def make_fwd_tpb(tpb: int, prec=None):
    """Production fwd staged over ``tpb`` tiles per grid program."""
    npix = TS * TS
    num_tiles = tiles_x * tiles_y
    if prec is not None:
        pk.MM_PRECISION = prec

    def kernel(starts_ref, counts_ref, slab_hbm, c4_out, buf, sem):
        g = pl.program_id(0)
        ones_row = jnp.ones((1, npix), jnp.float32)

        for ti in range(tpb):
            t = g * tpb + ti
            start = starts_ref[t]
            head = jax.lax.rem(start, CHUNK)
            base = start - head
            count = counts_ref[t]
            X, Y, ox, oy = pk._pixel_rows(t, tiles_x, TS)
            basis8 = pk._basis8(X, Y)
            n_chunks = pl.cdiv(head + count, CHUNK)

            def dma(slot, c, base=base):
                off = pl.multiple_of(base + c * CHUNK, CHUNK)
                boff = pl.multiple_of(slot * SLAB_W, SLAB_W)
                return pltpu.make_async_copy(
                    slab_hbm.at[:, pl.ds(off, CHUNK)],
                    buf.at[pl.ds(boff, SLAB_W)], sem.at[slot])

            @pl.when(n_chunks > 0)
            def _():
                dma(0, 0).start()

            def body(state, head=head, count=count, basis8=basis8,
                     ox=ox, oy=oy, n_chunks=n_chunks, dma=dma):
                c, T_raw, C4 = state

                @pl.when(c + 1 < n_chunks)
                def _():
                    dma((c + 1) % 2, c + 1).start()

                dma(c % 2, c).wait()
                boff = pl.multiple_of((c % 2) * SLAB_W, SLAB_W)
                A = buf[pl.ds(boff, SLAB_W)]
                AT = A.T
                alpha = pk._alpha_matrix(A, AT, c * CHUNK - head, count,
                                         basis8, ox, oy)
                W, T_exc, inc, T_raw, _ = pk._transmittance(alpha, T_raw)
                C4 = C4 + jax.lax.dot_general(
                    pk._color_lhs(A), W, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=pk.MM_PRECISION)
                return (c + 1, T_raw, C4)

            def cond(state, n_chunks=n_chunks):
                c, T_raw = state[0], state[1]
                return (c < n_chunks) & (jnp.max(T_raw) >= pk.T_EPS)

            c, T_raw, C4 = jax.lax.while_loop(
                cond, body, (0, ones_row, jnp.zeros((8, npix), jnp.float32)))

            @pl.when(c < n_chunks)
            def _(c=c, dma=dma):
                dma(c % 2, c).wait()

            c4_out[ti] = C4

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(num_tiles // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((tpb, 8, npix), lambda t, *p: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * SLAB_W, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    return jax.jit(lambda s, st, ct: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((num_tiles, 8, npix),
                                               jnp.float32),
        grid_spec=grid_spec)(st, ct, s))


stages = sys.argv[1:] or ["dma", "power", "alpha", "trans", "full"]
prev = 0.0
for st in stages:
    if st == "cprobe":
        out = np.asarray(make_fwd(st)(slab, starts, counts))
        trips, assigned = out[:, 6, 0], out[:, 7, 0]
        print(f"executed {trips.sum():.0f} / assigned {assigned.sum():.0f} "
              f"chunks; tiles exiting early: {(trips < assigned).sum()}/"
              f"{len(trips)}", flush=True)
        continue
    if st.startswith("tpb"):
        f = make_fwd_tpb(int(st.removeprefix("tpb")))
    elif st.endswith("_hbm"):
        f = make_fwd_hbm(st)
    else:
        f = make_fwd(st)
    ms = timeit(f, slab, starts, counts)
    print(f"{st:8s} {ms:7.3f} ms  (+{ms - prev:6.3f})", flush=True)
    prev = ms
