"""Pallas TPU kernels for the rasterization hot loop (vectorized v2).

v1 processed one slot at a time with scalar SMEM loads (~850 cycles/slot,
96% overhead).  v2 works on whole (CHUNK slots x 1024 pixels) matrices so
the VPU/MXU see dense vector work; the only serial dependency left is the
transmittance chain over (1, 1024) pixel rows.

Per tile (one grid program, dynamic trip count via scalar prefetch):
  1. DMA the tile's chunk of the attribute-major (16, P) SORTED table —
     from the aligned-DOWN offset (tile segments start anywhere; the head
     rows belong to the previous tile and are masked) — into VMEM
     (double buffered).
  2. The Gaussian exponent is a quadratic form in pixel coordinates:
       power(k, px) = Σ_j coef_j(k) · basis_j(px),
       basis = [X², Y², XY, X, Y, 1, 0, 0]
     -> one (CHUNK, 8) @ (8, 1024) MXU matmul per chunk.
  3. alpha + culling masks: elementwise on the (CHUNK, 1024) matrix.
  4. transmittance: log-space — cumulative sums of log1p(-α) over the
     chunk via a 7-step shift-add ladder + exp (an unrolled 128-row
     serial chain costs ~6k cycles/chunk; this is ~exact and parallel),
     emitting the weight matrix W(k, px) = α·T_exc·include.
  5. color/depth accumulation: (8, CHUNK) @ (CHUNK, 1024) MXU matmul.

The backward reuses 1-4, accumulates the per-pixel inclusive prefix with
the same cumsum ladder (suffix = G - prefix trick, see composite.py), and
reduces the 12 per-slot gradient channels (incl. the AbsGS |d/dx|,
|d/dy|) as VPU row-sums over (CHUNK, 1024) matrices.  Early termination:
the chunk loop is a while_loop that stops once max(T) < 1e-4.

Semantics are bit-compatible with composite.py; tests assert parity on CPU
(interpret mode) and the dev scripts on real TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Interpret kernels off-TPU (CPU tests exercise the same code path)."""
    return jax.default_backend() != "tpu"


def _recip(x: jnp.ndarray) -> jnp.ndarray:
    """1/x for the backward's per-pair-pixel term.

    ``GD_RECIP=approx`` swaps the exact divide for the VPU's approximate
    reciprocal (~2^-12 rel err — fine for training, outside the default
    parity tolerances; A/B knob only, exact stays the default).
    """
    if os.environ.get("GD_RECIP", "exact") == "approx" and not _interpret():
        return pl.reciprocal(x, approx=True)
    return 1.0 / x


ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
SLAB_W = 16

# Precision of the in-kernel MXU matmuls (power quadratic form, color /
# contrib accumulation).  HIGHEST = 6 bf16 passes (exact f32); DEFAULT =
# 1 pass (REJECTED for correctness: the power matmul cancels
# ~480-magnitude terms to <=11, PERF.md).  Precision.HIGH (3 passes)
# is NOT offered: Mosaic's dot lowering rejects it on real TPU
# (NotImplementedError, measured r4) — the 6-vs-3-pass A/B cannot be
# run through this kernel API.  Trace-time knob for on-chip A/Bs.
import os

_MM_PRECS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}
_mm_prec_name = os.environ.get("GD_MM_PREC", "highest")
if _mm_prec_name not in _MM_PRECS:
    raise ValueError(
        f"GD_MM_PREC={_mm_prec_name!r}: expected one of {sorted(_MM_PRECS)}"
    )
MM_PRECISION = _MM_PRECS[_mm_prec_name]

# Grad-slab storage dtype (A/B knob, VERDICT r3 weak #7).  The dsum
# gathers that consume the slab are latency/byte-bound (bf16 measured
# 2.2x faster per access in isolation); bf16 quantizes each per-slot
# gradient contribution to 8 mantissa bits BEFORE the D-slot sum, which
# is outside the default backend-parity tolerances — measurement knob
# only, f32 stays the default.
_grad_slab = os.environ.get("GD_GRAD_SLAB", "f32")
if _grad_slab not in ("f32", "bf16"):
    raise ValueError(f"GD_GRAD_SLAB={_grad_slab!r}: expected f32 or bf16")
GRAD_SLAB_DTYPE = jnp.bfloat16 if _grad_slab == "bf16" else jnp.float32
CHUNK = 128   # slots per DMA chunk; also the lane-alignment quantum
NPIX = 1024   # 32x32 tile (the surfel kernels' fixed tile; the 3DGS
              # kernels below are parametric over ts in {16, 32} — 16px
              # tiles quarter the per-pair pixel work for ~1.5x the pairs,
              # a large net win when splats are small)

# slab row indices (attribute-major layout)
_X, _Y, _A, _B, _C, _OPA, _R, _G, _BL, _DEP, _VAL = range(11)


def _pixel_rows(t, tiles_x: int, ts: int):
    """(1, ts*ts) f32 *tile-local* pixel coordinates + tile origin.

    Local coordinates keep the quadratic-form matmul terms small (|v| < 32)
    so the f32 cancellation at the Gaussian center stays ~1e-6 — with
    global 512-px coordinates the power(center)=0 identity cancels terms of
    magnitude ~1e4 and borderline pixels flip the power<=0 cull.
    """
    ox = (t % tiles_x) * ts
    oy = (t // tiles_x) * ts
    p = jax.lax.broadcasted_iota(jnp.int32, (1, ts * ts), 1)
    X = (p % ts).astype(jnp.float32)
    Y = (p // ts).astype(jnp.float32)
    return X, Y, ox.astype(jnp.float32), oy.astype(jnp.float32)


def _basis8(X, Y):
    return jnp.concatenate(
        [X * X, Y * Y, X * Y, X, Y, jnp.ones_like(X), jnp.zeros_like(X),
         jnp.zeros_like(X)],
        axis=0,
    )  # (8, NPIX)


def _alpha_matrix(A, AT, offset, count, basis8, ox, oy):
    """alpha (CHUNK, NPIX) for one slab chunk.

    A: (SLAB_W, CHUNK) attribute rows; AT: (CHUNK, SLAB_W).
    ox/oy: tile origin (coordinates are tile-local).
    ``offset`` is the signed position of the chunk's first row within the
    tile's live span: row r is live iff 0 <= offset + r < count (chunks
    start at the aligned-down slab offset, so the first chunk's head rows
    belong to the previous tile and are masked off).
    """
    a_r = A[_A:_A + 1]
    b_r = A[_B:_B + 1]
    c_r = A[_C:_C + 1]
    x_r = A[_X:_X + 1] - ox
    y_r = A[_Y:_Y + 1] - oy
    zeros_r = jnp.zeros_like(a_r)
    coefs = jnp.concatenate(
        [
            -0.5 * a_r,
            -0.5 * c_r,
            -b_r,
            a_r * x_r + b_r * y_r,
            c_r * y_r + b_r * x_r,
            -0.5 * (a_r * x_r * x_r + 2.0 * b_r * x_r * y_r + c_r * y_r * y_r),
            zeros_r,
            zeros_r,
        ],
        axis=0,
    )  # (8, CHUNK)
    power = jax.lax.dot_general(
        coefs.T, basis8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=MM_PRECISION,
    )  # (CHUNK, NPIX)

    # Row-liveness (chunk-boundary head/tail) and validity are PER-ROW
    # facts: fold both into the opacity COLUMN instead of building full
    # (CHUNK, NPIX) masks (iota + 2 cmps + 2 ands + select = ~6 full-shape
    # VPU passes; the kernels are VPU-pass-bound).  Masked rows get opa 0
    # -> alpha 0 -> culled by the alpha >= ALPHA_MIN select, bit-identical
    # to the old full-shape gating.  The iota is (CHUNK, SLAB_W) because
    # (CHUNK, 1) iotas mis-lower on TPU.
    pos16 = offset + jax.lax.broadcasted_iota(jnp.int32, AT.shape, 0)
    masked = jnp.where((pos16 >= 0) & (pos16 < count), AT, 0.0)
    opa_m = jnp.where(
        masked[:, _VAL:_VAL + 1] > 0.0, masked[:, _OPA:_OPA + 1], 0.0
    )  # (CHUNK, 1)

    # power = -quadratic_form <= 0 mathematically (PSD conic); positives are
    # pure rounding noise from the matmul form, so clamp instead of the
    # reference's strict power>0 cull (which only ever fires on noise).
    power = jnp.minimum(power, 0.0)
    alpha = jnp.minimum(ALPHA_MAX, opa_m * jnp.exp(power))
    return jnp.where(alpha >= ALPHA_MIN, alpha, 0.0)


def _color_lhs(A):
    """(8, CHUNK) rows [r, g, b, depth, 1, 0, 0, 0].

    The ones row makes the forward's accumulation matmul also produce
    Σ_k W_k per pixel for free.  W_k = a_k·T_exc_k·inc_k telescopes
    (a·T_exc = T_exc - T_exc·(1-a), and ``inc`` is a per-pixel step
    function since U is monotone decreasing), so Σ W = 1 - T_eff exactly —
    replacing the forward's separate per-chunk log1p/exp T_eff chain.
    The backward's ``contrib`` matmul shares this lhs; its gc4 row 4 is
    zero, so the ones row contributes nothing there."""
    ones = jnp.ones((1, A.shape[1]), jnp.float32)
    return jnp.concatenate(
        [A[_R:_R + 1], A[_G:_G + 1], A[_BL:_BL + 1], A[_DEP:_DEP + 1],
         ones, jnp.zeros((3, A.shape[1]), jnp.float32)],
        axis=0,
    )


def _tril(n, strict):
    """(n, n) f32 lower-triangular mask (strict or inclusive), for
    running a CHUNK-axis scan as one triangular matmul (``_mm``).

    MEASURED: at the 3DGS kernels' (CHUNK, 256) chunk shapes the matmul
    scan is a REGRESSION (24.4 -> 27.0ms/render: the MXU op forces
    operand relayouts that cost more than the ladder's VPU passes), and
    the surfel kernels' (CHUNK, 1024) HIGHEST-precision variants were the
    dominant term of their 48ms backward — both now use the shift
    ladders; kept only for ``_transmittance``'s optional Ls form."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((j < i) if strict else (j <= i)).astype(jnp.float32)


def _mm(L, x):
    return jax.lax.dot_general(
        L, x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# rows per block of the two-level inclusive scans (0 = flat ladder).
# HYPOTHESIS TESTED AND REJECTED (v5e, 512²/131k, 2026-08-19): a
# two-level block scan "should" cut the flat 7-step Hillis-Steele
# ladder's full-data passes — measured: B=8 51.2 r/s vs flat 51.9 (wash),
# B=4 33.9 (the (nb, 4, npix) mid-dim pads to 8 sublanes and every shift
# moves 2x its logical bytes).  Mosaic evidently folds the ladder's
# shift+op pairs well enough that the extra reshape/boundary traffic
# only adds cost.  Flat stays the default; the knob remains for re-A/Bs.
SCAN_BLOCK = int(os.environ.get("GD_SCAN_BLOCK", "0"))


def _scan0_blocked(x, op, ident, block):
    """Inclusive scan over axis 0 via a two-level block decomposition."""
    n, m = x.shape
    nb = n // block
    x3 = x.reshape(nb, block, m)
    sh = 1
    while sh < block:  # local scans, all blocks lane-parallel
        x3 = op(
            x3,
            jnp.concatenate(
                [jnp.full((nb, sh, m), ident, x.dtype), x3[:, :-sh]], axis=1
            ),
        )
        sh *= 2
    # exclusive scan of the block totals (1/block of the data); all
    # slice-form indexing — integer indexes (squeezes) lower to Mosaic's
    # unimplemented dynamic_slice
    carry = jnp.concatenate(
        [jnp.full((1, 1, m), ident, x.dtype), x3[:-1, -1:, :]], axis=0
    )
    sh = 1
    while sh < nb:
        carry = op(
            carry,
            jnp.concatenate(
                [jnp.full((sh, 1, m), ident, x.dtype), carry[:-sh]], axis=0
            ),
        )
        sh *= 2
    return op(x3, carry).reshape(n, m)


def _scan0(x, op, ident):
    n = x.shape[0]
    if SCAN_BLOCK and n % SCAN_BLOCK == 0 and n > SCAN_BLOCK:
        return _scan0_blocked(x, op, ident, SCAN_BLOCK)
    sh = 1
    while sh < n:
        x = op(
            x,
            jnp.concatenate(
                [jnp.full((sh, x.shape[1]), ident, x.dtype), x[:-sh]], axis=0
            ),
        )
        sh *= 2
    return x


def _cumsum0(x):
    """Inclusive cumsum over axis 0 (CHUNK) as a shift-add scan tree —
    exact-association-free f32, no serial dependency chain of length
    CHUNK (the unrolled row-by-row loop costs ~6k cycles/chunk)."""
    return _scan0(x, jnp.add, 0.0)


def _cumprod0_excl(x):
    """Exclusive cumprod over axis 0 as a shift-MULTIPLY scan tree.

    Same tree as ``_cumsum0`` with (*, 1) instead of (+, 0).  Matches the
    XLA path's ``jnp.cumprod`` semantics directly — no log/exp round trip
    (the earlier log-space form cost two transcendentals per chunk).
    Underflow of long products flushes toward 0, which only ever makes
    T_exc cross T_EPS a slot early at T ~ 1e-38."""
    n = x.shape[0]
    # shift down by one row for the exclusive form
    x = jnp.concatenate([jnp.ones((1, x.shape[1]), x.dtype), x[:-1]], axis=0)
    return _scan0(x, jnp.multiply, 1.0)


def _transmittance(alpha, T_raw, Ls=None):
    """Front-to-back transmittance quantities for one chunk.

    Serial semantics (bit-compatible up to f32 product-tree rounding):
      T_exc_k = T_raw * prod_{j<k} (1 - a_j)
      U_k = T_exc_k (1 - a_k);  inc_k = U_k >= T_EPS
      W_k = a_k T_exc_k inc_k
    Returns (W, T_exc, inc_bool, T_raw_out, U) with T_raw_out = T_raw *
    prod(1-a).  ``inc_bool`` is the boolean include mask — consumers gate
    with one ``where`` instead of a float cast + multiply (saves a VPU
    pass per use; select-by-mask is bit-identical to *1.0/*0.0).  ``U``
    (the inclusive transmittance) is returned because it already exists
    inside the ladder — the surfel kernels' median-depth crossing test
    would otherwise recompute it (2 full-shape passes).

    ``Ls=None`` (the 3DGS kernels): shift-multiply ladder.  With a strict
    lower-tri ``Ls``: exp(Ls @ log1p(-alpha)) on the MXU (see ``_tril``).
    """
    om = 1.0 - alpha
    if Ls is None:
        P_exc = _cumprod0_excl(om)
    else:
        P_exc = jnp.exp(_mm(Ls, jnp.log1p(-alpha)))
    T_exc = T_raw * P_exc
    U = T_exc * om
    inc = U >= T_EPS
    W = jnp.where(inc, alpha * T_exc, 0.0)
    T_raw_out = U[-1:]
    return W, T_exc, inc, T_raw_out, U


def _fwd_kernel(
    starts_ref, counts_ref, slab_hbm,
    c4_out,
    buf, sem,
    *, tiles_x: int, ts: int,
):
    npix = ts * ts
    t = pl.program_id(0)
    start = starts_ref[t]                 # sorted-order start (unaligned)
    head = jax.lax.rem(start, CHUNK)
    base = start - head                   # aligned-down DMA origin
    count = counts_ref[t]
    X, Y, ox, oy = _pixel_rows(t, tiles_x, ts)
    basis8 = _basis8(X, Y)
    n_chunks = pl.cdiv(head + count, CHUNK)

    def dma(slot, c):
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        boff = pl.multiple_of(slot * SLAB_W, SLAB_W)
        return pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[pl.ds(boff, SLAB_W)],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    ones_row = jnp.ones((1, npix), jnp.float32)

    def chunk_body(state):
        c, T_raw, C4 = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(c % 2, c).wait()
        boff = pl.multiple_of((c % 2) * SLAB_W, SLAB_W)
        A = buf[pl.ds(boff, SLAB_W)]             # (SLAB_W, CHUNK)
        AT = A.T
        alpha = _alpha_matrix(A, AT, c * CHUNK - head, count, basis8, ox, oy)

        W, T_exc, inc, T_raw, _ = _transmittance(alpha, T_raw)

        C4 = C4 + jax.lax.dot_general(
            _color_lhs(A), W,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=MM_PRECISION,
        )  # (8, npix): rows r, g, b, depth, Σ W (= 1 - T_eff, see
        #    _color_lhs — the separate per-chunk log1p/exp T_eff chain
        #    telescopes away)
        return (c + 1, T_raw, C4)

    def cond(state):
        c, T_raw = state[0], state[1]
        return (c < n_chunks) & (jnp.max(T_raw) >= T_EPS)

    c, T_raw, C4 = jax.lax.while_loop(
        cond, chunk_body,
        (0, ones_row, jnp.zeros((8, npix), jnp.float32)),
    )

    @pl.when(c < n_chunks)
    def _():
        dma(c % 2, c).wait()

    c4_out[0] = C4


def pallas_composite_fwd(slab, tile_starts, tile_counts, tiles_x, tiles_y,
                         tile_size: int = 32):
    """slab (SLAB_W, P_pad) attribute-major SORTED-order table -> pixel maps.

    ``tile_starts`` are the (unaligned) sorted-order segment starts; each
    tile DMAs from the aligned-down offset and masks the head rows, so no
    aligned re-gather of the slab is ever materialized (a 1M-slot gather
    costs ~6.5ms on XLA whatever the layout).
    Returns (Cr, Cg, Cb, alpha, depth, T_eff), each (num_tiles, npix).
    """
    assert tile_size in (16, 32), "pallas path supports 16/32px tiles"
    npix = tile_size * tile_size
    num_tiles = tiles_x * tiles_y
    slab_t = slab  # (SLAB_W, P_pad) attribute-major, CHUNK-overrun padded

    out_shape = jax.ShapeDtypeStruct((num_tiles, 8, npix), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, npix), lambda t, *p: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * SLAB_W, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, tiles_x=tiles_x, ts=tile_size)
    C4 = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(tile_starts, tile_counts, slab_t)
    wsum = C4[:, 4]                       # Σ W = 1 - T_eff (see _color_lhs)
    return (
        C4[:, 0], C4[:, 1], C4[:, 2],
        wsum, C4[:, 3], 1.0 - wsum,
    )


TBLK = 512  # transpose-kernel block (M is rounded up to a multiple)


def _transpose_cols_kernel(cols_ref, rows_ref):
    # exact transpose via identity matmul (HIGHEST = true f32 passes; the
    # default bf16 pass loses ~8 bits)
    rows_ref[:, :] = jax.lax.dot_general(
        cols_ref[:, :], jnp.eye(cols_ref.shape[0], dtype=jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def pallas_transpose16(cols):
    """(w, M) -> (M, w) with a *pinned* row-major output layout (w is the
    slab width: 16 for the 3DGS slab, 32 for the surfel slab).

    Used wherever an attribute-major Pallas product meets a row-form
    consumer: a plain ``.T`` lets XLA sink the transposed layout into
    whichever gather/scatter sits next to it (strided access, ~5-7ms at
    1M slots); a Pallas boundary forces default layouts on both sides and
    costs ~0.7ms of pure bandwidth at 1M rows."""
    w, M = cols.shape
    assert M % TBLK == 0, M
    return pl.pallas_call(
        _transpose_cols_kernel,
        out_shape=jax.ShapeDtypeStruct((M, w), jnp.float32),
        grid=(M // TBLK,),
        in_specs=[pl.BlockSpec((w, TBLK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((TBLK, w), lambda i: (i, 0)),
        interpret=_interpret(),
    )(cols)


RED_BN = 128  # gaussians per slot-reduce block


def _reduce_slots_kernel(rows_ref, out_ref, *, d):
    x = rows_ref[:, :]                        # (RED_BN*d, width)
    bn = out_ref.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (bn, x.shape[0]), 1)
    i = jax.lax.broadcasted_iota(jnp.int32, (bn, x.shape[0]), 0)
    sel = (j // d == i).astype(jnp.float32)   # (bn, bn*d) group selector
    out_ref[:, :] = jax.lax.dot_general(
        sel, x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def pallas_reduce_slots(rows, n: int, d: int, width: int = SLAB_W):
    """Sum groups of ``d`` consecutive rows: (n*d, width) -> (n, width).

    The (N, D) slot-expansion reduce of the rasterizer backward, done as a
    selector matmul on the MXU.  Like ``pallas_transpose16`` this exists to
    PIN the layout of the gather feeding it: XLA's layout assignment
    otherwise rewrites gather + reduce chains into column-major strided
    forms (~6.5ms at 1M slots; this whole path is ~2ms)."""
    assert rows.shape == (n * d, width)
    assert n % RED_BN == 0, n
    kernel = functools.partial(_reduce_slots_kernel, d=d)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, width), jnp.float32),
        grid=(n // RED_BN,),
        in_specs=[pl.BlockSpec((RED_BN * d, width), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((RED_BN, width), lambda i: (i, 0)),
        interpret=_interpret(),
    )(rows)


def _bwd_kernel(
    starts_ref, counts_ref, astarts_ref, slab_hbm,
    gc4_in, G_in,
    zeros_in, grad_hbm,
    buf, gbuf, sem, gsem,
    *, tiles_x: int, ts: int, mode: str,
):
    npix = ts * ts
    t = pl.program_id(0)
    start = starts_ref[t]                 # sorted-order start (unaligned)
    head = jax.lax.rem(start, CHUNK)
    base = start - head
    astart = pl.multiple_of(astarts_ref[t], CHUNK)
    count = counts_ref[t]
    X, Y, ox, oy = _pixel_rows(t, tiles_x, ts)
    basis8 = _basis8(X, Y)
    n_chunks = pl.cdiv(head + count, CHUNK)

    gC4 = gc4_in[0]          # (8, npix): rows gCr, gCg, gCb, gD, 0...
    G = G_in[0]              # (1, npix) — gTf pre-folded in (G2 = G + gTf)

    def dma_in(slot, c):
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        boff = pl.multiple_of(slot * SLAB_W, SLAB_W)
        return pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[pl.ds(boff, SLAB_W)],
            sem.at[slot],
        )

    # write-back row count must honor the (8, 128) HBM tiling: Mosaic
    # rejects 10/12-row memref slices, so the only narrower option than
    # the full 16 would be 8 rows — too few for the 10 live channels
    rw = SLAB_W

    def dma_out(slot, c):
        off = pl.multiple_of(astart + c * CHUNK, CHUNK)
        boff = pl.multiple_of(slot * SLAB_W, SLAB_W)
        return pltpu.make_async_copy(
            gbuf.at[pl.ds(boff, rw)],
            grad_hbm.at[pl.ds(0, rw), pl.ds(off, CHUNK)],
            gsem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()

    ones_row = jnp.ones((1, npix), jnp.float32)
    zeros_row = jnp.zeros((1, npix), jnp.float32)

    def chunk_body(state):
        c, T_raw, prefix = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma_in((c + 1) % 2, c + 1).start()

        dma_in(c % 2, c).wait()
        boff = pl.multiple_of((c % 2) * SLAB_W, SLAB_W)
        A = buf[pl.ds(boff, SLAB_W)]
        AT = A.T
        alpha = _alpha_matrix(A, AT, c * CHUNK - head, count, basis8, ox, oy)

        # per-pixel contribution term (gC·c_k + gD·z_k)(px): MXU
        contrib = jax.lax.dot_general(
            _color_lhs(A).T, gC4,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=MM_PRECISION,
        )  # (CHUNK, NPIX)

        W, T_exc, inc, T_raw, _ = _transmittance(alpha, T_raw)
        pref = prefix + _cumsum0(contrib * W)     # inclusive prefix rows
        prefix = pref[-1:]

        suffix = G - pref                         # gTf rides in G (G2)
        inv_1ma = _recip(jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX))
        # gate with the transmittance inc mask directly: inc=1 implies
        # T_exc >= T_EPS > 0, so where(inc, ·) equals the old Tinc>0
        # float-mask gating bit-exactly without recomputing a mask
        Tinc = jnp.where(inc, T_exc, 0.0)
        g_alpha = jnp.where(inc, contrib * Tinc - suffix * inv_1ma, 0.0)

        g_power = jnp.where(alpha < ALPHA_MAX, g_alpha * alpha, 0.0)

        a_c = AT[:, _A:_A + 1]
        b_c = AT[:, _B:_B + 1]
        c_c = AT[:, _C:_C + 1]
        x_c = AT[:, _X:_X + 1] - ox
        y_c = AT[:, _Y:_Y + 1] - oy
        opa_c = AT[:, _OPA:_OPA + 1]

        # NOTE: expressing these reductions as MXU moment matmuls
        # (g_power @ momentsᵀ, W @ gC4ᵀ) was measured SLOWER at both tile
        # sizes (+3ms/render at ts=32: contracting the npix lane dim
        # forces operand relayouts); plain VPU lane reductions win here.
        rsum = lambda v: jnp.sum(v, axis=1, keepdims=True)   # (CHUNK, 1)
        zcols = lambda k: jnp.zeros((CHUNK, k), jnp.float32)
        color_rows = lambda: [
            rsum(W * gC4[0:1]), rsum(W * gC4[1:2]),
            rsum(W * gC4[2:3]), rsum(W * gC4[3:4]),
        ]
        if mode == "noabs":
            # VPU raw moments of g_power against the pixel monomials; the
            # xy/conic/opacity rows are all linear in the six CENTRAL
            # moments, recovered by per-column shifts (free (CHUNK, 1)
            # math).  6 fewer full-shape passes than the dx/dy product
            # form — only available without the AbsGS rows, whose |·|
            # breaks the linearity.  Central-moment reconstruction
            # cancels terms of magnitude ~X²·Σg, costing ~2 decimal
            # digits of the row's own scale (within parity tolerances).
            gX = g_power * X
            gY = g_power * Y
            m0 = rsum(g_power)
            m1 = rsum(gX)
            m2 = rsum(gY)
            m3 = rsum(gX * X)
            m4 = rsum(gX * Y)
            m5 = rsum(gY * Y)
            s1 = m1 - x_c * m0                      # Σ g·dx
            s2 = m2 - y_c * m0                      # Σ g·dy
            sxx = m3 - x_c * (m1 + s1)              # Σ g·dx²
            sxy = m4 - x_c * m2 - y_c * s1          # Σ g·dx·dy
            syy = m5 - y_c * (m2 + s2)              # Σ g·dy²
            gradT = jnp.concatenate(
                [
                    a_c * s1 + b_c * s2,
                    c_c * s2 + b_c * s1,
                    -0.5 * sxx,
                    -sxy,
                    -0.5 * syy,
                    m0 / jnp.maximum(opa_c, 1e-12),
                    *color_rows(),
                    zcols(SLAB_W - 10),
                ],
                axis=1,
            )  # (CHUNK, SLAB_W)
        else:
            # shared products: the screen-xy grads and the three conic
            # moment sums all derive from g_power·dx and g_power·dy
            # (constant scales fold into the post-reduction columns)
            dx = X - x_c
            dy = Y - y_c
            t1 = g_power * dx
            t2 = g_power * dy
            gx_px = a_c * t1 + b_c * t2
            gy_px = c_c * t2 + b_c * t1
            abs_rows = [rsum(jnp.abs(gx_px)), rsum(jnp.abs(gy_px))]
            if mode == "selonly":
                # AbsGS selection pass (composite._fwd_sel_impl): ONLY
                # the |d/dx|, |d/dy| rows are consumed — skip the other
                # ten reductions and their product inputs
                gradT = jnp.concatenate(
                    [zcols(10), *abs_rows, zcols(SLAB_W - 12)], axis=1
                )
            else:
                gradT = jnp.concatenate(
                    [
                        rsum(gx_px),
                        rsum(gy_px),
                        -0.5 * rsum(t1 * dx),
                        -rsum(t1 * dy),
                        -0.5 * rsum(t2 * dy),
                        rsum(g_power) / jnp.maximum(opa_c, 1e-12),
                        *color_rows(),
                        *abs_rows,
                        zcols(SLAB_W - 12),
                    ],
                    axis=1,
                )  # (CHUNK, SLAB_W)
        # grads leave attribute-major (16, M) like the input slab; the
        # consumer inverts the binning sort with an axis-1 gather (compact
        # layouts end to end — row-major variants force either a strided
        # scatter or a 16-lane Mosaic slice, both measured dead ends)
        # grads land in this tile's DISJOINT aligned segment (the slab is
        # read overlapping at chunk granularity, so writing back in slab
        # coordinates would collide at tile boundaries).  The writeback is
        # double-buffered: wait for the slot's previous DMA (chunk c-2),
        # write, start — overlapping the copy with the next chunk's
        # compute instead of stalling every iteration.
        slot = jax.lax.rem(c, 2)

        @pl.when(c >= 2)
        def _():
            dma_out(slot, c - 2).wait()

        boffg = pl.multiple_of(slot * SLAB_W, SLAB_W)
        gbuf[pl.ds(boffg, rw), :] = gradT.T[:rw].astype(GRAD_SLAB_DTYPE)
        dma_out(slot, c).start()
        return (c + 1, T_raw, prefix)

    def cond(state):
        c, T_raw = state[0], state[1]
        return (c < n_chunks) & (jnp.max(T_raw) >= T_EPS)

    c, _, _ = jax.lax.while_loop(cond, chunk_body, (0, ones_row, zeros_row))

    @pl.when(c < n_chunks)
    def _():
        dma_in(c % 2, c).wait()

    # drain the last (up to two) outstanding grad write-backs
    @pl.when(c >= 2)
    def _():
        dma_out(jax.lax.rem(c - 2, 2), c - 2).wait()

    @pl.when(c >= 1)
    def _():
        dma_out(jax.lax.rem(c - 1, 2), c - 1).wait()


def pallas_composite_bwd(
    slab, tile_starts, tile_counts, astarts, m_out, gc_tiled,
    gD_tiled, G2_tiled, tiles_x, tiles_y, tile_size: int = 32,
    mode: str = "full",
):
    """Backward: per-slot gradient slab, attribute-major (SLAB_W, P_pad).

    Columns mirror the input slab; [_VAL], [_VAL+1] carry the AbsGS
    |d/dx|, |d/dy| accumulations.  Slots past a tile's early-termination
    point keep zeros (the grad output is aliased to a zero buffer).
    ``G2_tiled`` is the per-pixel total G with the dL/dT_fin term (gA and
    the bg·gC row) pre-folded in by the caller (``_bwd_common``).
    ``mode``: "full" | "noabs" (skip the AbsGS rows) | "selonly" (ONLY
    the AbsGS rows — the fused-selection pass).
    """
    assert tile_size in (16, 32)
    assert mode in ("full", "noabs", "selonly"), mode
    npix = tile_size * tile_size
    num_tiles = tiles_x * tiles_y
    slab_t = slab  # (SLAB_W, P_pad) attribute-major sorted-order table
    zeros_grad = jnp.zeros((SLAB_W, m_out), GRAD_SLAB_DTYPE)

    gc4 = jnp.concatenate(
        [
            gc_tiled[..., 0][:, None], gc_tiled[..., 1][:, None],
            gc_tiled[..., 2][:, None], gD_tiled[:, None],
            jnp.zeros((num_tiles, 4, npix), jnp.float32),
        ],
        axis=1,
    )  # (num_tiles, 8, npix)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 8, npix), lambda t, *p: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npix), lambda t, *p: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2 * SLAB_W, CHUNK), jnp.float32),
            pltpu.VMEM((2 * SLAB_W, CHUNK), GRAD_SLAB_DTYPE),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, ts=tile_size, mode=mode
    )
    grad_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SLAB_W, m_out), GRAD_SLAB_DTYPE),
        grid_spec=grid_spec,
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(
        tile_starts, tile_counts, astarts, slab_t,
        gc4,
        G2_tiled.reshape(num_tiles, 1, npix),
        zeros_grad,
    )
    return grad_t
