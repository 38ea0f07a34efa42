"""Pallas TPU kernels for the 2DGS surfel rasterizer.

Same architecture as the 3DGS kernels (``pallas_kernels.py``): per-tile
grid programs with dynamic trip counts via scalar prefetch, double-buffered
DMA of an attribute-major (32, P) sorted-order table from aligned-down
offsets with head-row masking, log-space transmittance ladder, early
termination — plus the surfel-specific math:

  * ray-plane intersection: cr(X, Y) = acr + X·bcr + Y·ccr (affine — see
    ``surfel.py``), u = cr_x/cr_z, v = cr_y/cr_z, z_hit = det/cr_z,
  * power = max(-0.5(u² + v²), -0.5((X-cx)² + (Y-cy)²)/VAR) (object-space
    vs screen-space low-pass blend),
  * extra accumulators: alpha-weighted normals, expected depth, median
    depth (T=0.5 crossing), and the 2DGS distortion
    dist = Σ_k w_k Σ_{j<k} w_j (m_k - m_j)², m = mapped depth.

Backward is hand-written front-to-back (no reverse traversal).  The
distortion is kept in CLOSED FORM (round 3): the pairwise sum
telescopes to moments,

  dist = Σ_{j<k} w_j w_k (m_j - m_k)² = Wtot·M2tot - M1tot²

with (Wtot, M1tot, M2tot) = Σ w·(1, m, m²), so the forward needs no
per-slot prefix ladders — only the three moment row-sums it already
accumulates.  The per-slot gradients enjoy the same cancellation: the
prefix/suffix self-exclusion terms of the front-to-back form cancel
algebraically (expand d_i + S-terms and watch the ±w_i m_i² pairs
annihilate), leaving

  ∂dist/∂w_i = M2tot + m_i² Wtot - 2 m_i M1tot
  ∂dist/∂m_i = 2 w_i (m_i Wtot - M1tot)

which are pure per-slot functions of the TOTALS — the round-2 kernels'
wm/wm² cumsum ladders and suffix-moment algebra (≈30 full-shape VPU
passes per chunk in the backward, ≈20 in the forward) are deleted,
bit-exactly in infinite precision and inside the parity-test tolerance
band in f32.  The suffix-trick total keeps its factor two:
  G = gC·C + gN·N + gDexp·Dexp + 2·gdist·dist
because Σ_k w_k ∂dist/∂w_k = 2·dist.  Median-depth cotangents flow
through the crossing slot's z_hit exactly like the XLA autodiff path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (
    CHUNK,
    T_EPS,
    _cumsum0,
    _interpret,
    _recip,
    _transmittance,
)

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
NEAR_CULL = 0.2
FILTER_2D_VAR = 2.0
SLAB_W2 = 32

# slab row indices (attribute-major)
(_AX, _AY, _AZ, _BX, _BY, _BZ, _CX, _CY, _CZ, _DET,
 _PX, _PY, _OPA, _R, _G, _BL, _NX, _NY, _NZ, _RAD) = range(20)
N_ATTR = 20


def _pix_rows(t, tiles_x: int, ts: int):
    ox = (t % tiles_x) * ts
    oy = (t // tiles_x) * ts
    p = jax.lax.broadcasted_iota(jnp.int32, (1, ts * ts), 1)
    Xl = (p % ts).astype(jnp.float32)
    Yl = (p // ts).astype(jnp.float32)
    return Xl, Yl, ox.astype(jnp.float32), oy.astype(jnp.float32)


def _chunk_geometry(AT, Xl, Yl, ox, oy, offset, count, znear, zfar,
                    depth: bool = True, bwd: bool = False):
    """Shared fwd/bwd per-chunk geometry.

    Returns (alpha, sel3 (g3d branch mask), crx, cry, rz, zhit, m, dmdz,
    dxl, dyl).  ``sel3`` is gated by ``bwd``, ``m`` by ``depth`` and
    ``dmdz`` by both (None when gated) — the forward never consumes
    dmdz/sel3 and the selection backward consumes neither depth
    quantity; the kernels are full-shape-VPU-pass bound (PERF.md), so
    every gated quantity is a pass saved.
    AT: (CHUNK, SLAB_W2) chunk attributes.

    Round-3 op diet (each bit-exact vs the round-2 form):
      * row-liveness folded into the opacity COLUMN instead of a
        (CHUNK, NPIX) mask (3DGS ``_alpha_matrix`` rationale),
      * the power <= 0 cull dropped: g3d and g2d are -0.5·(sums of
        squares), <= 0 by f32 construction — the test never fired,
      * g2d's /FILTER_2D_VAR folded into the -0.5 constant (both are
        powers of two),
      * the circular truncation reuses g2d's d² (one extra cmp).
    """
    col = lambda i: AT[:, i:i + 1]
    # shift the affine constant to tile-local pixel coordinates
    ax_t = col(_AX) + ox * col(_BX) + oy * col(_CX)
    ay_t = col(_AY) + ox * col(_BY) + oy * col(_CY)
    az_t = col(_AZ) + ox * col(_BZ) + oy * col(_CZ)
    crx = ax_t + col(_BX) * Xl + col(_CX) * Yl      # (CHUNK, NPIX)
    cry = ay_t + col(_BY) * Xl + col(_CY) * Yl
    crz = az_t + col(_BZ) * Xl + col(_CZ) * Yl
    safe = jnp.where(jnp.abs(crz) < 1e-8, 1e-8, crz)
    rz = 1.0 / safe
    u = crx * rz
    v = cry * rz
    g3d = -0.5 * (u * u + v * v)
    dxl = Xl - (col(_PX) - ox)
    dyl = Yl - (col(_PY) - oy)
    d2 = dxl * dxl + dyl * dyl
    g2d = (-0.5 / FILTER_2D_VAR) * d2
    sel3 = (g3d >= g2d).astype(jnp.float32) if bwd else None
    power = jnp.maximum(g3d, g2d)
    zhit = col(_DET) * rz

    # liveness (chunk head/tail rows) is a PER-ROW fact: mask the opacity
    # column, not the full matrix.  The iota is (CHUNK, SLAB_W2)-shaped
    # because (CHUNK, 1) iotas mis-lower on TPU.
    pos = offset + jax.lax.broadcasted_iota(jnp.int32, AT.shape, 0)
    live_c = (pos[:, :1] >= 0) & (pos[:, :1] < count)   # (CHUNK, 1)
    opa_c = jnp.where(live_c, col(_OPA), 0.0)
    alpha = jnp.minimum(ALPHA_MAX, opa_c * jnp.exp(power))
    # hard circular truncation at the screen radius (row _RAD) — makes the
    # binning's circle cull output-exact (see surfel.rasterize_surfels)
    rcut = col(_RAD)
    ok = (alpha >= ALPHA_MIN) & (zhit > NEAR_CULL) & (d2 <= rcut * rcut)
    # LOAD-BEARING: this where-based masking (NaN compares false in `ok`,
    # so NaN/Inf alpha lands on the 0.0 branch) is what keeps the pad
    # columns safe — the slab's safety padding and the chunk head rows
    # REPLICATE surfel 0's attributes (see _gather_sorted_slab), whose
    # degenerate values can make `opa_c * exp(power)` NaN before this
    # point.  Do not refactor into multiplicative masking
    # (`alpha * ok.astype(...)`): NaN * 0 = NaN would leak pad-column
    # garbage into live pixels.
    alpha = jnp.where(ok, alpha, 0.0)

    if not depth:
        return alpha, sel3, crx, cry, rz, zhit, None, None, dxl, dyl
    F = zfar / (zfar - znear)
    # 1/zhit = safe/det: one per-surfel reciprocal instead of two full
    # (CHUNK, NPIX) divisions (znear/zc and the dmdz quotient)
    det_c = col(_DET)
    det_safe = jnp.where(jnp.abs(det_c) < 1e-12, 1.0, det_c)
    rdet = jnp.where(jnp.abs(det_c) < 1e-12, 0.0, 1.0 / det_safe)
    inv_zc = jnp.where(zhit > 1e-6, safe * rdet, 1e6)  # = 1/max(zhit, 1e-6)
    m = F * (1.0 - znear * inv_zc)
    dmdz = (
        jnp.where(zhit > 1e-6, F * znear * inv_zc * inv_zc, 0.0)
        if bwd else None
    )
    return alpha, sel3, crx, cry, rz, zhit, m, dmdz, dxl, dyl


def _acc_lhs(A, with_ones=False):
    """(8, CHUNK) rows [r, g, b, nx, ny, nz, 1?, 0].

    The forward passes ``with_ones=True``: row 6 accumulates Σ_k W_k per
    pixel for free in the same matmul, and ΣW telescopes to 1 - T_eff
    exactly (see pallas_kernels._color_lhs) — deleting the forward's
    separate per-chunk log1p/exp T_eff chain.  The backward's ``base_cw``
    matmul keeps row 6 zero (its cotangent row is zero anyway)."""
    filler = (
        jnp.ones((1, A.shape[1]), jnp.float32) if with_ones
        else jnp.zeros((1, A.shape[1]), jnp.float32)
    )
    return jnp.concatenate(
        [A[_R:_R + 1], A[_G:_G + 1], A[_BL:_BL + 1],
         A[_NX:_NX + 1], A[_NY:_NY + 1], A[_NZ:_NZ + 1],
         filler, jnp.zeros((1, A.shape[1]), jnp.float32)],
        axis=0,
    )


def _fwd_kernel(
    starts_ref, counts_ref, scal_ref, slab_hbm,
    c8_out, ex_out,
    buf, sem,
    *, tiles_x: int, ts: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    head = jax.lax.rem(start, CHUNK)
    base = start - head
    count = counts_ref[t]
    znear = scal_ref[0]
    zfar = scal_ref[1]
    npix = ts * ts
    Xl, Yl, ox, oy = _pix_rows(t, tiles_x, ts)
    n_chunks = pl.cdiv(head + count, CHUNK)

    def dma(slot, c):
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        boff = pl.multiple_of(slot * SLAB_W2, SLAB_W2)
        return pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[pl.ds(boff, SLAB_W2)],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    ones = jnp.ones((1, npix), jnp.float32)
    zeros = jnp.zeros((1, npix), jnp.float32)

    def chunk_body(state):
        c, T_raw, C8, Dexp, Dmed, m1, m2 = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(c % 2, c).wait()
        boff = pl.multiple_of((c % 2) * SLAB_W2, SLAB_W2)
        A = buf[pl.ds(boff, SLAB_W2)]            # (SLAB_W2, CHUNK)
        AT = A.T
        alpha, _, _, _, _, zhit, m, _, _, _ = _chunk_geometry(
            AT, Xl, Yl, ox, oy, c * CHUNK - head, count, znear, zfar,
            depth=True, bwd=False,
        )

        # shift-ladder transmittance: the earlier triangular-matmul form
        # (exp(Ls @ log1p) + Li matmuls) costs HIGHEST-precision
        # (CHUNK,CHUNK)@(CHUNK,NPIX) MXU passes per chunk — measured the
        # dominant term of the 48ms bwd at 512²/131k; ~7 VPU ops here
        W, T_exc, inc, T_raw_new, U = _transmittance(alpha, T_raw)

        # distortion needs only the moment TOTALS (closed form, see
        # module docstring) — no per-slot prefix ladders
        wm = W * m
        wm2 = wm * m

        C8 = C8 + jax.lax.dot_general(
            _acc_lhs(A, with_ones=True), W,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        Dexp = Dexp + jnp.sum(W * zhit, axis=0, keepdims=True)
        m1 = m1 + jnp.sum(wm, axis=0, keepdims=True)
        m2 = m2 + jnp.sum(wm2, axis=0, keepdims=True)

        crossed = ((T_exc > 0.5) & (U < 0.5) & (alpha > 0.0)).astype(
            jnp.float32
        )
        zmed = jnp.sum(crossed * zhit, axis=0, keepdims=True)
        any_cross = jnp.sum(crossed, axis=0, keepdims=True) > 0.0
        Dmed = jnp.where((Dmed == 0.0) & any_cross, zmed, Dmed)

        return (c + 1, T_raw_new, C8, Dexp, Dmed, m1, m2)

    def cond(state):
        c, T_raw = state[0], state[1]
        return (c < n_chunks) & (jnp.max(T_raw) >= T_EPS)

    c, T_raw, C8, Dexp, Dmed, m1, m2 = jax.lax.while_loop(
        cond, chunk_body,
        (0, ones, jnp.zeros((8, npix), jnp.float32),
         zeros, zeros, zeros, zeros),
    )

    @pl.when(c < n_chunks)
    def _():
        dma(c % 2, c).wait()

    c8_out[0] = C8
    # C8 row 6 accumulated sum-W = 1 - T_eff exactly (see _acc_lhs)
    wsum = C8[6:7]
    dist = wsum * m2 - m1 * m1           # closed form (module docstring)
    ex_out[0] = jnp.concatenate(
        [wsum, Dexp, Dmed, dist, m1, m2, 1.0 - wsum, zeros], axis=0
    )


def _pack_surfel_table_t(acr, bcr, ccr, det, xy, rad, color, opacity, normal):
    """Attribute-major (SLAB_W2, N) table."""
    N = det.shape[0]
    f = lambda v: v.astype(jnp.float32)
    zero = jnp.zeros((N,), jnp.float32)
    rows = [
        f(acr[:, 0]), f(acr[:, 1]), f(acr[:, 2]),
        f(bcr[:, 0]), f(bcr[:, 1]), f(bcr[:, 2]),
        f(ccr[:, 0]), f(ccr[:, 1]), f(ccr[:, 2]),
        f(det),
        f(xy[:, 0]), f(xy[:, 1]),
        f(opacity),
        f(color[:, 0]), f(color[:, 1]), f(color[:, 2]),
        f(normal[:, 0]), f(normal[:, 1]), f(normal[:, 2]),
        f(rad),
    ]
    rows += [zero] * (SLAB_W2 - len(rows))
    return jnp.stack(rows, axis=0)


def _sorted_surfel_slab(acr, bcr, ccr, det, xy, rad, color, opacity, normal,
                        ids, depth_order, sorted_rank):
    # direct gather for small N, two-hop depth-order + piecewise-monotone
    # rank gather above it (see composite._sorted_slab for the rationale)
    from .composite import DIRECT_GATHER_MAX_N

    P = sorted_rank.shape[0]
    pad = (-P) % CHUNK + CHUNK
    table_t = _pack_surfel_table_t(
        acr, bcr, ccr, det, xy, rad, color, opacity, normal
    )
    # safety padding folded INTO the gather (pad the index vector, not
    # the output) — the separate jnp.pad materialized a second full-width
    # copy of the (32, P) slab (the 3DGS _sorted_slab rationale; pad
    # columns replicate surfel 0, zeroed by the kernels' liveness fold)
    if table_t.shape[1] <= DIRECT_GATHER_MAX_N:
        idx = jnp.pad(ids, (0, pad))
        return jnp.take(table_t, idx, axis=1, mode="clip")
    depth_t = jnp.take(table_t, depth_order, axis=1, mode="clip")
    idx = jnp.pad(sorted_rank, (0, pad))
    return jnp.take(depth_t, idx, axis=1, mode="clip")


def pallas_surfel_fwd(acr, bcr, ccr, det, xy, rad, color, opacity, normal,
                      bg, znear, zfar, bins_arrays, tiles_x, tiles_y,
                      tile_size):
    from .composite import _slab_maps, _untile

    assert tile_size in (16, 32), "pallas surfel path supports 16/32px tiles"
    npix = tile_size * tile_size
    ids, _, _, sorted_rank, depth_order, tile_starts, tile_counts = bins_arrays
    num_tiles = tiles_x * tiles_y
    slab_t = _sorted_surfel_slab(
        acr, bcr, ccr, det, xy, rad, color, opacity, normal,
        ids, depth_order, sorted_rank,
    )
    # index maps ride the residuals with the gathered slab so the backward
    # skips the aligned-layout recompute AND the (32, P) re-pack +
    # re-gather (the 3DGS path's round-3 diet item, composite._pallas_fwd)
    astarts, apos = _slab_maps(bins_arrays, num_tiles)
    scal = jnp.stack([znear.astype(jnp.float32), zfar.astype(jnp.float32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, 8, npix), lambda t, *p: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npix), lambda t, *p: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * SLAB_W2, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, tiles_x=tiles_x, ts=tile_size)
    C8, EX = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 8, npix), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, npix), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(tile_starts, tile_counts, scal, slab_t)

    ts = tile_size
    alpha_t = EX[:, 0]
    C = C8[:, 0:3].transpose(0, 2, 1)               # (T, npix, 3)
    Nacc = C8[:, 3:6].transpose(0, 2, 1)
    T_eff = EX[:, 6]
    image_t = C + T_eff[..., None] * bg[None, None, :]
    un = lambda x, ch: _untile(
        x if x.ndim == 3 else x[..., None], tiles_x, tiles_y, ts, ch
    )
    out = (
        un(image_t, 3),
        un(alpha_t, 1)[..., 0],
        un(EX[:, 1], 1)[..., 0],
        un(EX[:, 2], 1)[..., 0],
        un(Nacc, 3),
        un(EX[:, 3], 1)[..., 0],
    )
    # residuals: per-tile accumulators for the backward's suffix trick,
    # plus the slab + index maps (see above)
    res = (C, Nacc, EX[:, 1], EX[:, 3], EX[:, 4], EX[:, 5], EX[:, 6],
           astarts, apos, slab_t)
    return out, res


def _bwd_kernel(
    starts_ref, counts_ref, astarts_ref, scal_ref, slab_hbm,
    cot_in, tot_in,
    zeros_in, grad_hbm,
    buf, gbuf, sem, gsem,
    *, tiles_x: int, ts: int, mode: str = "full",
):
    t = pl.program_id(0)
    start = starts_ref[t]
    head = jax.lax.rem(start, CHUNK)
    base = start - head
    astart = pl.multiple_of(astarts_ref[t], CHUNK)
    count = counts_ref[t]
    znear = scal_ref[0]
    zfar = scal_ref[1]
    npix = ts * ts
    Xl, Yl, ox, oy = _pix_rows(t, tiles_x, ts)
    n_chunks = pl.cdiv(head + count, CHUNK)

    # cotangent rows: [gCr gCg gCb gNx gNy gNz gDexp gdist] + row block 2:
    # [G2 (gTf pre-folded), gDmed, Wtot(1-Tfin), M1tot, M2tot, 0, 0, 0]
    # ``mode``: "full" emits the 19 grad rows; "selonly" is the fused
    # AbsGS selection pass (surfel._fwd_sel_impl) whose cotangent is
    # image-only — it statically skips the depth/median/distortion
    # machinery (the wm/wm² prefix ladders, suffix moments, gm/gz/
    # crossed) and emits ONLY the two |d/dscreen| rows.
    cot = cot_in[0]            # (8, NPIX)
    aux = tot_in[0]            # (8, NPIX)
    G2 = aux[0:1]
    gDmed = aux[1:2]
    Wtot = aux[2:3]
    M1tot = aux[3:4]
    M2tot = aux[4:5]
    gdist = cot[7:8]
    gDexp = cot[6:7]

    def dma_in(slot, c):
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        boff = pl.multiple_of(slot * SLAB_W2, SLAB_W2)
        return pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[pl.ds(boff, SLAB_W2)],
            sem.at[slot],
        )

    def dma_out(slot, c):
        off = pl.multiple_of(astart + c * CHUNK, CHUNK)
        boff = pl.multiple_of(slot * SLAB_W2, SLAB_W2)
        return pltpu.make_async_copy(
            gbuf.at[pl.ds(boff, SLAB_W2)],
            grad_hbm.at[:, pl.ds(off, CHUNK)],
            gsem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()

    ones = jnp.ones((1, npix), jnp.float32)
    zeros = jnp.zeros((1, npix), jnp.float32)
    # global pixel coords for the moment rows: loop-invariant — hoisted
    # out of the chunk body (2 full-shape adds per chunk otherwise)
    Xg = Xl + ox
    Yg = Yl + oy

    def chunk_body(state):
        c, T_raw, prefix = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma_in((c + 1) % 2, c + 1).start()

        dma_in(c % 2, c).wait()
        boff = pl.multiple_of((c % 2) * SLAB_W2, SLAB_W2)
        A = buf[pl.ds(boff, SLAB_W2)]
        AT = A.T
        col = lambda i: AT[:, i:i + 1]
        alpha, sel3, crx, cry, rz, zhit, m, dmdz, dxl, dyl = _chunk_geometry(
            AT, Xl, Yl, ox, oy, c * CHUNK - head, count, znear, zfar,
            depth=(mode != "selonly"), bwd=True,
        )

        # ladders, not triangular matmuls — see _fwd_kernel rationale
        W, T_exc, inc, T_raw_new, U = _transmittance(alpha, T_raw)

        # direct dL/dw
        base_cw = jax.lax.dot_general(
            _acc_lhs(A).T, cot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (CHUNK, NPIX): gC·col + gN·nrm

        if mode == "selonly":
            # image-only cotangent: every depth/median/distortion term
            # is statically zero — cw is the color row alone and the
            # z-chain (gz) vanishes
            cw = base_cw
        else:
            # closed-form distortion grads (module docstring): pure
            # per-slot functions of the moment TOTALS — the round-2
            # prefix/suffix ladders cancelled algebraically
            cw = base_cw + gDexp * zhit + gdist * (
                M2tot + m * m * Wtot - 2.0 * m * M1tot
            )

            # dL/dm and dL/dz
            gm = 2.0 * gdist * W * (m * Wtot - M1tot)
            crossed = ((T_exc > 0.5) & (U < 0.5) & (alpha > 0.0)).astype(
                jnp.float32
            )
            gz = W * gDexp + gm * dmdz + gDmed * crossed

        # alpha chain (suffix trick; prefix accumulates cw·w; gTf rides
        # in G2 so the suffix term needs no separate add)
        pref = prefix + _cumsum0(cw * W)
        suffix = G2 - pref
        inv_1ma = _recip(jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX))
        g_alpha = jnp.where(inc, cw * T_exc - suffix * inv_1ma, 0.0)

        g_power = jnp.where(alpha < ALPHA_MAX, g_alpha * alpha, 0.0)
        g3 = g_power * sel3
        g2 = g_power - g3          # = g_power·(1-sel3), one pass cheaper

        # g3d = -0.5 (crx² + cry²) rz²; zhit = det·rz
        rz2 = rz * rz
        d_crx = -crx * rz2 * g3
        d_cry = -cry * rz2 * g3
        d_crz = (crx * crx + cry * cry) * rz2 * rz * g3
        if mode != "selonly":
            d_crz = d_crz - gz * col(_DET) * rz2
        crz_ok = (jnp.abs(1.0 / rz) > 1e-8).astype(jnp.float32)
        d_crz = d_crz * crz_ok

        rsum = lambda v: jnp.sum(v, axis=1, keepdims=True)   # (CHUNK, 1)
        zcols = lambda k: jnp.zeros((CHUNK, k), jnp.float32)
        if mode == "selonly":
            # AbsGS screen-translation rows (the image-MSE cotangent
            # makes gz = 0, so d_cr* are pure power terms).  Translating
            # a surfel by (ox, oy) perturbs a -> a - B·ox - C·oy (3D
            # branch) and the filter center p -> p + o (2D branch); per
            # pixel exactly one branch is live, so the terms never mix.
            gx_px = (
                -(d_crx * col(_BX) + d_cry * col(_BY) + d_crz * col(_BZ))
                + g2 * dxl * (1.0 / FILTER_2D_VAR)
            )
            gy_px = (
                -(d_crx * col(_CX) + d_cry * col(_CY) + d_crz * col(_CZ))
                + g2 * dyl * (1.0 / FILTER_2D_VAR)
            )
            gradT = jnp.concatenate(
                [
                    zcols(N_ATTR),
                    rsum(jnp.abs(gx_px)), rsum(jnp.abs(gy_px)),
                    zcols(SLAB_W2 - N_ATTR - 2),
                ],
                axis=1,
            )
        else:
            gradT = jnp.concatenate(
                [
                    rsum(d_crx), rsum(d_cry), rsum(d_crz),
                    rsum(d_crx * Xg), rsum(d_cry * Xg), rsum(d_crz * Xg),
                    rsum(d_crx * Yg), rsum(d_cry * Yg), rsum(d_crz * Yg),
                    rsum(gz * rz),
                    rsum(g2 * dxl) / FILTER_2D_VAR,
                    rsum(g2 * dyl) / FILTER_2D_VAR,
                    rsum(g_power) / jnp.maximum(col(_OPA), 1e-12),
                    rsum(W * cot[0:1]), rsum(W * cot[1:2]),
                    rsum(W * cot[2:3]),
                    rsum(W * cot[3:4]), rsum(W * cot[4:5]),
                    rsum(W * cot[5:6]),
                    zcols(1),                        # _RAD (non-diff)
                    zcols(SLAB_W2 - N_ATTR),
                ],
                axis=1,
            )  # (CHUNK, SLAB_W2) — grad rows mirror the attribute layout
        # double-buffered grad writeback (overlap copy with next chunk)
        slot = jax.lax.rem(c, 2)

        @pl.when(c >= 2)
        def _():
            dma_out(slot, c - 2).wait()

        boffg = pl.multiple_of(slot * SLAB_W2, SLAB_W2)
        gbuf[pl.ds(boffg, SLAB_W2), :] = gradT.T
        dma_out(slot, c).start()

        return (c + 1, T_raw_new, pref[-1:])

    def cond(state):
        c, T_raw = state[0], state[1]
        return (c < n_chunks) & (jnp.max(T_raw) >= T_EPS)

    c, _, _ = jax.lax.while_loop(cond, chunk_body, (0, ones, zeros))

    @pl.when(c < n_chunks)
    def _():
        dma_in(c % 2, c).wait()

    @pl.when(c >= 2)
    def _():
        dma_out(jax.lax.rem(c - 2, 2), c - 2).wait()

    @pl.when(c >= 1)
    def _():
        dma_out(jax.lax.rem(c - 1, 2), c - 1).wait()


def pallas_surfel_bwd(saved, cot, tiles_x, tiles_y, tile_size,
                      mode: str = "full"):
    """Hand-written backward: returns ``(grads, sel_abs)`` where grads are
    for (acr, bcr, ccr, det, xy, color, opacity, normal, bg) — the
    differentiable args of ``composite_surfels`` minus rad/znear/zfar/bins
    (handled by the caller) — and ``sel_abs`` is the (N, 2) AbsGS
    screen-translation rows in ``mode="selonly"`` (None otherwise).

    ``mode="selonly"`` is the fused-selection pass: the cotangent is
    image-only by construction (``surfel._fwd_sel_impl``), so the kernel
    statically skips the depth/median/distortion machinery and only the
    sel rows of the returned grads are meaningful."""
    from .composite import (
        _grad_slab_width, _reduce_grad_rows, _tile,
    )

    assert mode in ("full", "selonly"), mode
    (acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear, zfar,
     bins_arrays, res, out) = saved
    ids, _, _, sorted_rank, depth_order, tile_starts, tile_counts = bins_arrays
    gC_img, gA_img, gDexp_img, gDmed_img, gN_img, gdist_img = cot
    (C_t, N_t, Dexp_t, dist_t, m1_t, m2_t, Tfin_t,
     astarts, apos, slab_t) = res
    ts = tile_size
    num_tiles = tiles_x * tiles_y
    npix = ts * ts

    # tile the cotangents
    gC = _tile(gC_img, tiles_x, tiles_y, ts)            # (T, npix, 3)
    gN = _tile(gN_img, tiles_x, tiles_y, ts)
    t1 = lambda v: _tile(v[..., None], tiles_x, tiles_y, ts)[..., 0]
    gA = t1(gA_img)
    gDexp = t1(gDexp_img)
    gDmed = t1(gDmed_img)
    gdist = t1(gdist_img)

    # suffix-trick totals (see module docstring); in selonly mode every
    # non-image cotangent is statically zero — skip those terms
    G = jnp.einsum("tpc,tpc->tp", gC, C_t)
    if mode != "selonly":
        G = (
            G
            + jnp.einsum("tpc,tpc->tp", gN, N_t)
            + gDexp * Dexp_t
            + 2.0 * gdist * dist_t
        )
    # dL/dT_fin term pre-folded into the suffix total (one fewer
    # full-shape add per chunk in the kernel)
    G2 = G + (jnp.einsum("tpc,c->tp", gC, bg) - gA) * Tfin_t

    cot8 = jnp.concatenate(
        [
            gC.transpose(0, 2, 1), gN.transpose(0, 2, 1),
            gDexp[:, None], gdist[:, None],
        ],
        axis=1,
    )  # (T, 8, npix)
    aux8 = jnp.concatenate(
        [
            G2[:, None], gDmed[:, None],
            (1.0 - Tfin_t)[:, None], m1_t[:, None], m2_t[:, None],
            jnp.zeros((num_tiles, 3, npix), jnp.float32),
        ],
        axis=1,
    )  # (T, 8, npix)

    M = _grad_slab_width(ids.shape[0], num_tiles)
    scal = jnp.stack([znear.astype(jnp.float32), zfar.astype(jnp.float32)])
    zeros_grad = jnp.zeros((SLAB_W2, M), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 8, npix), lambda t, *p: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npix), lambda t, *p: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2 * SLAB_W2, CHUNK), jnp.float32),
            pltpu.VMEM((2 * SLAB_W2, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, ts=tile_size, mode=mode
    )
    grad_al = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SLAB_W2, M), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(
        tile_starts, tile_counts, astarts, scal, slab_t,
        cot8, aux8, zeros_grad,
    )  # (SLAB_W2, M)

    # aligned grads -> per-surfel grads via the apos map (strategy per
    # composite.APOS_MODE, same as the 3DGS path; the function handles the
    # attribute-major (SLAB_W2, M) slab directly).  ``rows`` slices the
    # gathers to the rows the mode writes (full: the 19 attribute grads;
    # selonly: the two |d/dscreen| rows) — the dead rows are pure wasted
    # gather traffic (composite._MODE_ROWS rationale).
    rows = (0, N_ATTR) if mode == "full" else (N_ATTR, N_ATTR + 2)
    g = _reduce_grad_rows(
        grad_al, apos, det.shape[0], depth_order, width=SLAB_W2, rows=rows,
    )

    d_acr = g[:, _AX:_AX + 3]
    d_bcr = g[:, _BX:_BX + 3]
    d_ccr = g[:, _CX:_CX + 3]
    d_det = g[:, _DET]
    d_xy = g[:, _PX:_PX + 2]
    d_opa = g[:, _OPA]
    d_col = g[:, _R:_R + 3]
    d_nrm = g[:, _NX:_NX + 3]
    d_bg = jnp.einsum("tpc,tp->c", gC, Tfin_t)
    grads = (d_acr, d_bcr, d_ccr, d_det, d_xy, d_col, d_opa, d_nrm, d_bg)
    sel_abs = g[:, N_ATTR:N_ATTR + 2] if mode == "selonly" else None
    return grads, sel_abs
