"""Pallas TPU kernels for the rasterization hot loop.

The XLA compositing path (``composite.py``) is shape-oblivious: every tile
scans ``max_per_tile`` slots.  These kernels give each tile its own grid
program with a *dynamic* trip count (``tile_counts`` via scalar prefetch),
double-buffered HBM->VMEM slab DMA, and true early termination when every
pixel in the tile is saturated — the wins the CUDA rasterizer gets from
per-tile thread blocks, expressed the TPU way.

Layout: tile_size=32 so a tile's 1024 pixels form one (8, 128) vreg-shaped
block; pixel (py, px) lives at sublane ``py*32+px) // 128`` etc — closed
forms below.  Slot attributes are packed as a (P, 16) f32 slab:
  [x, y, conic_a, conic_b, conic_c, opacity, r, g, b, depth, valid, 0...].

Forward math and the front-to-back backward (prefix trick, AbsGS channels)
are bit-compatible with ``composite.py`` — the test suite asserts the two
backends agree on both values and gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _interpret() -> bool:
    """Interpret kernels off-TPU (CPU tests exercise the same code path)."""
    import jax

    return jax.default_backend() != "tpu"


ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
SLAB_W = 16
CHUNK = 64

# slab column indices
_X, _Y, _A, _B, _C, _OPA, _R, _G, _BL, _DEP, _VAL = range(11)


def _pixel_coords(t, tiles_x: int, ts: int):
    """(8, 128) f32 pixel-center coordinates of tile t (ts must be 32)."""
    ox = (t % tiles_x) * ts
    oy = (t // tiles_x) * ts
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    X = (ox + lane % ts).astype(jnp.float32)
    Y = (oy + sub * (128 // ts) + lane // ts).astype(jnp.float32)
    return X, Y


def _fwd_kernel(
    starts_ref,
    counts_ref,
    slab_hbm,
    cr_out,
    cg_out,
    cb_out,
    alpha_out,
    depth_out,
    traw_out,
    buf,      # VMEM (2, CHUNK, SLAB_W)
    sem,      # DMA sems (2,)
    *,
    tiles_x: int,
    ts: int,
):
    t = pl.program_id(0)
    # starts are CHUNK-aligned (see _aligned_layout); the hint lets Mosaic
    # prove the 1-D DMA offsets divisible by the (1024,) memref tiling
    start = pl.multiple_of(starts_ref[t], CHUNK)
    count = counts_ref[t]
    X, Y = _pixel_coords(t, tiles_x, ts)

    n_chunks = pl.cdiv(count, CHUNK)

    def dma(slot, c):
        off = pl.multiple_of((start + c * CHUNK) * SLAB_W, CHUNK * SLAB_W)
        boff = pl.multiple_of(slot * (CHUNK * SLAB_W), CHUNK * SLAB_W)
        return pltpu.make_async_copy(
            slab_hbm.at[pl.ds(off, CHUNK * SLAB_W)],
            buf.at[pl.ds(boff, CHUNK * SLAB_W)],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    ones = jnp.ones((8, 128), jnp.float32)
    zeros = jnp.zeros((8, 128), jnp.float32)

    def chunk_body(state):
        c, T_raw, T_eff, Cr, Cg, Cb, D = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(c % 2, c).wait()
        sl = c % 2
        base = c * CHUNK

        def slot_body(k, carry):
            T_raw, T_eff, Cr, Cg, Cb, D = carry
            o = sl * (CHUNK * SLAB_W) + k * SLAB_W
            x = buf[o + _X]
            y = buf[o + _Y]
            a = buf[o + _A]
            b = buf[o + _B]
            cc = buf[o + _C]
            opa = buf[o + _OPA]
            val = buf[o + _VAL]
            live = ((base + k) < count).astype(jnp.float32) * val

            dx = X - x
            dy = Y - y
            power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))
            ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
            alpha = jnp.where(ok, alpha, 0.0) * live

            U = T_raw * (1.0 - alpha)
            inc = (U >= T_EPS).astype(jnp.float32)
            w = alpha * T_raw * inc
            Cr = Cr + w * buf[o + _R]
            Cg = Cg + w * buf[o + _G]
            Cb = Cb + w * buf[o + _BL]
            D = D + w * buf[o + _DEP]
            T_eff = T_eff * (1.0 - alpha * inc)
            return (U, T_eff, Cr, Cg, Cb, D)

        T_raw, T_eff, Cr, Cg, Cb, D = jax.lax.fori_loop(
            0, CHUNK, slot_body, (T_raw, T_eff, Cr, Cg, Cb, D), unroll=CHUNK
        )
        return (c + 1, T_raw, T_eff, Cr, Cg, Cb, D)

    def cond(state):
        c = state[0]
        T_raw = state[1]
        return (c < n_chunks) & (jnp.max(T_raw) >= T_EPS)

    c, T_raw, T_eff, Cr, Cg, Cb, D = jax.lax.while_loop(
        cond, chunk_body, (0, ones, ones, zeros, zeros, zeros, zeros)
    )
    # drain the possibly-inflight prefetch so the next program's buffer is free
    @pl.when(c < n_chunks)
    def _():
        dma(c % 2, c).wait()

    cr_out[0] = Cr
    cg_out[0] = Cg
    cb_out[0] = Cb
    alpha_out[0] = 1.0 - T_eff
    depth_out[0] = D
    traw_out[0] = T_eff


def pallas_composite_fwd(slab, tile_starts, tile_counts, tiles_x, tiles_y,
                         tile_size: int = 32):
    """slab (P, 16) sorted slot data -> per-tile (8,128) maps.

    Returns (Cr, Cg, Cb, alpha, depth, T_eff), each (num_tiles, 8, 128).
    """
    assert tile_size == 32, "pallas path is specialized to 32px tiles"
    num_tiles = tiles_x * tiles_y
    P = slab.shape[0]
    # pad so chunked DMA can overrun the tail; flatten (1-D HBM slices
    # avoid lane-padded 2-D memref alignment constraints)
    slab = jnp.concatenate(
        [slab, jnp.zeros((CHUNK, SLAB_W), slab.dtype)], axis=0
    ).reshape(-1)

    out_shape = [
        jax.ShapeDtypeStruct((num_tiles, 8, 128), jnp.float32)
        for _ in range(6)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, *prefetch: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(6)
        ],
        scratch_shapes=[
            pltpu.SMEM((2 * CHUNK * SLAB_W,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, tiles_x=tiles_x, ts=tile_size)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(tile_starts, tile_counts, slab)


def _bwd_kernel(
    starts_ref,
    counts_ref,
    slab_hbm,
    gc_r_in, gc_g_in, gc_b_in,   # (1, 8, 128) tiled cotangents
    gA_in, gD_in, G_in, gTf_in,  # per-pixel terms (gTf = (gC·bg - gA)·T_fin)
    zeros_in,                    # aliased zero-initialized input (unused ref)
    grad_hbm,                    # flat (P_al*16,) output slab, aliased zeros
    buf, gbuf, sem, gsem,
    *,
    tiles_x: int,
    ts: int,
):
    t = pl.program_id(0)
    start = pl.multiple_of(starts_ref[t], CHUNK)
    count = counts_ref[t]
    X, Y = _pixel_coords(t, tiles_x, ts)
    n_chunks = pl.cdiv(count, CHUNK)

    gCr = gc_r_in[0]
    gCg = gc_g_in[0]
    gCb = gc_b_in[0]
    gD = gD_in[0]
    G = G_in[0]
    gTf = gTf_in[0]

    def dma_in(slot, c):
        off = pl.multiple_of((start + c * CHUNK) * SLAB_W, CHUNK * SLAB_W)
        boff = pl.multiple_of(slot * (CHUNK * SLAB_W), CHUNK * SLAB_W)
        return pltpu.make_async_copy(
            slab_hbm.at[pl.ds(off, CHUNK * SLAB_W)],
            buf.at[pl.ds(boff, CHUNK * SLAB_W)],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()

    ones = jnp.ones((8, 128), jnp.float32)
    zeros = jnp.zeros((8, 128), jnp.float32)

    def chunk_body(state):
        c, T_raw, prefix = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma_in((c + 1) % 2, c + 1).start()

        dma_in(c % 2, c).wait()
        sl = c % 2
        base = c * CHUNK

        def slot_body(k, carry):
            T_raw, prefix = carry
            o = sl * (CHUNK * SLAB_W) + k * SLAB_W
            x = buf[o + _X]
            y = buf[o + _Y]
            a = buf[o + _A]
            b = buf[o + _B]
            cc = buf[o + _C]
            opa = buf[o + _OPA]
            val = buf[o + _VAL]
            live = ((base + k) < count).astype(jnp.float32) * val

            dx = X - x
            dy = Y - y
            power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))
            ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
            alpha = jnp.where(ok, alpha, 0.0) * live

            U = T_raw * (1.0 - alpha)
            inc = (U >= T_EPS).astype(jnp.float32)
            w = alpha * T_raw * inc

            contrib = gCr * buf[o + _R] + gCg * buf[o + _G] \
                + gCb * buf[o + _BL] + gD * buf[o + _DEP]
            prefix = prefix + contrib * w
            suffix = G - prefix
            inv_1ma = 1.0 / jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
            g_alpha = inc * (contrib * T_raw - (suffix + gTf) * inv_1ma)

            not_clamped = (alpha < ALPHA_MAX).astype(jnp.float32)
            g_power = g_alpha * not_clamped * alpha
            gx_px = g_power * (a * dx + b * dy)
            gy_px = g_power * (cc * dy + b * dx)

            go = k * SLAB_W  # gbuf is single-buffered (per-chunk)
            gbuf[go + _X] = jnp.sum(gx_px)
            gbuf[go + _Y] = jnp.sum(gy_px)
            gbuf[go + _A] = jnp.sum(g_power * (-0.5 * dx * dx))
            gbuf[go + _B] = jnp.sum(g_power * (-dx * dy))
            gbuf[go + _C] = jnp.sum(g_power * (-0.5 * dy * dy))
            gbuf[go + _OPA] = jnp.sum(
                g_alpha * not_clamped * alpha / jnp.maximum(opa, 1e-12)
            )
            gbuf[go + _R] = jnp.sum(w * gCr)
            gbuf[go + _G] = jnp.sum(w * gCg)
            gbuf[go + _BL] = jnp.sum(w * gCb)
            gbuf[go + _DEP] = jnp.sum(w * gD)
            gbuf[go + _VAL] = jnp.sum(jnp.abs(gx_px))
            gbuf[go + _VAL + 1] = jnp.sum(jnp.abs(gy_px))

            return (U, prefix)

        T_raw, prefix = jax.lax.fori_loop(
            0, CHUNK, slot_body, (T_raw, prefix), unroll=CHUNK
        )

        off = pl.multiple_of((start + c * CHUNK) * SLAB_W, CHUNK * SLAB_W)
        out_dma = pltpu.make_async_copy(
            gbuf, grad_hbm.at[pl.ds(off, CHUNK * SLAB_W)], gsem
        )
        out_dma.start()
        out_dma.wait()
        return (c + 1, T_raw, prefix)

    def cond(state):
        c, T_raw, _ = state
        return (c < n_chunks) & (jnp.max(T_raw) >= T_EPS)

    c, _, _ = jax.lax.while_loop(cond, chunk_body, (0, ones, zeros))

    @pl.when(c < n_chunks)
    def _():
        dma_in(c % 2, c).wait()


def pallas_composite_bwd(
    slab, tile_starts, tile_counts, gc_tiled, gA_tiled, gD_tiled,
    G_tiled, gTf_tiled, tiles_x, tiles_y, tile_size: int = 32,
):
    """Backward: per-slot gradient slab (P, 16).

    Columns mirror the input slab; [_VAL] and [_VAL+1] carry the AbsGS
    |d/dx|, |d/dy| accumulations.  Slots beyond a tile's early-termination
    point keep their zero initialization (grad_hbm is zero-initialized via
    input-output aliasing).
    """
    assert tile_size == 32
    num_tiles = tiles_x * tiles_y
    P = slab.shape[0]
    slab_p = jnp.concatenate(
        [slab, jnp.zeros((CHUNK, SLAB_W), slab.dtype)], axis=0
    ).reshape(-1)
    zeros_grad = jnp.zeros(((P + CHUNK) * SLAB_W,), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),      # slab
            *[
                pl.BlockSpec((1, 8, 128), lambda t, *prefetch: (t, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(7)
            ],
            pl.BlockSpec(memory_space=pltpu.HBM),      # zeros (aliased out)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.SMEM((2 * CHUNK * SLAB_W,), jnp.float32),
            pltpu.SMEM((CHUNK * SLAB_W,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x, ts=tile_size)
    grad = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(((P + CHUNK) * SLAB_W,), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={10: 0},  # zeros_grad (arg 10 incl. prefetch) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(
        tile_starts, tile_counts, slab_p,
        gc_tiled[..., 0], gc_tiled[..., 1], gc_tiled[..., 2],
        gA_tiled, gD_tiled, G_tiled, gTf_tiled, zeros_grad,
    )
    return grad.reshape(-1, SLAB_W)[:P]
