"""Front-to-back alpha compositing over per-tile depth-ordered slabs (XLA).

This is the jnp reference implementation of the rasterization hot loop: it
runs everywhere (CPU tests, TPU), is fully vectorized (a ``lax.scan`` over
slab chunks where each step processes one chunk of *every* tile at once), and
carries a hand-written backward wrapped in ``jax.custom_vjp``.  The Pallas
TPU kernels (``pallas_kernels.py``) implement the same math with per-tile
grid programs and real early termination; this module is the semantic ground
truth they are tested against.

Semantics pinned to the 3DGS CUDA rasterizer (as used by the reference via
``lightning/renderer.py:250-259``):
  * power = -0.5 (a dx² + c dy²) - b dx dy; skip if power > 0,
  * alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255,
  * terminate the pixel before compositing the Gaussian that would bring
    transmittance below 1e-4,
  * outputs: color (+ T_final * background), alpha map ``1 - T_final``,
    expected depth ``Σ z·α·T``.

Backward derivation (front-to-back, no reverse traversal):
  with weights w_i = α_i·T_i, per-pixel gradients are
    dL/dc_i = gC · w_i
    dL/dα_i = (gC·c_i + gD·z_i) T_i - (R_i + (gC·bg - gA)·T_fin) / (1-α_i)
  where R_i = Σ_{j>i} (gC·c_j + gD·z_j) w_j is the *suffix* contribution.
  The total G = Σ_j (gC·c_j + gD·z_j) w_j equals
  gC·(C - T_fin·bg) + gD·D — recoverable from the forward outputs — so
  R_i = G - prefix_i and the backward needs only one additional
  front-to-back pass.  The AbsGS absolute screen-gradient channels
  (reference contract ``means2D.grad[:, 2:4]``, ``network.py:865-878``) are
  the per-pixel |dL/d(mean2D)| accumulated instead of summed; they are
  emitted as the cotangent of the zero ``xy_abs`` input.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def _tile_pixel_coords(tiles_x: int, tiles_y: int, ts: int):
    """(num_tiles, ts*ts) x and y pixel-center coordinates."""
    tix = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    ox = (tix % tiles_x) * ts
    oy = (tix // tiles_x) * ts
    py = jax.lax.broadcasted_iota(jnp.int32, (ts, ts), 0).reshape(-1)
    px = jax.lax.broadcasted_iota(jnp.int32, (ts, ts), 1).reshape(-1)
    X = ox[:, None] + px[None, :]
    Y = oy[:, None] + py[None, :]
    return X.astype(jnp.float32), Y.astype(jnp.float32)


def _chunk_alpha(xy, conic, opacity, slot_ok, X, Y):
    """Raw per-(slot, pixel) alpha for one chunk.

    Args: xy (T,K,2), conic (T,K,3), opacity (T,K), slot_ok (T,K) bool,
          X/Y (T, ts²). Returns alpha (T, K, ts²).
    """
    dx = X[:, None, :] - xy[..., 0][..., None]     # (T, K, ts²)
    dy = Y[:, None, :] - xy[..., 1][..., None]
    a = conic[..., 0][..., None]
    b = conic[..., 1][..., None]
    c = conic[..., 2][..., None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity[..., None] * jnp.exp(power))
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & slot_ok[..., None]
    return jnp.where(ok, alpha, 0.0), dx, dy


def _gather_chunk(arrs, idx):
    return [jnp.take(a, idx, axis=0) for a in arrs]


@partial(
    jax.custom_vjp,
    nondiff_argnums=(8, 9, 10, 11, 12, 13),
)
def composite_tiles(
    xy,
    xy_abs,
    conic,
    color,
    opacity,
    depth,
    bg,
    bins_arrays,
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    max_per_tile: int,
    chunk: int,
    backend: str = "xla",
):
    """Composite sorted per-slot Gaussian data into an image.

    Args:
      xy, conic, color, opacity, depth: per-*slot* arrays, i.e. already
        gathered in the sorted tile/depth order ((P, ...) with P = number of
        slots).  Gradients flow back through the caller's gather.
      xy_abs: (P, 2) zeros; its cotangent returns the AbsGS absolute
        screen-space gradients.
      bg: (3,) background color.
      bins_arrays: (tile_starts, tile_counts, slot_valid) from ``TileBins``.
    Returns:
      image (H, W, 3), alpha (H, W), depth (H, W).
    """
    out, _ = _composite_fwd_impl(
        xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
        tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend,
    )
    return out


def _build_slab(xy, conic, color, opacity, depth, slot_valid):
    """Pack per-slot data into the (P, 16) kernel slab layout."""
    P = xy.shape[0]
    pad = jnp.zeros((P, 5), jnp.float32)
    return jnp.concatenate(
        [
            xy.astype(jnp.float32),
            conic.astype(jnp.float32),
            opacity.astype(jnp.float32)[:, None],
            color.astype(jnp.float32),
            depth.astype(jnp.float32)[:, None],
            slot_valid.astype(jnp.float32)[:, None],
            pad,
        ],
        axis=-1,
    )


def _aligned_layout(tile_starts, tile_counts, P, num_tiles):
    """CHUNK-align every tile's slab segment (Mosaic 1-D DMA offsets must be
    divisible by the memref tiling).  Returns (aligned_starts, per-sorted-slot
    aligned position (or P_al for dead slots), live mask, P_al)."""
    from .pallas_kernels import CHUNK

    padded = ((tile_counts + CHUNK - 1) // CHUNK) * CHUNK
    astarts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    P_al = P + CHUNK * num_tiles
    idx = jnp.arange(P, dtype=jnp.int32)
    tile_of = jnp.clip(
        jnp.searchsorted(tile_starts, idx, side="right") - 1, 0, num_tiles - 1
    )
    within = idx - tile_starts[tile_of]
    live = (within >= 0) & (within < tile_counts[tile_of])
    pos = jnp.where(live, astarts[tile_of] + within, P_al)
    return astarts, pos, live, P_al


def _pallas_fwd(xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
                tiles_x, tiles_y, tile_size):
    from .pallas_kernels import SLAB_W, pallas_composite_fwd

    tile_starts, tile_counts, slot_valid = bins_arrays
    num_tiles = tiles_x * tiles_y
    P = xy.shape[0]
    slab = _build_slab(xy + xy_abs, conic, color, opacity, depth, slot_valid)
    astarts, pos, live, P_al = _aligned_layout(
        tile_starts, tile_counts, P, num_tiles
    )
    slab_al = jnp.zeros((P_al, SLAB_W), jnp.float32).at[pos].set(
        slab, mode="drop"
    )
    Cr, Cg, Cb, alpha_t, D, T_eff = pallas_composite_fwd(
        slab_al, astarts, tile_counts, tiles_x, tiles_y, tile_size
    )
    npix = tile_size * tile_size
    C = jnp.stack([Cr, Cg, Cb], axis=-1).reshape(num_tiles, npix, 3)
    alpha_t = alpha_t.reshape(num_tiles, npix)
    D = D.reshape(num_tiles, npix)
    T_eff = 1.0 - alpha_t
    image_t = C + T_eff[..., None] * bg[None, None, :]
    out = (
        _untile(image_t, tiles_x, tiles_y, tile_size, 3),
        _untile(alpha_t[..., None], tiles_x, tiles_y, tile_size, 1)[..., 0],
        _untile(D[..., None], tiles_x, tiles_y, tile_size, 1)[..., 0],
    )
    return out, (C, D, T_eff)


def _composite_fwd_impl(
    xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
    tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend="xla",
):
    if backend == "pallas":
        return _pallas_fwd(
            xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
            tiles_x, tiles_y, tile_size,
        )
    tile_starts, tile_counts, slot_valid = bins_arrays
    ts = tile_size
    num_tiles = tiles_x * tiles_y
    npix = ts * ts
    n_chunks = -(-max_per_tile // chunk)
    X, Y = _tile_pixel_coords(tiles_x, tiles_y, ts)
    P = xy.shape[0]

    xy_eff = xy + xy_abs  # xy_abs is zeros; routes abs-grad cotangent

    def step(carry, c):
        T_raw, T_eff, C, D = carry
        base = tile_starts[:, None] + c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        in_range = (base - tile_starts[:, None]) < tile_counts[:, None]
        idx = jnp.clip(base, 0, P - 1)
        g_xy, g_con, g_col, g_opa, g_dep, g_ok = _gather_chunk(
            [xy_eff, conic, color, opacity, depth, slot_valid], idx
        )
        slot_ok = in_range & g_ok
        alpha, _, _ = _chunk_alpha(g_xy, g_con, g_opa, slot_ok, X, Y)

        one_m = 1.0 - alpha                          # (T, K, npix)
        # exclusive cumulative transmittance within the chunk
        cum = jnp.cumprod(one_m, axis=1)
        T_exc = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
        ) * T_raw[:, None, :]
        U = T_exc * one_m                            # T after compositing i
        include = (U >= T_EPS).astype(alpha.dtype)
        w = alpha * T_exc * include                  # (T, K, npix)

        C = C + jnp.einsum("tkp,tkc->tpc", w, g_col, precision=jax.lax.Precision.HIGHEST)
        D = D + jnp.sum(w * g_dep[..., None], axis=1)
        T_raw = T_raw * cum[:, -1, :]
        T_eff = T_eff * jnp.prod(1.0 - alpha * include, axis=1)
        return (T_raw, T_eff, C, D), None

    init = (
        jnp.ones((num_tiles, npix), jnp.float32),
        jnp.ones((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix, 3), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
    )
    (T_raw, T_eff, C, D), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )

    image_t = C + T_eff[..., None] * bg[None, None, :]
    alpha_t = 1.0 - T_eff
    out = (
        _untile(image_t, tiles_x, tiles_y, ts, 3),
        _untile(alpha_t[..., None], tiles_x, tiles_y, ts, 1)[..., 0],
        _untile(D[..., None], tiles_x, tiles_y, ts, 1)[..., 0],
    )
    residuals = (C, D, T_eff)
    return out, residuals


def _untile(x, tiles_x, tiles_y, ts, ch):
    """(num_tiles, ts², ch) -> (H, W, ch)."""
    x = x.reshape(tiles_y, tiles_x, ts, ts, ch)
    return x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * ts, tiles_x * ts, ch)


def _tile(img, tiles_x, tiles_y, ts):
    """(H, W, ch) -> (num_tiles, ts², ch)."""
    ch = img.shape[-1]
    x = img.reshape(tiles_y, ts, tiles_x, ts, ch)
    return x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tiles_x, ts * ts, ch)


def _composite_fwd(
    xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
    tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend="xla",
):
    out, res = _composite_fwd_impl(
        xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
        tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend,
    )
    saved = (xy, conic, color, opacity, depth, bg, bins_arrays, res)
    return out, saved


def _pallas_bwd(saved, cot, tiles_x, tiles_y, tile_size):
    from .pallas_kernels import pallas_composite_bwd

    xy, conic, color, opacity, depth, bg, bins_arrays, res = saved
    gC_img, gA_img, gD_img = cot
    C_fin, D_fin, T_fin = res
    tile_starts, tile_counts, slot_valid = bins_arrays
    ts = tile_size
    num_tiles = tiles_x * tiles_y

    gC = _tile(gC_img, tiles_x, tiles_y, ts)
    gA = _tile(gA_img[..., None], tiles_x, tiles_y, ts)[..., 0]
    gD = _tile(gD_img[..., None], tiles_x, tiles_y, ts)[..., 0]
    G = jnp.sum(gC * C_fin, axis=-1) + gD * D_fin
    gTf = (jnp.sum(gC * bg[None, None, :], axis=-1) - gA) * T_fin

    from .pallas_kernels import SLAB_W

    P = xy.shape[0]
    slab = _build_slab(xy, conic, color, opacity, depth, slot_valid)
    astarts, pos, live, P_al = _aligned_layout(
        tile_starts, tile_counts, P, num_tiles
    )
    slab_al = jnp.zeros((P_al, SLAB_W), jnp.float32).at[pos].set(
        slab, mode="drop"
    )
    r8 = lambda x: x.reshape(num_tiles, 8, 128)
    grad_al = pallas_composite_bwd(
        slab_al, astarts, tile_counts,
        gC.reshape(num_tiles, 8, 128, 3), r8(gA), r8(gD), r8(G), r8(gTf),
        tiles_x, tiles_y, ts,
    )
    grad = jnp.where(
        live[:, None],
        jnp.take(grad_al, jnp.clip(pos, 0, P_al - 1), axis=0),
        0.0,
    )
    d_xy = grad[:, 0:2]
    d_con = grad[:, 2:5]
    d_opa = grad[:, 5]
    d_col = grad[:, 6:9]
    d_dep = grad[:, 9]
    d_abs = grad[:, 10:12]
    d_bg = jnp.einsum("tpc,tp->c", gC, T_fin)
    import numpy as np

    d_bins = tuple(
        np.zeros(np.shape(b), jax.dtypes.float0) for b in bins_arrays
    )
    return (d_xy, d_abs, d_con, d_col, d_opa, d_dep, d_bg, d_bins)


def _composite_bwd(
    tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend, saved, cot,
):
    if backend == "pallas":
        return _pallas_bwd(saved, cot, tiles_x, tiles_y, tile_size)
    xy, conic, color, opacity, depth, bg, bins_arrays, res = saved
    gC_img, gA_img, gD_img = cot
    C_fin, D_fin, T_fin = res
    tile_starts, tile_counts, slot_valid = bins_arrays
    ts = tile_size
    npix = ts * ts
    num_tiles = tiles_x * tiles_y
    n_chunks = -(-max_per_tile // chunk)
    X, Y = _tile_pixel_coords(tiles_x, tiles_y, ts)
    P = xy.shape[0]

    gC = _tile(gC_img, tiles_x, tiles_y, ts)               # (T, npix, 3)
    gA = _tile(gA_img[..., None], tiles_x, tiles_y, ts)[..., 0]
    gD = _tile(gD_img[..., None], tiles_x, tiles_y, ts)[..., 0]

    # total contribution term per pixel: G = gC·C + gD·D
    # (the saved residual C is the accumulated color *before* background)
    G = jnp.sum(gC * C_fin, axis=-1) + gD * D_fin
    # background/alpha-map term: dL/dT_fin
    gTfin = jnp.sum(gC * bg[None, None, :], axis=-1) - gA  # (T, npix)

    zeros_like = jnp.zeros_like
    acc0 = (
        zeros_like(xy), zeros_like(xy), zeros_like(conic), zeros_like(color),
        zeros_like(opacity), zeros_like(depth),
    )

    def step(carry, c):
        T_raw, prefix, acc = carry
        d_xy, d_abs, d_con, d_col, d_opa, d_dep = acc
        base = tile_starts[:, None] + c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        in_range = (base - tile_starts[:, None]) < tile_counts[:, None]
        idx = jnp.clip(base, 0, P - 1)
        g_xy, g_con, g_col, g_opa, g_dep, g_ok = _gather_chunk(
            [xy, conic, color, opacity, depth, slot_valid], idx
        )
        slot_ok = in_range & g_ok
        alpha, dx, dy = _chunk_alpha(g_xy, g_con, g_opa, slot_ok, X, Y)

        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=1)
        T_exc = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
        ) * T_raw[:, None, :]
        U = T_exc * one_m
        include = (U >= T_EPS).astype(alpha.dtype)
        w = alpha * T_exc * include                         # (T, K, npix)

        # per-(slot,pixel) contribution term: (gC·c_i + gD·z_i)
        contrib = (
            jnp.einsum("tpc,tkc->tkp", gC, g_col, precision=jax.lax.Precision.HIGHEST) + gD[:, None, :] * g_dep[..., None]
        )
        # inclusive prefix within chunk + carry-in prefix
        pref_inc = prefix[:, None, :] + jnp.cumsum(contrib * w, axis=1)
        suffix = G[:, None, :] - pref_inc                   # R_i
        inv_1ma = 1.0 / jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        g_alpha = include * (
            contrib * T_exc - (suffix + gTfin[:, None, :] * T_fin[:, None, :]) * inv_1ma
        )                                                   # (T, K, npix)

        # dα/d(opacity) and dα/d(power): zero where clamped at ALPHA_MAX
        not_clamped = (alpha < ALPHA_MAX).astype(alpha.dtype)
        safe_opa = jnp.maximum(g_opa[..., None], 1e-12)
        d_opa_px = g_alpha * not_clamped * alpha / safe_opa
        g_power = g_alpha * not_clamped * alpha             # (T, K, npix)

        a = g_con[..., 0][..., None]
        b = g_con[..., 1][..., None]
        cc = g_con[..., 2][..., None]
        # power = -0.5(a dx² + c dy²) - b dx dy; dx = px - x_g
        gx_px = g_power * (a * dx + b * dy)                 # dL/dx_g per pixel
        gy_px = g_power * (cc * dy + b * dx)
        d_a_px = g_power * (-0.5 * dx * dx)
        d_b_px = g_power * (-dx * dy)
        d_c_px = g_power * (-0.5 * dy * dy)

        # reduce over pixels -> per-slot grads, then scatter-add
        def red(v):
            return jnp.sum(v, axis=-1)

        slot_gxy = jnp.stack([red(gx_px), red(gy_px)], axis=-1)        # (T,K,2)
        slot_abs = jnp.stack(
            [red(jnp.abs(gx_px)), red(jnp.abs(gy_px))], axis=-1
        )
        slot_con = jnp.stack([red(d_a_px), red(d_b_px), red(d_c_px)], axis=-1)
        slot_col = jnp.einsum("tkp,tpc->tkc", w, gC, precision=jax.lax.Precision.HIGHEST)
        slot_opa = red(d_opa_px)
        slot_dep = red(w * gD[:, None, :])

        flat_idx = idx.reshape(-1)
        ok = slot_ok.reshape(-1)[:, None]
        d_xy = d_xy.at[flat_idx].add(jnp.where(ok, slot_gxy.reshape(-1, 2), 0.0))
        d_abs = d_abs.at[flat_idx].add(jnp.where(ok, slot_abs.reshape(-1, 2), 0.0))
        d_con = d_con.at[flat_idx].add(jnp.where(ok, slot_con.reshape(-1, 3), 0.0))
        d_col = d_col.at[flat_idx].add(jnp.where(ok, slot_col.reshape(-1, 3), 0.0))
        d_opa = d_opa.at[flat_idx].add(
            jnp.where(ok[:, 0], slot_opa.reshape(-1), 0.0)
        )
        d_dep = d_dep.at[flat_idx].add(
            jnp.where(ok[:, 0], slot_dep.reshape(-1), 0.0)
        )

        T_raw = T_raw * cum[:, -1, :]
        prefix = pref_inc[:, -1, :]
        return (T_raw, prefix, (d_xy, d_abs, d_con, d_col, d_opa, d_dep)), None

    init = (
        jnp.ones((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
        acc0,
    )
    (_, _, acc), _ = jax.lax.scan(step, init, jnp.arange(n_chunks, dtype=jnp.int32))
    d_xy, d_abs, d_con, d_col, d_opa, d_dep = acc

    # background gradient: Σ_px gC * T_fin
    d_bg = jnp.einsum("tpc,tp->c", gC, T_fin)
    # integer/bool inputs take float0 cotangents
    import numpy as np

    d_bins = tuple(
        np.zeros(np.shape(b), jax.dtypes.float0) for b in bins_arrays
    )
    return (d_xy, d_abs, d_con, d_col, d_opa, d_dep, d_bg, d_bins)


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
