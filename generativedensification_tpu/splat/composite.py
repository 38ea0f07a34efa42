"""Front-to-back alpha compositing over per-tile depth-ordered slabs.

One ``jax.custom_vjp`` covers two backends that share bit-level semantics:

  * ``backend="xla"`` — pure-jnp ``lax.scan`` over slab chunks (each step
    processes one chunk of *every* tile).  Runs everywhere; the semantic
    ground truth.
  * ``backend="pallas"`` — the TPU kernels in ``pallas_kernels.py``:
    per-tile grid programs with dynamic trip counts and early termination.

Data plane (profiled on v5e — gathers/scatters dominate if done naively):
inputs are packed into one attribute-major (16, N) table and moved into
CHUNK-aligned slot order with two chained axis-1 gathers (table -> sorted
-> aligned; see ``_slab_maps`` / ``_slab_from_maps``).  The backward maps
the per-slot grad slab back to Gaussians with transpose -> row gather ->
slot-sum, each stage bounded by Pallas kernels that pin row-major layouts
(XLA otherwise rewrites these chains into serialized row scatters or
column-major strided gathers — 5-17ms each at 1M slots).

Semantics pinned to the 3DGS CUDA rasterizer (reference call site
``lightning/renderer.py:250-259``):
  * power = -0.5 (a dx² + c dy²) - b dx dy  (≤ 0 for a PSD conic; positives
    are rounding noise and are clamped, see pallas_kernels notes),
  * alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255,
  * terminate a pixel before the Gaussian that would drop its
    transmittance below 1e-4,
  * outputs: color (+ T_final·bg), alpha map 1 - T_final, expected depth.

Backward (front-to-back, no reverse traversal): with w_i = α_i·T_i,
  dL/dc_i = gC · w_i
  dL/dα_i = (gC·c_i + gD·z_i) T_i - (R_i + (gC·bg - gA)·T_fin) / (1-α_i),
  R_i = G - prefix_i,  G = gC·C + gD·D (recovered from forward outputs).
The AbsGS |dL/d(mean2D)| channels (reference ``means2D.grad[:, 2:4]``,
``network.py:865-878``) arrive as the cotangent of the zero ``xy_abs``
input.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


# ---------------------------------------------------------------------------
# shared data plane
# ---------------------------------------------------------------------------


def _pack_table(xy, conic, color, opacity, depth, valid=None):
    """Per-Gaussian (N, 16) attribute table in kernel slab order."""
    N = xy.shape[0]
    f = lambda v: v.astype(jnp.float32)
    val = jnp.ones((N, 1), jnp.float32) if valid is None else f(valid)[:, None]
    return jnp.concatenate(
        [
            f(xy), f(conic), f(opacity)[:, None], f(color),
            f(depth)[:, None], val, jnp.zeros((N, 5), jnp.float32),
        ],
        axis=-1,
    )


def _pack_table_t(xy, conic, color, opacity, depth):
    """Attribute-major (16, N) table (same row order as ``_pack_table``
    columns).  Built directly in the kernel's slab orientation so the
    aligned-slot gather never needs a transposed output layout."""
    N = xy.shape[0]
    f = lambda v: v.astype(jnp.float32)
    one = jnp.ones((N,), jnp.float32)
    zero = jnp.zeros((N,), jnp.float32)
    return jnp.stack(
        [
            f(xy[:, 0]), f(xy[:, 1]),
            f(conic[:, 0]), f(conic[:, 1]), f(conic[:, 2]),
            f(opacity),
            f(color[:, 0]), f(color[:, 1]), f(color[:, 2]),
            f(depth), one, zero, zero, zero, zero, zero,
        ],
        axis=0,
    )


def _unpack_grads(g):
    """(…, 16) grad rows -> (d_xy, d_abs, d_conic, d_color, d_opa, d_depth).

    Column layout mirrors the slab; cols 10:12 carry the AbsGS channels.
    """
    return (
        g[..., 0:2],
        g[..., 10:12],
        g[..., 2:5],
        g[..., 6:9],
        g[..., 5],
        g[..., 9],
    )


def _grad_slab_width(P, num_tiles):
    """Static width of the backward's aligned grad slab."""
    from .pallas_kernels import CHUNK, TBLK

    # each tile's aligned segment is cdiv(head + count, CHUNK) chunks with
    # head < CHUNK, so the total extent is bounded by P + 2*CHUNK per tile
    bound = P + 2 * CHUNK * num_tiles + CHUNK
    return (bound + TBLK - 1) // TBLK * TBLK


def _aligned_layout(tile_starts, tile_counts, sorted_valid, P, num_tiles):
    """Per-tile aligned grad-segment starts + the aligned position of every
    sorted slot (sentinel M-1 for dead slots).

    The kernels READ the sorted-order slab directly (DMA from the
    aligned-down offset, head rows masked); only the backward's grad
    OUTPUT needs disjoint CHUNK-aligned segments.  A tile's segment holds
    ``cdiv(head + count, CHUNK)`` chunks and sorted slot ``s`` lands at
    ``astarts[t] + (s - base_t)``.

    ``tile_counts`` here are the CLAMPED (``min(count, max_per_tile)``)
    counts, so two per-tile quantities must reach every slot exactly:
    its own tile's aligned delta (``astarts - base`` stops being
    non-decreasing once any tile clamps — a stale ``cummax`` delta would
    aim later tiles' grads into other tiles' segments) and the cap end
    (slots past the cap are never composited, so their grads must go to
    the dead sentinel, not overrun the segment).  Both come from ONE
    scatter + ONE ``(3, P)`` ``cummax`` of per-tile values that ARE
    non-decreasing: segment starts, tile starts, and cap ends — per-slot
    gathers from the tiny tile tables would cost ~10ms at 1M slots,
    this ~1ms."""
    from .pallas_kernels import CHUNK

    M = _grad_slab_width(P, num_tiles)
    head = tile_starts % CHUNK
    base = tile_starts - head
    padded = ((head + tile_counts + CHUNK - 1) // CHUNK) * CHUNK
    astarts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    cap_end = tile_starts + tile_counts
    rows = jnp.stack([astarts, tile_starts, cap_end])          # (3, T)
    vec = jnp.full((3, P), jnp.iinfo(jnp.int32).min, jnp.int32)
    vec = vec.at[:, tile_starts].max(rows, mode="drop")
    aprop, sprop, capprop = jax.lax.cummax(vec, axis=1)
    idx = jnp.arange(P, dtype=jnp.int32)
    # slot s of tile t lands at astarts_t + (s - base_t); base_t =
    # sprop - sprop % CHUNK.  Dead / beyond-cap slots hit M-1: past every
    # aligned segment, never written, zero.
    pos = jnp.where(
        sorted_valid & (idx < capprop),
        aprop + jax.lax.rem(sprop, CHUNK) + idx - sprop,
        M - 1,
    )
    return astarts, pos


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


def _untile(x, tiles_x, tiles_y, ts, ch):
    """(num_tiles, ts², ch) -> (H, W, ch)."""
    x = x.reshape(tiles_y, tiles_x, ts, ts, ch)
    return x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * ts, tiles_x * ts, ch)


def _tile(img, tiles_x, tiles_y, ts):
    """(H, W, ch) -> (num_tiles, ts², ch)."""
    ch = img.shape[-1]
    x = img.reshape(tiles_y, ts, tiles_x, ts, ch)
    return x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tiles_x, ts * ts, ch)


# ---------------------------------------------------------------------------
# public entry (custom VJP)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15))
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
    n_slots: int = 0,
    want_abs: bool = True,
):
    """Composite N projected Gaussians into an image.

    Args:
      xy, conic, color, opacity, depth: per-Gaussian (N, ...) arrays.
      xy_abs: (N, 2) zeros; its cotangent returns the AbsGS absolute
        screen-space gradients.
      bg: (3,) background color.
      bins_arrays: (sorted_ids, sorted_o, sorted_valid, sorted_rank,
        depth_order, tile_starts, tile_counts) from ``TileBins``.
      want_abs: when False, the ``xy_abs`` cotangent is returned as zeros
        and the backward skips the AbsGS |grad| accumulations entirely
        (they live inside the opaque Pallas kernel, so XLA cannot DCE
        them; a caller that never reads the selection grads should say
        so).
    Returns:
      image (H, W, 3), alpha (H, W), depth (H, W).
    """
    out, _ = _fwd_impl(
        xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
        tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend, n_slots,
    )
    return out


def _fwd_impl(xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
              tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend,
              n_slots=0):
    if backend == "pallas":
        return _pallas_fwd(
            xy + xy_abs, conic, color, opacity, depth, bg, bins_arrays,
            tiles_x, tiles_y, tile_size, n_slots,
        )
    return _xla_fwd(
        xy + xy_abs, conic, color, opacity, depth, bg, bins_arrays,
        tiles_x, tiles_y, tile_size, max_per_tile, chunk,
    )


def _composite_fwd(xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
                   tiles_x, tiles_y, tile_size, max_per_tile, chunk,
                   backend="xla", n_slots=0, want_abs=True):
    out, res = _fwd_impl(
        xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
        tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend, n_slots,
    )
    saved = (xy, conic, color, opacity, depth, bg, bins_arrays, res)
    return out, saved


def _dispatch_bwd(saved, cot, tiles_x, tiles_y, tile_size, max_per_tile,
                  chunk, backend, n_slots, mode):
    if backend == "pallas":
        return _pallas_bwd(saved, cot, tiles_x, tiles_y, tile_size, n_slots,
                           mode)
    return _xla_bwd(saved, cot, tiles_x, tiles_y, tile_size, max_per_tile,
                    chunk, mode)


def _composite_bwd(tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend,
                   n_slots, want_abs, saved, cot):
    return _dispatch_bwd(
        saved, cot, tiles_x, tiles_y, tile_size, max_per_tile, chunk,
        backend, n_slots, "full" if want_abs else "noabs",
    )


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


# ---------------------------------------------------------------------------
# fused composite + AbsGS selection grads (shared-forward selection)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def composite_tiles_sel(
    xy, conic, color, opacity, depth, bg, gt, bins_arrays,
    tiles_x: int, tiles_y: int, tile_size: int, max_per_tile: int,
    chunk: int, backend: str = "xla", n_slots: int = 0,
):
    """``composite_tiles`` that ALSO emits the AbsGS selection gradients.

    Returns ``(image, alpha, depth, sel_abs)`` where ``sel_abs`` (N, 2) is
    the absolute screen-gradient of the per-view image MSE against ``gt``
    (H, W, 3) — the reference's ``means2D.grad[:, 2:4]`` selection signal
    (``network.py:865-878``) computed WITHOUT re-rendering: the forward's
    residuals feed one extra (stop-gradient) application of the backward
    kernel with the closed-form MSE cotangent.  ``sel_abs`` is a primal
    output with zero gradient; the whole construction lives inside a
    custom_vjp so outer AD never linearizes the backward kernel (whose
    pallas_call has no JVP rule).
    """
    out, _, sel_abs = _fwd_sel_impl(
        xy, conic, color, opacity, depth, bg, gt, bins_arrays,
        tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend, n_slots,
    )
    return (*out, sel_abs)


def mse_image_cotangent(image, gt):
    """d/d image of mean((clip(image)[:H,:W] - gt)^2) at tile-padded
    resolution; clip passes gradient on [0, 1] inclusive (matches
    torch.clamp in renderer.py:261).  Shared by the 3DGS and surfel fused
    selection passes."""
    H, W = gt.shape[:2]
    img_c = jnp.clip(image[:H, :W], 0.0, 1.0)
    inside = (image[:H, :W] >= 0.0) & (image[:H, :W] <= 1.0)
    cot_img = jnp.where(inside, (2.0 / (H * W * 3)) * (img_c - gt), 0.0)
    return jnp.zeros_like(image).at[:H, :W].set(cot_img)


def _fwd_sel_impl(xy, conic, color, opacity, depth, bg, gt, bins_arrays,
                  tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend,
                  n_slots=0):
    xy_abs = jnp.zeros_like(xy)
    out, res = _fwd_impl(
        xy, xy_abs, conic, color, opacity, depth, bg, bins_arrays,
        tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend, n_slots,
    )
    image = out[0]
    cot_full = mse_image_cotangent(image, gt)
    cot = (
        jax.lax.stop_gradient(cot_full),
        jnp.zeros_like(out[1]),
        jnp.zeros_like(out[2]),
    )
    sg = jax.lax.stop_gradient
    saved_sel = (
        sg(xy), sg(conic), sg(color), sg(opacity), sg(depth), sg(bg),
        bins_arrays, sg(res),
    )
    # "selonly": the selection pass consumes ONLY the AbsGS rows — the
    # kernel skips the ten other per-slot reductions
    grads = _dispatch_bwd(
        saved_sel, cot, tiles_x, tiles_y, tile_size, max_per_tile, chunk,
        backend, n_slots, "selonly",
    )
    sel_abs = sg(grads[1])                     # d_abs channels
    return out, res, sel_abs


def _composite_sel_fwd(xy, conic, color, opacity, depth, bg, gt, bins_arrays,
                       tiles_x, tiles_y, tile_size, max_per_tile, chunk,
                       backend="xla", n_slots=0):
    out, res, sel_abs = _fwd_sel_impl(
        xy, conic, color, opacity, depth, bg, gt, bins_arrays,
        tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend, n_slots,
    )
    saved = (xy, conic, color, opacity, depth, bg, bins_arrays, res, gt)
    return (*out, sel_abs), saved


def _composite_sel_bwd(tiles_x, tiles_y, tile_size, max_per_tile, chunk,
                       backend, n_slots, saved, cot):
    *saved_core, gt = saved
    *cot_img, _cot_sel = cot                   # sel_abs carries no gradient
    # "noabs": the fused variant's d_abs is internal and deleted below
    grads = _dispatch_bwd(
        tuple(saved_core), tuple(cot_img), tiles_x, tiles_y, tile_size,
        max_per_tile, chunk, backend, n_slots, "noabs",
    )
    d_xy, d_abs, d_con, d_col, d_opa, d_dep, d_bg, d_bins = grads
    del d_abs  # the zero xy_abs input is internal to the fused variant
    d_gt = jnp.zeros_like(gt)
    return (d_xy, d_con, d_col, d_opa, d_dep, d_bg, d_gt, d_bins)


composite_tiles_sel.defvjp(_composite_sel_fwd, _composite_sel_bwd)


def _bwd_common(saved, cot, tiles_x, tiles_y, ts):
    """Shared backward preamble: tiled cotangents + closed-form totals.

    Returns ``G2 = G + gTf`` pre-folded: both are per-pixel constants of
    the chunk loop, so folding them here saves one full-shape VPU pass per
    chunk in the kernels (suffix' = G2 - prefix carries the dL/dT_fin term
    for free)."""
    xy, conic, color, opacity, depth, bg, bins_arrays, res = saved
    gC_img, gA_img, gD_img = cot
    C_fin, D_fin, T_fin = res[:3]
    gC = _tile(gC_img, tiles_x, tiles_y, ts)               # (T, npix, 3)
    gA = _tile(gA_img[..., None], tiles_x, tiles_y, ts)[..., 0]
    gD = _tile(gD_img[..., None], tiles_x, tiles_y, ts)[..., 0]
    # total contribution per pixel (C_fin excludes background)
    G = jnp.sum(gC * C_fin, axis=-1) + gD * D_fin
    # dL/dT_fin term
    gTf = (jnp.sum(gC * bg[None, None, :], axis=-1) - gA) * T_fin
    d_bg = jnp.einsum("tpc,tp->c", gC, T_fin)
    return gC, gD, G + gTf, d_bg


def _grad_outputs(unpacked, d_bg, bins_arrays):
    """Unpacked per-Gaussian grads -> custom_vjp output tuple."""
    import numpy as np

    d_xy, d_abs, d_con, d_col, d_opa, d_dep = unpacked
    d_bins = tuple(
        np.zeros(np.shape(b), jax.dtypes.float0) for b in bins_arrays
    )
    return (d_xy, d_abs, d_con, d_col, d_opa, d_dep, d_bg, d_bins)


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------


def _slot_table(xy, conic, color, opacity, depth, ids):
    """One packed row gather into sorted-slot order: (P, 16)."""
    table = _pack_table(xy, conic, color, opacity, depth)
    return jnp.take(table, ids, axis=0)


def _chunk_alpha_cols(tab, X, Y):
    """Per-(slot, pixel) alpha for one gathered chunk (T, K, 16)."""
    dx = X[:, None, :] - tab[..., 0][..., None]     # (T, K, ts²)
    dy = Y[:, None, :] - tab[..., 1][..., None]
    a = tab[..., 2][..., None]
    b = tab[..., 3][..., None]
    c = tab[..., 4][..., None]
    power = jnp.minimum(
        -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy, 0.0
    )
    alpha = jnp.minimum(ALPHA_MAX, tab[..., 5][..., None] * jnp.exp(power))
    ok = alpha >= ALPHA_MIN
    return jnp.where(ok, alpha, 0.0), dx, dy


def _xla_fwd(xy, conic, color, opacity, depth, bg, bins_arrays,
             tiles_x, tiles_y, tile_size, max_per_tile, chunk):
    ids, _, _, _, _, tile_starts, tile_counts = bins_arrays
    ts = tile_size
    num_tiles = tiles_x * tiles_y
    n_chunks = -(-max_per_tile // chunk)
    X, Y = _tile_pixel_coords(tiles_x, tiles_y, ts)
    slot_tab = _slot_table(xy, conic, color, opacity, depth, ids)
    P = slot_tab.shape[0]

    def step(carry, c):
        T_raw, T_eff, C, D = carry
        base = tile_starts[:, None] + c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        in_range = (base - tile_starts[:, None]) < tile_counts[:, None]
        idx = jnp.clip(base, 0, P - 1)
        tab = jnp.take(slot_tab, idx.reshape(-1), axis=0).reshape(
            *idx.shape, 16
        )
        alpha, _, _ = _chunk_alpha_cols(tab, X, Y)
        alpha = alpha * in_range[..., None]

        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=1)
        T_exc = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
        ) * T_raw[:, None, :]
        U = T_exc * one_m
        include = (U >= T_EPS).astype(alpha.dtype)
        w = alpha * T_exc * include

        C = C + jnp.einsum(
            "tkp,tkc->tpc", w, tab[..., 6:9],
            precision=jax.lax.Precision.HIGHEST,
        )
        D = D + jnp.sum(w * tab[..., 9][..., None], axis=1)
        T_raw = T_raw * cum[:, -1, :]
        T_eff = T_eff * jnp.prod(1.0 - alpha * include, axis=1)
        return (T_raw, T_eff, C, D), None

    npix = ts * ts
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
    out = (
        _untile(image_t, tiles_x, tiles_y, ts, 3),
        _untile((1.0 - T_eff)[..., None], tiles_x, tiles_y, ts, 1)[..., 0],
        _untile(D[..., None], tiles_x, tiles_y, ts, 1)[..., 0],
    )
    return out, (C, D, T_eff)


def _xla_bwd(saved, cot, tiles_x, tiles_y, ts, max_per_tile, chunk,
             mode="full"):
    xy, conic, color, opacity, depth, bg, bins_arrays, res = saved
    ids, _, _, _, _, tile_starts, tile_counts = bins_arrays
    gC, gD, G2, d_bg = _bwd_common(saved, cot, tiles_x, tiles_y, ts)
    C_fin, D_fin, T_fin = res[:3]
    num_tiles = tiles_x * tiles_y
    n_chunks = -(-max_per_tile // chunk)
    X, Y = _tile_pixel_coords(tiles_x, tiles_y, ts)
    slot_tab = _slot_table(xy, conic, color, opacity, depth, ids)
    P = slot_tab.shape[0]

    def step(carry, c):
        T_raw, prefix, d_slab = carry
        base = tile_starts[:, None] + c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        in_range = (base - tile_starts[:, None]) < tile_counts[:, None]
        idx = jnp.clip(base, 0, P - 1)
        tab = jnp.take(slot_tab, idx.reshape(-1), axis=0).reshape(*idx.shape, 16)
        alpha, dx, dy = _chunk_alpha_cols(tab, X, Y)
        alpha = alpha * in_range[..., None]

        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=1)
        T_exc = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
        ) * T_raw[:, None, :]
        U = T_exc * one_m
        include = (U >= T_EPS).astype(alpha.dtype)
        w = alpha * T_exc * include

        contrib = (
            jnp.einsum("tpc,tkc->tkp", gC, tab[..., 6:9],
                       precision=jax.lax.Precision.HIGHEST)
            + gD[:, None, :] * tab[..., 9][..., None]
        )
        pref_inc = prefix[:, None, :] + jnp.cumsum(contrib * w, axis=1)
        suffix = G2[:, None, :] - pref_inc        # gTf pre-folded into G2
        inv_1ma = 1.0 / jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        g_alpha = include * (contrib * T_exc - suffix * inv_1ma)

        not_clamped = (alpha < ALPHA_MAX).astype(alpha.dtype)
        g_power = g_alpha * not_clamped * alpha
        a = tab[..., 2][..., None]
        b = tab[..., 3][..., None]
        cc = tab[..., 4][..., None]
        gx_px = g_power * (a * dx + b * dy)
        gy_px = g_power * (cc * dy + b * dx)

        red = lambda v: jnp.sum(v, axis=-1)
        grad_cols = jnp.stack(
            [
                red(gx_px),
                red(gy_px),
                red(g_power * (-0.5) * dx * dx),
                red(g_power * (-dx * dy)),
                red(g_power * (-0.5) * dy * dy),
                red(g_alpha * not_clamped * alpha)
                / jnp.maximum(tab[..., 5], 1e-12),
                red(w * gC[..., 0][:, None, :]),
                red(w * gC[..., 1][:, None, :]),
                red(w * gC[..., 2][:, None, :]),
                red(w * gD[:, None, :]),
                red(jnp.abs(gx_px)),
                red(jnp.abs(gy_px)),
            ],
            axis=-1,
        )  # (T, K, 12)
        grad_cols = jnp.pad(grad_cols, ((0, 0), (0, 0), (0, 4)))
        flat_idx = idx.reshape(-1)
        ok = in_range.reshape(-1)[:, None]
        d_slab = d_slab.at[flat_idx].add(
            jnp.where(ok, grad_cols.reshape(-1, 16), 0.0)
        )

        T_raw = T_raw * cum[:, -1, :]
        prefix = pref_inc[:, -1, :]
        return (T_raw, prefix, d_slab), None

    npix = ts * ts
    init = (
        jnp.ones((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((P, 16), jnp.float32),
    )
    (_, _, d_slab), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    # slot grads -> per-Gaussian grads (one row scatter-add)
    N = xy.shape[0]
    grad_rows = jnp.zeros((N, 16), jnp.float32).at[ids].add(d_slab)
    # mirror the Pallas kernel's mode contract (zeros in unconsumed rows)
    # so backend parity holds in every mode
    if mode == "noabs":
        grad_rows = grad_rows.at[:, 10:12].set(0.0)
    elif mode == "selonly":
        grad_rows = grad_rows.at[:, 0:10].set(0.0)
    return _grad_outputs(_unpack_grads(grad_rows), d_bg, bins_arrays)


# ---------------------------------------------------------------------------
# Pallas backend glue
# ---------------------------------------------------------------------------


import os

# Grad-slab -> per-Gaussian reduction strategy (A/B-able on-chip):
#   gauss      — apos in (gaussian, slot) order; one (N·D)-row gather +
#                Pallas slot-reduce (round-1 design)
#   rank       — apos in (depth-rank, slot) order: the big gather walks
#                each tile's aligned segment monotonically in rank (the
#                36MB operand is past the ~8MB random-access wall, where
#                monotone indices are ~2x cheaper — PERF.md), at the cost
#                of one extra (N, 16) gather back to gaussian order
#   *_dsum     — replace the slot-reduce kernel with D separate (N,)-index
#                gathers summed elementwise (no RED_BN padding, no kernel)
#   gauss_dsum_col — dsum as D LANE-dim gathers from the attribute-major
#                (16, M) slab (+ one pinned transpose back to rows)
#
# MEASURED (v5e, 512²/131k, chained protocol): r3 2026-08-19 gauss_dsum
# 24.2 ms/render vs gauss 35.0 — the (N·D)-row gather + RED_BN-padded
# Pallas reduce loses to D fused (N,16)-row gathers+adds by ~11ms.
# r4: gauss_dsum_col REJECTED on-chip — 33.9 r/s vs 52.2 (the lane-dim
# gather hypothesis assumed column gathers vectorize like the small-
# operand slab build; from the 37MB grad slab XLA's column gather is
# ~2x the row form instead).  gauss_dsum stays the default.
APOS_MODE = os.environ.get("GD_APOS_MODE", "gauss_dsum")


def _rank_of_id(depth_order):
    """(N,) gaussian -> global depth rank (inverse of ``depth_order``)."""
    N = depth_order.shape[0]
    return (
        jnp.zeros((N,), jnp.int32)
        .at[depth_order]
        .set(jnp.arange(N, dtype=jnp.int32))
    )


def _slab_maps(bins_arrays, num_tiles, n_slots=0, mode=None):
    """Backward index maps: (astarts, apos (n_slots,)).

    ``apos`` maps original slots to aligned grad-slab positions (M-1 = a
    never-written, zero row for dead slots).  Everything here is 1-D
    int32 sorts/cummaxes — the many-row scatter/gather formulations all
    hit serialized or strided XLA paths (5-17ms at 1M slots).

    The key layout matches the ``APOS_MODE`` reduction strategy (binning
    emits slot-major ``o = d*N + n``):
      * ``gauss_dsum`` — apos stays slot-major (``apos[d*N + n]``): the
        dsum reduction reads D contiguous (N,)-index rows, zero re-key ops
      * ``gauss``      — re-keyed gaussian-major ``n*D + d`` for the
        RED_BN-blocked Pallas slot-reduce kernel
      * ``rank*``      — gaussian replaced by its depth rank, making the
        grad-row gather walk each tile's aligned segment monotonically

    With a pair budget (P < n_slots) the sorted arrays cover only the
    surviving slots, so the inverse permutation is built by a 1-D int32
    scatter (≤1.5ms at 1M) with the dead sentinel M-1 elsewhere."""
    ids, sorted_o, sorted_valid, _, depth_order, tile_starts, tile_counts = (
        bins_arrays
    )
    P = ids.shape[0]
    mode = APOS_MODE if mode is None else mode
    astarts, pos = _aligned_layout(
        tile_starts, tile_counts, sorted_valid, P, num_tiles
    )
    N = depth_order.shape[0]
    D = max(1, (n_slots if n_slots else P) // N)
    d_of = sorted_o // jnp.int32(N)
    if mode.startswith("gauss_dsum"):
        key = sorted_o
    elif mode == "gauss":
        key = ids * D + d_of
    elif mode == "rank_dsum":
        key = d_of * N + jnp.take(_rank_of_id(depth_order), ids)
    else:  # rank
        key = jnp.take(_rank_of_id(depth_order), ids) * D + d_of
    if n_slots in (0, P) and os.environ.get("GD_APOS_INV", "sort") == "sort":
        # unstable: the key is a permutation (strictly unique)
        apos = jax.lax.sort_key_val(key, pos, is_stable=False)[1]
    else:
        M = _grad_slab_width(P, num_tiles)
        size = n_slots if n_slots not in (0, P) else P
        apos = jnp.full((size,), M - 1, jnp.int32).at[key].set(pos)
    return astarts, apos


# live grad-slab rows per backward mode (see pallas_kernels._bwd_kernel's
# gradT assembly): the dsum gathers slice the slab to these rows BEFORE
# gathering — the kernel always writes 16 rows (Mosaic's 8-row HBM slice
# granularity), but gathering the dead ones is pure wasted access traffic
# (6/16 of the dsum cost in noabs, 14/16 in selonly)
_MODE_ROWS = {"full": (0, 12), "noabs": (0, 10), "selonly": (10, 12)}


def _reduce_grad_rows(grad_al, apos, N, depth_order, width, rows=None):
    """Aligned attribute-major grad slab (width, M) -> per-Gaussian
    (N, width) sums.

    Strategy is picked by ``APOS_MODE`` (module doc above); ``apos`` must
    have been built by ``_slab_maps`` with the matching mode.  ``rows`` is
    an *optimization* honored only by the ``*_dsum`` row-gather strategies
    (the mode gate below): there the gathers read only the sliced rows and
    the returned (N, width) rows are zero-padded outside the range.  The
    'gauss' / 'rank' / 'gauss_dsum_col' strategies ignore ``rows`` and run
    the full width-row reduction — rows the kernel never writes come back
    as whatever it zero-initialized them to (zeros today), not as the
    slice/pad contract."""
    from .pallas_kernels import RED_BN, TBLK, pallas_reduce_slots

    M = grad_al.shape[1]
    D_slots = apos.shape[0] // N
    mode = APOS_MODE
    r0, r1 = (0, width) if rows is None else rows
    if mode.endswith("_dsum") and (r0, r1) != (0, width):
        # row slice of the attribute-major (width, M) slab is a contiguous
        # physical prefix/window — fuses into the gather as a view
        red = _reduce_grad_rows(
            grad_al[r0:r1], apos, N, depth_order, width=r1 - r0
        )
        return jnp.pad(red, ((0, 0), (r0, width - r1)))
    if mode == "gauss_dsum_col":
        # LANE-dim gathers from the attribute-major slab: the row-gather
        # form walks (M, 16) {0,1} rows at ~5.7ns/row (latency-bound);
        # column gathers keep the 16-sublane x M-lane layout XLA
        # vectorizes (~6x cheaper/access — same mechanism as the forward
        # slab build).  Output is (16, N); one Pallas pinned transpose
        # restores the (N, 16) row form for the unpack.
        by_slot = apos.reshape(D_slots, N)
        # f32 upcast after the FIRST gather (a no-op when the slab is f32;
        # with GD_GRAD_SLAB=bf16 the later adds then accumulate in f32)
        cols = jnp.take(grad_al, by_slot[0], axis=1, mode="clip").astype(
            jnp.float32
        )
        for d in range(1, D_slots):
            cols = cols + jnp.take(grad_al, by_slot[d], axis=1, mode="clip")
        n_pad = -(-N // TBLK) * TBLK
        if n_pad != N:
            cols = jnp.pad(cols, ((0, 0), (0, n_pad - N)))
        return pallas_transpose16_import(cols)[:N]
    # row-form strategies read the {0,1} (M, 16) view — a free bitcast of
    # the kernel's attribute-major output
    grad_rows_al = grad_al.T
    if mode.endswith("_dsum"):
        by_slot = apos.reshape(D_slots, N)
        rows = jnp.take(grad_rows_al, by_slot[0], axis=0, mode="clip").astype(
            jnp.float32
        )
        for d in range(1, D_slots):
            rows = rows + jnp.take(
                grad_rows_al, by_slot[d], axis=0, mode="clip"
            )
        red = rows
    else:
        N_pad = -(-N // RED_BN) * RED_BN
        if N_pad != N:
            apos = jnp.concatenate(
                [apos, jnp.full(((N_pad - N) * D_slots,), M - 1, jnp.int32)]
            )
        rows = jnp.take(grad_rows_al, apos, axis=0, mode="clip").astype(
            jnp.float32
        )
        red = pallas_reduce_slots(rows, N_pad, D_slots, width=width)[:N]
    if mode.startswith("rank"):
        red = jnp.take(red, _rank_of_id(depth_order), axis=0)
    return red


def pallas_transpose16_import(cols):
    from .pallas_kernels import pallas_transpose16

    return pallas_transpose16(cols)


# direct random-id gathers are fine while the attribute table stays small;
# above this the two-hop depth-order gather wins (see _sorted_slab)
DIRECT_GATHER_MAX_N = 1 << 17


def _sorted_slab(xy, conic, color, opacity, depth, ids, depth_order,
                 sorted_rank):
    """(16, P_slab) attribute-major sorted-order table, lane-padded by a
    safety CHUNK for the kernels' aligned-down overrunning DMA.

    Small N: one direct gaussian-id gather.  Large N: two-hop — depth-
    reorder the table (N-sized), then expand to slots by PIECEWISE-
    MONOTONE depth ranks.  The direct gather is random-access and hits a
    latency wall once the table outgrows ~8MB (1.9ms at 131k gaussians
    but 10.4ms at 262k); the rank gather walks each tile's segment in
    increasing order (~5ms at 262k) at a ~4% cost for small N."""
    from .pallas_kernels import CHUNK

    P = sorted_rank.shape[0]
    pad = (-P) % CHUNK + CHUNK
    table_t = _pack_table_t(xy, conic, color, opacity, depth)
    # fold the safety padding INTO the gather (pad the index vector, not
    # the output): a separate jnp.pad materializes a second full-width
    # slab copy.  Padded columns replicate gaussian 0's attributes —
    # harmless garbage: pad slots lie beyond every tile's head+count, so
    # the kernels' row-liveness fold zeroes their opacity before any use
    # (and table values are always finite, so no NaN can leak through
    # the power matmul).
    if table_t.shape[1] <= DIRECT_GATHER_MAX_N:
        idx = jnp.pad(ids, (0, pad))
        return jnp.take(table_t, idx, axis=1, mode="clip")
    depth_t = jnp.take(table_t, depth_order, axis=1, mode="clip")
    idx = jnp.pad(sorted_rank, (0, pad))
    return jnp.take(depth_t, idx, axis=1, mode="clip")


def _pallas_fwd(xy, conic, color, opacity, depth, bg, bins_arrays,
                tiles_x, tiles_y, tile_size, n_slots=0):
    from .pallas_kernels import pallas_composite_fwd

    ids, _, _, sorted_rank, depth_order, tile_starts, tile_counts = bins_arrays
    num_tiles = tiles_x * tiles_y
    astarts, apos = _slab_maps(bins_arrays, num_tiles, n_slots)
    slab_t = _sorted_slab(
        xy, conic, color, opacity, depth, ids, depth_order, sorted_rank
    )
    Cr, Cg, Cb, alpha_t, D, T_eff = pallas_composite_fwd(
        slab_t, tile_starts, tile_counts, tiles_x, tiles_y, tile_size
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
    # index maps AND the gathered sorted slab ride the residuals so the
    # backward skips both the aligned-layout recompute and the table
    # re-pack + sorted-order re-gather (~1.5ms; the slab is ~32MB at 512²
    # — small next to the activations, and remat recomputes it anyway
    # when the caller checkpoints the render)
    return out, (C, D, T_eff, astarts, apos, slab_t)


def _pallas_bwd(saved, cot, tiles_x, tiles_y, ts, n_slots=0, mode="full"):
    from .pallas_kernels import pallas_composite_bwd

    xy, conic, color, opacity, depth, bg, bins_arrays, res = saved
    ids, _, _, sorted_rank, depth_order, tile_starts, tile_counts = bins_arrays
    C_fin, D_fin, T_fin, astarts, apos, slab_t = res
    gC, gD, G2, d_bg = _bwd_common(saved, cot, tiles_x, tiles_y, ts)

    num_tiles = tiles_x * tiles_y
    M = _grad_slab_width(sorted_rank.shape[0], num_tiles)
    grad_al = pallas_composite_bwd(
        slab_t, tile_starts, tile_counts, astarts, M, gC, gD, G2,
        tiles_x, tiles_y, ts, mode=mode,
    )  # (16, M) attribute-major
    # aligned grads -> per-Gaussian grads WITHOUT a row scatter (TPU row
    # scatters serialize, ~17ms at 1M slots): gather back into the (N, D)
    # slot-expansion order via the precomputed inverse map, then reduce
    # the D slot axis (strategy per APOS_MODE; the default column form
    # gathers lanes of the attribute-major slab directly).
    grad_rows = _reduce_grad_rows(
        grad_al, apos, xy.shape[0], depth_order, width=grad_al.shape[0],
        rows=_MODE_ROWS.get(mode, (0, grad_al.shape[0])),
    )
    return _grad_outputs(_unpack_grads(grad_rows), d_bg, bins_arrays)
