"""Tile binning: map projected Gaussians to depth-ordered per-tile slabs.

TPU design (static shapes, one sort per view — SURVEY.md §7.3.1):
  * every Gaussian owns ``max_tiles`` static slots; slot ``d`` enumerates the
    tiles of its screen bounding rect in row-major order (slots beyond the
    rect, or beyond the cap, are dead and sort to the end),
  * the sort key packs ``tile_id * N_pow2 + depth_rank`` into one int32 —
    depth rank comes from a single global depth argsort, so the per-tile
    segments of the sorted order are automatically front-to-back,
  * per-tile segment offsets are recovered with two binary searches
    (``searchsorted``) over the sorted tile ids.

Equivalent of the CUDA duplicate-keys + radix-sort + identifyTileRanges
scheme of diff-gaussian-rasterization, with a fixed duplication budget and an
``overflow`` diagnostic instead of dynamic allocation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .projection import ProjectedGaussians


@struct.dataclass
class TileBins:
    """Depth-ordered tile slabs for one view."""

    sorted_ids: jnp.ndarray    # (P,) gaussian index per sorted slot
    sorted_o: jnp.ndarray      # (P,) original slot index per sorted slot,
                               # SLOT-MAJOR: o = d * N + gaussian (so
                               # sorted_ids == sorted_o % N); lets the
                               # backward invert the sort with a cheap 1-D
                               # sort instead of a 17ms row scatter
    sorted_valid: jnp.ndarray  # (P,) bool, live slot
    sorted_rank: jnp.ndarray   # (P,) global depth rank per sorted slot —
                               # PIECEWISE-INCREASING (slots are depth-
                               # ordered within each tile), so gathering a
                               # depth-ordered table with it is cache-local
                               # (random gaussian-id gathers hit a latency
                               # wall once the table outgrows ~8MB)
    depth_order: jnp.ndarray   # (N,) depth rank -> gaussian index
    tile_starts: jnp.ndarray   # (num_tiles,) first sorted-slot of each tile
    tile_counts: jnp.ndarray   # (num_tiles,) number of live slots per tile
    overflow: jnp.ndarray      # () int32 — tiles dropped by the slot cap
    tiles_x: int = struct.field(pytree_node=False, default=0)
    tiles_y: int = struct.field(pytree_node=False, default=0)
    tile_size: int = struct.field(pytree_node=False, default=32)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def bin_gaussians(
    proj: ProjectedGaussians,
    height: int,
    width: int,
    tile_size: int = 32,
    max_tiles: int = 16,
    max_pairs: int | None = None,
    enum_tiles: int | None = None,
) -> TileBins:
    """Bin one view's projected Gaussians into per-tile depth-ordered slabs.

    ``max_pairs``: optional static budget on LIVE (gaussian, tile) pairs.
    Dead slots sort to the end, so the sorted arrays can be sliced to the
    budget — every downstream slot-space cost (slab gathers, kernels,
    grad slab) scales with it instead of the N*max_tiles worst case.
    Live pairs beyond the budget are dropped back-of-the-depth-order and
    counted in ``overflow``.

    Ellipse-tile culling: the bounding-rect expansion (CUDA
    duplicateWithKeys keeps every rect tile) is refined with a SAFE
    analytic bound — a (gaussian, tile) pair is culled only when
    ``max_px alpha < ALPHA_MIN`` is provable over the tile, in which case
    the compositor zeroes that pair's every pixel (and its gradient)
    anyway, so culling is output- and gradient-exact while shrinking all
    slot-space costs.  With ``enum_tiles > max_tiles``, that many rect
    tiles are enumerated and the survivors compacted into the
    ``max_tiles`` slot budget (a per-row sort, ~0.3ms/view at 262k —
    only worth it when rects routinely exceed the budget); the default
    enumerates exactly ``max_tiles`` and culls by masking alone.
    """
    xy = jax.lax.stop_gradient(proj.xy)
    radius = jax.lax.stop_gradient(proj.radius)
    depth = jax.lax.stop_gradient(proj.depth)
    conic = jax.lax.stop_gradient(proj.conic)
    opacity = jax.lax.stop_gradient(proj.opacity)
    valid = proj.valid

    N = xy.shape[0]
    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)
    num_tiles = tiles_x * tiles_y
    n_pow2 = _next_pow2(N)
    assert num_tiles * n_pow2 < 2**31, "int32 key overflow; shrink tiles or N"

    # global front-to-back rank (invalid last).  The inverse permutation
    # (gaussian -> rank) is ANOTHER SORT, not a scatter: the 1-D int32
    # scatter form measured 0.61ms on-chip vs ~0.1ms for the sort
    # (PERF.md data-plane rules — this was the one scatter left).
    depth_key = jnp.where(valid, depth, jnp.inf)
    iota = jnp.arange(N, dtype=jnp.int32)
    # the depth sort stays STABLE (equal-depth ties keep index order, a
    # semantic choice); its inverse sorts a permutation — strictly unique
    # keys, so stability buys nothing and XLA's stable lowering carries an
    # extra payload array (measured ~1.5x on the 524k binning sort)
    order = jax.lax.sort_key_val(depth_key, iota)[1]     # rank -> gaussian
    rank = jax.lax.sort_key_val(order, iota, is_stable=False)[1]

    # screen rect in tile units (3DGS getRect semantics)
    rmin_x = jnp.clip(((xy[:, 0] - radius) / tile_size).astype(jnp.int32), 0, tiles_x)
    rmin_y = jnp.clip(((xy[:, 1] - radius) / tile_size).astype(jnp.int32), 0, tiles_y)
    rmax_x = jnp.clip(
        ((xy[:, 0] + radius + tile_size - 1) / tile_size).astype(jnp.int32), 0, tiles_x
    )
    rmax_y = jnp.clip(
        ((xy[:, 1] + radius + tile_size - 1) / tile_size).astype(jnp.int32), 0, tiles_y
    )
    rect_w = jnp.maximum(rmax_x - rmin_x, 0)
    rect_h = jnp.maximum(rmax_y - rmin_y, 0)
    n_cover = jnp.where(valid, rect_w * rect_h, 0)       # (N,)

    # enumerate E >= D rect tiles, cull non-touching ones, compact the
    # survivors into the D = max_tiles slot budget (mask-only when E == D).
    # ALL (slot, gaussian) intermediates are slot-major (E, N): a 4-wide
    # minor dim is physically padded to 128 lanes by the TPU's T(8,128)
    # tiling, so every (N, 4) broadcast/reshape moved 32x its logical
    # bytes (~80us each, ~2.5ms/render of pure padding traffic at 131k);
    # (E, N) forms are fully lane-packed and the final flatten to the
    # d-major slot order is a free bitcast.
    E = max_tiles if enum_tiles is None else max(enum_tiles, max_tiles)
    e = jnp.arange(E, dtype=jnp.int32)[:, None]          # (E, 1)
    safe_w = jnp.maximum(rect_w, 1)[None, :]
    tile_x = rmin_x[None, :] + e % safe_w
    tile_y = rmin_y[None, :] + e // safe_w
    in_rect = (e < n_cover[None, :]) & valid[None, :]    # (E, N)

    # SAFE max-alpha-over-tile bound.  q(v) = 0.5 a vx² + b vx vy +
    # 0.5 c vy² (the compositor's power is -q), M = [[a, b], [b, c]]:
    #   q >= 0.5 λmin(M) |v|²          (circle bound, any v)
    #   q >= 0.5 λmax(M) (v·u)²       (major-eigvec directional bound)
    # with |v| >= the Euclidean distance from the Gaussian center to the
    # tile's pixel-center rect and |v·u| >= the rect's support distance
    # along u.  Cull when opa·exp(-bound) < ALPHA_MIN — then every pixel
    # of the pair fails the compositor's own alpha >= ALPHA_MIN test.
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    m = 0.5 * (ca + cc)
    r = jnp.sqrt(jnp.maximum((0.5 * (ca - cc)) ** 2 + cb * cb, 0.0))
    lam_min = jnp.maximum(m - r, 0.0)
    lam_max = m + r
    # major eigenvector: pick the better-conditioned of the two columns
    v1x, v1y = cb, lam_max - ca
    v2x, v2y = lam_max - cc, cb
    n1 = v1x * v1x + v1y * v1y
    n2 = v2x * v2x + v2y * v2y
    use1 = n1 >= n2
    ux = jnp.where(use1, v1x, v2x)
    uy = jnp.where(use1, v1y, v2y)
    un = jnp.sqrt(jnp.maximum(n1, n2))
    degen = un < 1e-20                                   # isotropic: any u
    ux = jnp.where(degen, 1.0, ux / jnp.where(degen, 1.0, un))
    uy = jnp.where(degen, 0.0, uy / jnp.where(degen, 1.0, un))
    tau = jnp.log(jnp.maximum(opacity, 1e-12) * 255.0)   # ALPHA_MIN = 1/255

    half = (tile_size - 1) * 0.5                         # pixel-center rect
    tcx = tile_x.astype(jnp.float32) * tile_size + half  # (E, N)
    tcy = tile_y.astype(jnp.float32) * tile_size + half
    cx = xy[None, :, 0] - tcx
    cy = xy[None, :, 1] - tcy
    dxr = jnp.maximum(jnp.abs(cx) - half, 0.0)
    dyr = jnp.maximum(jnp.abs(cy) - half, 0.0)
    bound = 0.5 * lam_min[None, :] * (dxr * dxr + dyr * dyr)
    du = jnp.maximum(
        jnp.abs(cx * ux[None, :] + cy * uy[None, :])
        - half * (jnp.abs(ux) + jnp.abs(uy))[None, :],
        0.0,
    )
    bound = jnp.maximum(bound, 0.5 * lam_max[None, :] * du * du)
    touch = in_rect & (bound <= tau[None, :])            # (E, N)

    if E == max_tiles:
        # rects fit the enumeration window: cull by masking, no sort
        tile_id = tile_y * tiles_x + tile_x              # (D, N)
        slot_valid = touch
        n_touch = jnp.sum(touch.astype(jnp.int32), axis=0)
    else:
        # stable compaction: touching tiles first (rect order preserved);
        # sorting along the E (sublane) axis is N independent tiny
        # networks — lane-parallel, no padded minor dim
        ckey = jnp.where(touch, e, E + e)
        ckey, tile_id_e = jax.lax.sort(
            (ckey, tile_y * tiles_x + tile_x), dimension=0, num_keys=1
        )
        tile_id = tile_id_e[:max_tiles]                  # (D, N)
        slot_valid = ckey[:max_tiles] < E
        n_touch = jnp.sum(touch.astype(jnp.int32), axis=0)
    overflow = (
        jnp.sum(jnp.maximum(n_touch - max_tiles, 0))
        + jnp.sum(jnp.maximum(n_cover - E, 0))
    ).astype(jnp.int32)

    if max_pairs is not None and max_pairs < N * max_tiles:
        # depth-principled budget: drop the pairs of the globally FARTHEST
        # gaussians first (not the sorted tail, which would clip the last
        # tiles of the image).  The per-rank live-slot histogram is NOT a
        # (N*D,)-index scatter-add (that form measured 7.6ms/render at
        # 262k on-chip, serialized — r5 step trace): each gaussian's live
        # slot count is a lane-parallel (E, N) reduce, and per_rank is
        # that count gathered through the rank->gaussian permutation.
        P = min(-(-int(max_pairs) // 1024) * 1024, N * max_tiles)
        n_slots_g = jnp.sum(slot_valid.astype(jnp.int32), axis=0)  # (N,)
        per_rank = jnp.take(n_slots_g, order, axis=0)  # rank order
        cum = jnp.cumsum(per_rank)                 # pairs up to each rank
        keep_rank = cum <= P                       # (N,) per depth rank
        n_live = jnp.sum(n_slots_g)
        kept = jnp.sum(jnp.where(keep_rank, per_rank, 0))
        overflow = overflow + (n_live - kept)
        slot_valid = slot_valid & keep_rank[rank][None, :]
    else:
        P = N * max_tiles

    dead_key = jnp.int32(2**31 - 1)
    keys = jnp.where(
        slot_valid, tile_id * n_pow2 + rank[None, :], dead_key
    ).reshape(-1)                                # free bitcast: d-major
    o = jnp.arange(N * max_tiles, dtype=jnp.int32)   # flat d * N + gaussian

    # unstable: live keys are unique (one slot per (gaussian, tile), rank
    # unique per gaussian) and dead slots — the only duplicate key — sort
    # beyond every tile segment where their order is never observed
    sorted_keys, sorted_o = jax.lax.sort_key_val(keys, o, is_stable=False)
    sorted_keys = sorted_keys[:P]
    sorted_o = sorted_o[:P]
    sorted_ids = jax.lax.rem(sorted_o, jnp.int32(N))
    sorted_rank = jax.lax.rem(sorted_keys, jnp.int32(n_pow2))
    sorted_valid = sorted_keys != dead_key
    sorted_tile = jnp.where(
        sorted_valid, sorted_keys // n_pow2, jnp.int32(num_tiles)
    )

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_starts = jnp.searchsorted(sorted_tile, tile_range, side="left").astype(
        jnp.int32
    )
    tile_ends = jnp.searchsorted(sorted_tile, tile_range, side="right").astype(
        jnp.int32
    )

    return TileBins(
        sorted_ids=sorted_ids,
        sorted_o=sorted_o,
        sorted_valid=sorted_valid,
        sorted_rank=sorted_rank,
        depth_order=order,
        tile_starts=tile_starts,
        tile_counts=tile_ends - tile_starts,
        overflow=overflow,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        tile_size=tile_size,
    )
