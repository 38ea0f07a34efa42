"""PointSet: dense batched point cloud with validity mask + serialization.

Replaces the reference ``Point`` addict-dict (``structure.py:14-184``):
``coord/feat/offset`` CSR becomes ``(B, N, ...)`` arrays + ``(B, N)`` mask;
``serialization()`` becomes :func:`serialize_pointset`, which computes the
space-filling-curve permutations for all requested orders in one shot
(invalid points key to +max so they sort to the tail of each sample).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..serialization import encode
from ..serialization.zorder import LO_BITS

MAX_DEPTH = 16


@struct.dataclass
class PointSet:
    """A batch of fixed-budget point clouds.

    ``orders``/``inverses`` are ``(O, B, N)`` int32 permutations per
    serialization order: ``feat[b, orders[o, b]]`` is sample ``b`` in curve
    order ``o``; ``inverses`` maps back.
    """

    coord: jnp.ndarray                 # (B, N, 3) f32 world coordinates
    feat: jnp.ndarray                  # (B, N, C)
    mask: jnp.ndarray                  # (B, N) bool validity
    grid_size: float = struct.field(pytree_node=False, default=1.0)
    orders: jnp.ndarray | None = None    # (O, B, N) int32
    inverses: jnp.ndarray | None = None  # (O, B, N) int32
    global_feat: jnp.ndarray | None = None  # (B, C)
    attribute: jnp.ndarray | None = None    # (B, N, A) residual-mode attrs
    prob: jnp.ndarray | None = None         # (B, N) densification prob
    grid_coord: jnp.ndarray | None = None   # (B, N, 3) int32
    neighbor_idx: jnp.ndarray | None = None  # (B, N, 27) int32, -1 = absent
    condition: int = struct.field(pytree_node=False, default=0)
    # ^ PDNorm dataset-condition index (static: the reference condition is
    #   a per-batch dataset-name string, prompt_driven_normalization.py:30-36)

    @property
    def batch_size(self) -> int:
        return self.coord.shape[0]

    @property
    def num_points(self) -> int:
        return self.coord.shape[1]

    @property
    def num_channels(self) -> int:
        return self.feat.shape[-1]

    def valid_counts(self) -> jnp.ndarray:
        return self.mask.sum(axis=1)


def depth_for_grid(grid_size: float, extent: float = 1.0, margin_bits: int = 1) -> int:
    """Static serialization depth for a scene of ``extent`` world units.

    The reference derives depth dynamically from the max grid coordinate
    (``structure.py:64-78``); with a statically known scene box
    (``scene_size`` = 0.5 => extent 1.0, ``configs/base.yaml``) the bit
    length is a compile-time constant.
    """
    import math

    cells = max(2, int(math.ceil(extent / grid_size)) + 1)
    return min(MAX_DEPTH, cells.bit_length() + margin_bits)


def grid_quantize(coord: jnp.ndarray, mask: jnp.ndarray, grid_size: float):
    """Per-sample grid coords: floor((coord - min_valid) / grid_size).

    Matches the reference quantization (``structure.py:60-62``) with the min
    taken over valid points only.
    """
    big = jnp.float32(1e30)
    cmin = jnp.min(
        jnp.where(mask[..., None], coord, big), axis=1, keepdims=True
    )
    gc = jnp.floor((coord - cmin) / grid_size).astype(jnp.int32)
    return jnp.maximum(gc, 0)


def serialize_pointset(
    ps: PointSet,
    orders: tuple[str, ...] = ("z", "z-trans", "hilbert", "hilbert-trans"),
    depth: int | None = None,
    shuffle_key: jax.Array | None = None,
) -> PointSet:
    """Compute per-order sort permutations; optionally shuffle order slots.

    ``shuffle_key`` reproduces the reference's train-time order shuffling
    (``structure.py:98-102``): a random permutation of which order each
    block index sees.
    """
    if depth is None:
        depth = depth_for_grid(ps.grid_size)
    gc = grid_quantize(ps.coord, ps.mask, ps.grid_size)

    perms = []
    invs = []
    B, N = ps.mask.shape
    iota = jnp.arange(N, dtype=jnp.int32)
    for order in orders:
        code = encode(gc, batch=None, depth=depth, order=order)  # (B, N, 2)
        # invalid points to the tail: max out the hi word
        hi = jnp.where(ps.mask, code[..., 0], jnp.uint32(0xFFFFFFFF))
        lo = code[..., 1]

        def sort_one(h, l):
            _, _, p = jax.lax.sort(
                (h, l, iota), num_keys=2, is_stable=True
            )
            return p

        perm = jax.vmap(sort_one)(hi, lo)                       # (B, N)
        inv = jnp.zeros((B, N), jnp.int32).at[
            jnp.arange(B)[:, None], perm
        ].set(iota[None, :])
        perms.append(perm)
        invs.append(inv)

    orders_arr = jnp.stack(perms, axis=0)
    invs_arr = jnp.stack(invs, axis=0)
    if shuffle_key is not None:
        shuf = jax.random.permutation(shuffle_key, len(orders))
        orders_arr = orders_arr[shuf]
        invs_arr = invs_arr[shuf]
    return ps.replace(orders=orders_arr, inverses=invs_arr, grid_coord=gc)


def gather_points(ps: PointSet, idx: jnp.ndarray, new_mask: jnp.ndarray | None = None) -> PointSet:
    """Gather a fixed-size subset: idx (B, K) -> PointSet with N = K.

    Serialization permutations are invalidated (set to None); attributes and
    probs are carried through the gather.
    """
    take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1) if a is not None else None
    take1 = lambda a: jnp.take_along_axis(a, idx, axis=1) if a is not None else None
    mask = take1(ps.mask) if new_mask is None else new_mask
    return PointSet(
        coord=take(ps.coord),
        feat=take(ps.feat),
        mask=mask,
        grid_size=ps.grid_size,
        orders=None,
        inverses=None,
        global_feat=ps.global_feat,
        attribute=take(ps.attribute),
        prob=take1(ps.prob),
        grid_coord=take(ps.grid_coord),
    )


def compute_neighbor_idx(ps: PointSet, depth: int | None = None) -> PointSet:
    """3³ voxel-neighborhood index table for the submanifold-conv CPE.

    Replaces the reference's spconv ``SubMConv3d`` index build
    (``structure.py:108-144`` + spconv, SURVEY.md §7.3.3): per sample, pack
    grid coords into one linear uint32 key, then resolve all 27·N neighbor
    queries with ONE sort-merge join — sort the tagged union of point keys
    and query keys (points ordered before equal-keyed queries), propagate
    the latest point entry with ``cummax``, and check key equality.
    ``searchsorted`` costs ~100ms per 1M queries on TPU (PERF.md); the
    join is a ~3ms sort + 1-D ops.  Misses (empty voxels) get index -1 and
    contribute zero in the conv.  When several points share a voxel, the
    last (by sort order) represents it — an arbitrary-but-fixed collapse,
    like spconv's indice hash.
    """
    if ps.grid_coord is None:
        raise ValueError("call serialize_pointset first (needs grid_coord)")
    B, N = ps.mask.shape
    gc = ps.grid_coord + 1  # headroom so -1 offsets stay non-negative
    SHIFT = 10

    def pack(g):
        return (
            (g[..., 0].astype(jnp.uint32) << (2 * SHIFT))
            | (g[..., 1].astype(jnp.uint32) << SHIFT)
            | g[..., 2].astype(jnp.uint32)
        )

    # keys use 3*SHIFT = 30 bits; one bit of sort priority fits below
    key = jnp.where(ps.mask, pack(gc), jnp.uint32((1 << 30) - 1))

    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"), axis=-1
    ).reshape(27, 3)
    nbr_gc = gc[:, :, None, :] + offs[None, None, :, :]       # (B, N, 27, 3)
    nbr_key = pack(nbr_gc).reshape(B, N * 27)

    Q = N * 27
    M = N + Q

    def join(point_key, query_key):
        # sort key: (voxel key, is_query) — point entries first among equals
        sk = jnp.concatenate(
            [point_key << 1, (query_key << 1) | jnp.uint32(1)]
        )
        tag = jnp.arange(M, dtype=jnp.int32)       # <N: point idx, else query
        # unstable: point-before-query ordering is carried by the priority
        # bit, not by stability; among equal-keyed POINTS stability only
        # picks which co-voxel point represents the voxel — an arbitrary-
        # but-fixed collapse either way (spconv-hash semantics above), and
        # every consumer shares this one table.  XLA's stable lowering
        # carries an extra payload array (~2.5x at 537k keys, PERF.md).
        sk_s, tag_s = jax.lax.sort_key_val(sk, tag, is_stable=False)
        iota = jnp.arange(M, dtype=jnp.int32)
        # latest point entry at or before each sorted position
        prun = jax.lax.cummax(jnp.where(tag_s < N, iota, -1))
        cand_pos = jnp.clip(prun, 0, M - 1)
        hit = (prun >= 0) & ((sk_s[cand_pos] >> 1) == (sk_s >> 1))
        cand_point = tag_s[cand_pos]
        result = jnp.where(hit, cand_point, -1)
        # route each query row's answer back to its original query slot
        out = jnp.zeros((Q,), jnp.int32).at[
            jnp.where(tag_s >= N, tag_s - N, Q)
        ].set(result, mode="drop")
        return out

    nbr = jax.vmap(join)(key, nbr_key).reshape(B, N, 27)
    nbr = jnp.where(ps.mask[..., None], nbr, -1)
    return ps.replace(neighbor_idx=nbr)
