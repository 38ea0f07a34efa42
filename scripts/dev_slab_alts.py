"""Microbench alternatives for building the (16, P_al) attribute-major slab.

Variants (consumer is always the real pallas_composite_fwd so layout
assignment behaves as in production):
  cur    — row gather + (P_al,16) row scatter + .T  (known ~70-90ms fusion)
  srcal  — 1-D int32 scatter of ids into aligned space, row gather
           (P_al,16), Pallas transpose kernel -> (16, P_al)
  xt     — same but plain jnp .T instead of the Pallas transpose
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat.projection import project_gaussians
from generativedensification_tpu.splat.binning import bin_gaussians
from generativedensification_tpu.splat.composite import (
    _pack_table, _aligned_layout, _pallas_slab, _untile,
)
from generativedensification_tpu.splat.pallas_kernels import (
    CHUNK, SLAB_W, pallas_composite_fwd,
)

rng = np.random.default_rng(0)
n = 131072; H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32))
scales = jnp.exp(jnp.asarray(rng.uniform(np.log(0.002), np.log(0.01), size=(n, 3)), jnp.float32))
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)
bg = jnp.ones(3)

proj = jax.jit(lambda: project_gaussians(means, None, shs, opa, cam, 1, scales=scales, rotations=quats))()
bins = jax.jit(lambda: bin_gaussians(proj, H, W, 32, 8))()
ids, tile_starts, tile_counts = bins.sorted_ids, bins.tile_starts, bins.tile_counts
tiles_x, tiles_y, ts = bins.tiles_x, bins.tiles_y, 32
num_tiles = tiles_x * tiles_y
xy, conic, color, opacity, depth = proj.xy, proj.conic, proj.color, jnp.where(proj.valid, proj.opacity, 0.), proj.depth
P = ids.shape[0]

def timeit(f, *a, iters=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


# ---------------- pallas transpose kernel ----------------

BLK = 2048

def _transpose_kernel(rows_ref, out_ref):
    out_ref[:, :] = jax.lax.dot_general(
        jnp.eye(SLAB_W, dtype=jnp.float32), rows_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

def pallas_transpose16(rows):
    M = rows.shape[0]
    assert M % BLK == 0, M
    return pl.pallas_call(
        _transpose_kernel,
        out_shape=jax.ShapeDtypeStruct((SLAB_W, M), jnp.float32),
        grid=(M // BLK,),
        in_specs=[pl.BlockSpec((BLK, SLAB_W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((SLAB_W, BLK), lambda i: (0, i)),
    )(rows)


def _round_up(x, m):
    return (x + m - 1) // m * m


def slab_srcal(xy, conic, color, opacity, depth, transpose):
    astarts, pos, live, P_al = _aligned_layout(tile_starts, tile_counts, P, num_tiles)
    M = _round_up(P_al + CHUNK, BLK)
    src = jnp.full((M,), n, jnp.int32).at[pos].set(
        ids, mode="drop", unique_indices=True, indices_are_sorted=True)
    table = _pack_table(xy, conic, color, opacity, depth)
    table_pad = jnp.concatenate([table, jnp.zeros((1, SLAB_W), jnp.float32)])
    rows = jnp.take(table_pad, src, axis=0, mode="clip")
    if transpose == "pallas":
        slab_t = pallas_transpose16(rows)
    else:
        slab_t = rows.T
    return slab_t, astarts


def fwd_with(slab_fn):
    def f(xy, conic, color, opacity, depth):
        slab_t, astarts = slab_fn(xy, conic, color, opacity, depth)
        Cr, Cg, Cb, alpha_t, D, T_eff = pallas_composite_fwd(
            slab_t, astarts, tile_counts, tiles_x, tiles_y, ts)
        npix = ts * ts
        C = jnp.stack([Cr, Cg, Cb], axis=-1).reshape(num_tiles, npix, 3)
        alpha_t = alpha_t.reshape(num_tiles, npix)
        T_eff = 1.0 - alpha_t
        image_t = C + T_eff[..., None] * bg[None, None, :]
        return _untile(image_t, tiles_x, tiles_y, ts, 3)
    return jax.jit(f)


def slab_cur(xy, conic, color, opacity, depth):
    slab_t, astarts, _, _, _ = _pallas_slab(
        xy, conic, color, opacity, depth, (ids, tile_starts, tile_counts), num_tiles)
    return slab_t, astarts


f_cur = fwd_with(slab_cur)
f_srcal = fwd_with(functools.partial(slab_srcal, transpose="pallas"))
f_xt = fwd_with(functools.partial(slab_srcal, transpose="xla"))

args = (xy, conic, color, opacity, depth)
img_cur = f_cur(*args)
img_srcal = f_srcal(*args)
img_xt = f_xt(*args)
print("max |cur-srcal|:", float(jnp.abs(img_cur - img_srcal).max()))
print("max |cur-xt|   :", float(jnp.abs(img_cur - img_xt).max()))

print("fwd cur   :", timeit(f_cur, *args), "ms")
print("fwd srcal :", timeit(f_srcal, *args), "ms")
print("fwd xt    :", timeit(f_xt, *args), "ms")

# isolated slab-build timings (block on slab output directly)
for name, fn in [
    ("slab cur", jax.jit(lambda *a: slab_cur(*a)[0])),
    ("slab srcal", jax.jit(lambda *a: slab_srcal(*a, transpose="pallas")[0])),
    ("slab xt", jax.jit(lambda *a: slab_srcal(*a, transpose="xla")[0])),
]:
    print(name, ":", timeit(fn, *args), "ms")
