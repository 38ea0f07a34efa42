"""2DGS surfel rasterizer (the ``diff-surfel-rasterization`` replacement).

Each primitive is a planar (rank-2) Gaussian disk: center p, tangent axes
``sx·t_u``, ``sy·t_v`` (rotation columns), normal ``t_w``.  A pixel's value
comes from the exact ray–plane intersection expressed in splat-local (u, v)
coordinates via the homogeneous 3x3 map ``M: (u, v, 1) -> (x·w, y·w, w)``
(the 2DGS paper's h_u/h_v plane construction): for pixel (x, y),

    h_u = x·M[2] - M[0],   h_v = y·M[2] - M[1],   (u, v, 1) ∝ h_u × h_v.

TPU form: the cross product is AFFINE in the pixel coordinates —

    cr(X, Y) = Mx×My + X·(My×Mw) + Y·(Mw×Mx),
    z_hit    = det(M) / cr_z,

so each surfel carries 10 derived coefficients (three 3-vectors + det)
and a chunk's intersection test is three (CHUNK, 3) @ (3, NPIX) affine
evaluations — the surfel analogue of the 3DGS quadratic-form matmul.

Outputs mirror the reference call site (``lightning/renderer_2dgs.py:224-257``):
image, alpha, expected depth, *median* depth (depth at the T=0.5 crossing),
view-space normal map, and the per-pixel distortion accumulator used by the
2DGS regularizers (``loss.py:50-61``).

``composite_surfels`` is the differentiation boundary (like
``composite_tiles`` for 3DGS): the XLA scan backend is the semantic ground
truth whose backward is taken by autodiff (rematerialized); the Pallas
backend runs the hand-written TPU kernels in ``pallas_surfel.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..core.sh import eval_sh_color
from ..core.transforms import normalize_quat
from .binning import bin_gaussians
from .composite import _tile_pixel_coords, _untile
from .projection import ProjectedGaussians

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
NEAR_CULL = 0.2
# 2DGS object-space/screen-space filter blend (2D low-pass sigma in px)
FILTER_2D_VAR = 2.0
# Test hook (tests/test_surfel.py::test_circular_truncation_bound): False
# restores the reference CUDA rasterizer's 3σ-rect semantics
# (renderer_2dgs.py via diff-surfel-rasterization: splats contribute over
# their full bounding rect) in the XLA backend — no circle cull in
# binning, no circular cut in compositing.  The default circular
# truncation is the documented deviation: it additionally drops the
# rect-corner ring beyond the projected 3σ axis radius, where
# alpha <= opacity·e^{-4.5} ≈ 0.011·opacity.  Both repo backends share
# the deviation, so only this hook can surface it for bounding.
CIRCLE_TRUNC = True


@struct.dataclass
class SurfelOutput:
    image: jnp.ndarray        # (H, W, 3)
    alpha: jnp.ndarray        # (H, W)
    depth_expected: jnp.ndarray  # (H, W) alpha-weighted mean depth (÷ alpha)
    depth_median: jnp.ndarray    # (H, W) depth at the T=0.5 crossing
    normal: jnp.ndarray       # (H, W, 3) view-space normal (alpha-weighted)
    dist: jnp.ndarray         # (H, W) distortion accumulator
    radii: jnp.ndarray        # (N,)
    overflow: jnp.ndarray
    sel_abs: jnp.ndarray | None = None  # (N, 2) AbsGS selection grads
                                        # (only with rasterize_surfels(sel_gt=...))


def _rot_cols(q):
    """Rotation-matrix columns as (N, 3) vectors, scalar-expanded."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    c0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)],
        axis=-1,
    )
    c1 = jnp.stack(
        [2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x)],
        axis=-1,
    )
    c2 = jnp.stack(
        [2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)],
        axis=-1,
    )
    return c0, c1, c2


def _surfel_setup(means3d, scales2d, rotations, opacity, shs, camera, sh_degree):
    """Per-surfel screen maps + culling. Returns (M (N,3,3), normal_view,
    center_xy, center_depth, color, radius, valid)."""
    f32 = jnp.float32
    t_u, t_v, normal_w = _rot_cols(normalize_quat(rotations.astype(f32)))
    t_u = t_u * scales2d[..., 0:1]
    t_v = t_v * scales2d[..., 1:2]

    wvt = camera.world_view_transform  # (4,4), row-vector w2c.T
    Rv = wvt[:3, :3]                   # world->view rotation (as right-mult)
    tv = wvt[3, :3]

    p_view = means3d.astype(f32) @ Rv + tv          # (N, 3)
    tu_view = t_u @ Rv
    tv_view = t_v @ Rv
    n_view = normal_w @ Rv
    # flip normals toward the camera
    flip = jnp.sign(jnp.sum(n_view * p_view, axis=-1, keepdims=True))
    n_view = -flip * n_view

    fx, fy = camera.focal_x, camera.focal_y
    cx = (camera.width - 1.0) / 2.0
    cy = (camera.height - 1.0) / 2.0

    def pix_row(v):
        """view-space point/dir -> pixel-homogeneous rows (x·w, y·w, w)."""
        return jnp.stack(
            [
                fx * v[..., 0] + cx * v[..., 2],
                fy * v[..., 1] + cy * v[..., 2],
                v[..., 2],
            ],
            axis=-1,
        )

    # M columns are the images of (1,0,0)=t_u, (0,1,0)=t_v, (0,0,1)=center,
    # so rows of M are the (x, y, w) linear forms over (u, v, 1).
    M = jnp.stack([pix_row(tu_view), pix_row(tv_view), pix_row(p_view)], axis=-1)

    depth = p_view[..., 2]
    w = jnp.maximum(depth, 1e-6)
    center_xy = jnp.stack(
        [fx * p_view[..., 0] / w + cx, fy * p_view[..., 1] / w + cy], axis=-1
    )

    # conservative screen radius: project the four ±3σ axis endpoints
    ends = jnp.stack(
        [
            p_view + 3.0 * tu_view,
            p_view - 3.0 * tu_view,
            p_view + 3.0 * tv_view,
            p_view - 3.0 * tv_view,
        ],
        axis=1,
    )  # (N, 4, 3)
    ze = jnp.maximum(ends[..., 2], 1e-6)
    exy = jnp.stack(
        [fx * ends[..., 0] / ze + cx, fy * ends[..., 1] / ze + cy], axis=-1
    )
    radius = jnp.max(jnp.linalg.norm(exy - center_xy[:, None], axis=-1), axis=1)
    radius = jnp.ceil(radius + 3.0 * jnp.sqrt(FILTER_2D_VAR))

    valid = (depth > NEAR_CULL) & (jnp.min(ends[..., 2], axis=1) > 0.05)
    on_screen = (
        (center_xy[..., 0] + radius > 0)
        & (center_xy[..., 0] - radius < camera.width)
        & (center_xy[..., 1] + radius > 0)
        & (center_xy[..., 1] - radius < camera.height)
    )
    valid = valid & on_screen

    color = eval_sh_color(
        shs.astype(f32), means3d - camera.camera_center, sh_degree
    )
    return M, n_view, center_xy, depth, color, jnp.where(valid, radius, 0.0), valid


def _surfel_coeffs(M):
    """Affine ray-intersection coefficients from the homogeneous map.

    cr(X, Y) = acr + X·bcr + Y·ccr  (the h_u × h_v cross product), and
    z_hit = det / cr_z (the XY term Mw×Mw vanishes; the z numerator's X/Y
    terms are triple products with a repeated Mw and vanish too).
    """
    Mx, My, Mw = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    acr = jnp.cross(Mx, My)
    bcr = jnp.cross(My, Mw)
    ccr = jnp.cross(Mw, Mx)
    det = jnp.sum(Mw * acr, axis=-1)
    return acr, bcr, ccr, det


def rasterize_surfels(
    means3d,
    shs,
    opacities,
    scales2d,
    rotations,
    camera,
    bg,
    sh_degree: int = 1,
    tile_size: int = 32,
    max_tiles: int = 16,
    max_per_tile: int = 4096,
    chunk: int = 32,
    backend: str = "auto",
    enum_tiles: int | None = None,
    sel_gt: jnp.ndarray | None = None,
) -> SurfelOutput:
    """Differentiably splat N activated surfels into one camera.

    ``enum_tiles``: rect-tile enumeration window (see ``bin_gaussians``).
    Surfels carry an isotropic circle conic sized to their truncation
    radius (see below), so the ellipse cull drops the rect's corner tiles
    exactly; the window controls how many rect tiles can be enumerated
    per surfel before the ``max_tiles`` budget drops live pairs.

    ``sel_gt``: optional (H, W, 3) ground truth; when given, the output
    additionally carries ``sel_abs`` — per-surfel absolute screen-
    translation gradients of the image MSE (the fused-selection analog of
    the 3DGS path's ``composite_tiles_sel``; the reference's 2DGS closure
    consumes ``means2D.grad[:, 2:4]`` of the surfel fork,
    ``network.py:865-878``) computed from the shared forward without a
    second rasterization.
    """
    H, W = camera.height, camera.width
    N = means3d.shape[0]
    max_per_tile = min(max_per_tile, N * max_tiles)
    from .rasterizer import _resolve_backend

    backend = _resolve_backend(backend, tile_size)

    M, n_view, xy, depth, color, radius, valid = _surfel_setup(
        means3d, scales2d, rotations, opacities, shs, camera, sh_degree
    )
    acr, bcr, ccr, det = _surfel_coeffs(M)
    # Circular footprint: the compositor truncates every surfel at its
    # screen radius R (a documented truncation exactly like the CUDA
    # rasterizers' 3-sigma bounding RECT — R already includes the 2D
    # filter margin), which makes a per-(surfel, tile) circle cull EXACT
    # by construction.  Encoded as an isotropic conic lam = 2*tau/R², so
    # ``bin_gaussians``'s generic ellipse bound fires exactly at screen
    # distance d > R — surfels previously carried a zero conic and were
    # binned to their full bounding rects (round-3 probe: 9% of the bench
    # scene's live pairs were ALSO being silently dropped by the rect
    # enumeration window; the circle cull removes corner tiles instead).
    opacity_f = opacities.astype(jnp.float32)
    tau = jnp.log(jnp.maximum(opacity_f, 1e-12) * 255.0)
    # tau <= 0 (opacity <= 1/255) surfels contribute nothing anywhere
    # (alpha <= opacity < ALPHA_MIN); the positive floor keeps lam a valid
    # PSD conic so bin_gaussians' ellipse bound culls ALL their tiles
    # instead of inverting (a negative lam zeroes the bound via the
    # eigenvalue clamps, which culls everything too, but only by accident
    # of the clamp — the floor makes it structural).
    lam = 2.0 * jnp.maximum(tau, 1e-6) / jnp.maximum(radius, 1.0) ** 2
    conic_circ = jnp.stack([lam, jnp.zeros_like(lam), lam], axis=-1)
    if not CIRCLE_TRUNC:  # test hook (module doc): bin full bounding rects
        conic_circ = jnp.zeros_like(conic_circ)
    proj = ProjectedGaussians(
        xy=xy, depth=depth, conic=conic_circ, color=color,
        opacity=opacity_f, radius=radius, valid=valid,
    )
    bins = bin_gaussians(
        proj, H, W, tile_size=tile_size, max_tiles=max_tiles,
        enum_tiles=enum_tiles,
    )

    opacity_eff = jnp.where(valid, proj.opacity, 0.0)
    comp_args = (
        acr, bcr, ccr, det, xy, jax.lax.stop_gradient(radius), color,
        opacity_eff, n_view,
        bg.astype(jnp.float32),
        jnp.asarray(camera.znear, jnp.float32),
        jnp.asarray(camera.zfar, jnp.float32),
    )
    bins_arrays = (
        bins.sorted_ids, bins.sorted_o, bins.sorted_valid,
        bins.sorted_rank, bins.depth_order,
        # clamp the per-tile cap into the counts once so both backends
        # composite the same slots on overflow (rasterizer.py rationale)
        bins.tile_starts, jnp.minimum(bins.tile_counts, max_per_tile),
    )
    dims = (bins.tiles_x, bins.tiles_y, tile_size, max_per_tile, chunk,
            backend)
    sel_abs = None
    if sel_gt is not None:
        *maps, sel_abs = composite_surfels_sel(
            *comp_args, sel_gt.astype(jnp.float32), bins_arrays, *dims
        )
        from jax.ad_checkpoint import checkpoint_name

        sel_abs = checkpoint_name(sel_abs, "sel_abs")
    else:
        maps = composite_surfels(*comp_args, bins_arrays, *dims)
    cap_overflow = jnp.sum(
        jnp.maximum(bins.tile_counts - max_per_tile, 0)
    ).astype(jnp.int32)
    image, alpha_map, Dexp, Dmed, Nacc, dist = maps
    return SurfelOutput(
        image=jnp.clip(image[:H, :W], 0.0, 1.0),
        alpha=alpha_map[:H, :W],
        depth_expected=Dexp[:H, :W],
        depth_median=Dmed[:H, :W],
        normal=Nacc[:H, :W],
        dist=dist[:H, :W],
        radii=radius,
        overflow=bins.overflow + cap_overflow,
        sel_abs=sel_abs,
    )


# ---------------------------------------------------------------------------
# compositing boundary (custom VJP; XLA scan = ground truth, Pallas = TPU)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18))
def composite_surfels(
    acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear, zfar,
    bins_arrays,
    tiles_x: int, tiles_y: int, tile_size: int,
    max_per_tile: int, chunk: int, backend: str = "xla",
):
    """Composite N surfels -> (image, alpha, depth_exp, depth_med, normal,
    dist), each (Ht, Wt[, ch]) at tile-padded resolution.

    ``rad``: (N,) screen truncation radius (non-differentiable) — pixels
    farther than ``rad`` from the filter center contribute exactly zero,
    making the binning's circle cull output-exact."""
    out, _ = _fwd_impl(
        acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear, zfar,
        bins_arrays, tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend,
    )
    return out


def _fwd_impl(acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg,
              znear, zfar, bins_arrays, tiles_x, tiles_y, tile_size,
              max_per_tile, chunk, backend):
    if backend == "pallas":
        from .pallas_surfel import pallas_surfel_fwd

        return pallas_surfel_fwd(
            acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear,
            zfar, bins_arrays, tiles_x, tiles_y, tile_size,
        )
    out = _xla_scan_fwd(
        acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear, zfar,
        bins_arrays, tiles_x, tiles_y, tile_size, max_per_tile, chunk,
    )
    return out, None


def _composite_fwd(acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg,
                   znear, zfar, bins_arrays, tiles_x, tiles_y, tile_size,
                   max_per_tile, chunk, backend="xla"):
    out, res = _fwd_impl(
        acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear, zfar,
        bins_arrays, tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend,
    )
    saved = (acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear,
             zfar, bins_arrays, res, out)
    return out, saved


def _composite_bwd(tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend,
                   saved, cot):
    (acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear, zfar,
     bins_arrays, res, out) = saved
    if backend == "pallas":
        from .pallas_surfel import pallas_surfel_bwd

        grads, _ = pallas_surfel_bwd(
            saved, cot, tiles_x, tiles_y, tile_size,
        )
        grads = (*grads[:5], jnp.zeros_like(rad), *grads[5:])
    else:
        # ground-truth backend: recompute-and-autodiff through the scan
        def f(acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg):
            return _xla_scan_fwd(
                acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg,
                znear, zfar, bins_arrays, tiles_x, tiles_y, tile_size,
                max_per_tile, chunk,
            )

        _, vjp = jax.vjp(
            f, acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg
        )
        grads = vjp(cot)
    import numpy as np

    d_bins = tuple(
        np.zeros(np.shape(b), jax.dtypes.float0) for b in bins_arrays
    )
    zero = jnp.zeros((), jnp.float32)
    return (*grads, zero, zero, d_bins)


composite_surfels.defvjp(_composite_fwd, _composite_bwd)


# ---------------------------------------------------------------------------
# fused composite + AbsGS selection grads (shared-forward selection)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18, 19))
def composite_surfels_sel(
    acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear, zfar,
    gt, bins_arrays,
    tiles_x: int, tiles_y: int, tile_size: int,
    max_per_tile: int, chunk: int, backend: str = "xla",
):
    """``composite_surfels`` that ALSO emits the AbsGS selection grads.

    ``sel_abs`` (N, 2) = per-pixel-absolute screen-translation gradients
    of the image MSE against ``gt``: translating a surfel by (ox, oy) in
    screen space perturbs its affine intersection coefficients
    (a -> a - B·ox - C·oy) and its 2D-filter center (p -> p + o), so the
    per-pixel gradient is a branch-select of terms the backward already
    forms.  Mirrors ``composite.composite_tiles_sel``: one extra
    (stop-gradient) backward application with the closed-form MSE
    cotangent, zero second rasterization; sel_abs is a zero-gradient
    primal output."""
    out, _, sel_abs = _fwd_sel_impl(
        acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear,
        zfar, gt, bins_arrays, tiles_x, tiles_y, tile_size, max_per_tile,
        chunk, backend,
    )
    return (*out, sel_abs)


def _fwd_sel_impl(acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg,
                  znear, zfar, gt, bins_arrays, tiles_x, tiles_y, tile_size,
                  max_per_tile, chunk, backend):
    from .composite import mse_image_cotangent

    out, res = _fwd_impl(
        acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear,
        zfar, bins_arrays, tiles_x, tiles_y, tile_size, max_per_tile, chunk,
        backend,
    )
    cot_full = jax.lax.stop_gradient(mse_image_cotangent(out[0], gt))
    sg = jax.lax.stop_gradient
    if backend == "pallas":
        from .pallas_surfel import pallas_surfel_bwd

        cot = (
            cot_full,
            jnp.zeros_like(out[1]), jnp.zeros_like(out[2]),
            jnp.zeros_like(out[3]), jnp.zeros_like(out[4]),
            jnp.zeros_like(out[5]),
        )
        saved_sel = (
            sg(acr), sg(bcr), sg(ccr), sg(det), sg(xy), sg(rad), sg(color),
            sg(opacity), sg(normal), sg(bg), znear, zfar, bins_arrays,
            sg(res), jax.tree.map(sg, out),
        )
        _, sel_abs = pallas_surfel_bwd(
            saved_sel, cot, tiles_x, tiles_y, tile_size, mode="selonly"
        )
    else:
        sel_abs = _xla_sel_abs(
            sg(acr), sg(bcr), sg(ccr), sg(det), sg(xy), sg(rad), sg(color),
            sg(opacity), sg(bg), cot_full, jax.tree.map(sg, out),
            bins_arrays, tiles_x, tiles_y, tile_size, max_per_tile, chunk,
        )
    return out, res, jax.lax.stop_gradient(sel_abs)


def _composite_sel_fwd(acr, bcr, ccr, det, xy, rad, color, opacity, normal,
                       bg, znear, zfar, gt, bins_arrays, tiles_x, tiles_y,
                       tile_size, max_per_tile, chunk, backend="xla"):
    out, res, sel_abs = _fwd_sel_impl(
        acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear,
        zfar, gt, bins_arrays, tiles_x, tiles_y, tile_size, max_per_tile,
        chunk, backend,
    )
    saved = (acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg, znear,
             zfar, bins_arrays, res, out, jax.lax.stop_gradient(gt))
    return (*out, sel_abs), saved


def _composite_sel_bwd(tiles_x, tiles_y, tile_size, max_per_tile, chunk,
                       backend, saved, cot):
    *saved_inner, gt = saved
    *cot_out, _cot_sel = cot   # sel_abs is a zero-gradient primal output
    grads = _composite_bwd(
        tiles_x, tiles_y, tile_size, max_per_tile, chunk, backend,
        tuple(saved_inner), tuple(cot_out),
    )
    # _composite_bwd returns (*10 arg grads incl. rad, d_znear, d_zfar,
    # d_bins); insert the zero gt grad between zfar and bins
    return (*grads[:12], jnp.zeros_like(gt), grads[12])


composite_surfels_sel.defvjp(_composite_sel_fwd, _composite_sel_bwd)


def _xla_scan_fwd(acr, bcr, ccr, det, xy, rad, color, opacity, normal, bg,
                  znear, zfar, bins_arrays, tiles_x, tiles_y, tile_size,
                  max_per_tile, chunk):
    ids, _, s_ok_full, _, _, starts, counts = bins_arrays
    N = xy.shape[0]
    ts = tile_size
    num_tiles = tiles_x * tiles_y
    npix = ts * ts
    n_chunks = -(-max_per_tile // chunk)
    X, Y = _tile_pixel_coords(tiles_x, tiles_y, ts)

    coef = jnp.concatenate(
        [acr, bcr, ccr, det[:, None], xy, color, opacity[:, None], normal,
         jax.lax.stop_gradient(rad)[:, None]],
        axis=-1,
    )  # (N, 20)
    s_coef = jnp.take(coef, ids, axis=0)
    s_ok = s_ok_full
    P = s_coef.shape[0]

    def map_depth(z):
        return zfar / (zfar - znear) * (1.0 - znear / jnp.maximum(z, 1e-6))

    def step(carry, c):
        (T, C, Dexp, Dmed, Nacc, m1, m2, dist) = carry
        base = starts[:, None] + c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        in_range = (base - starts[:, None]) < counts[:, None]
        idx = jnp.clip(base, 0, P - 1)
        g = jnp.take(s_coef, idx.reshape(-1), axis=0).reshape(*idx.shape, 20)
        gok = jnp.take(s_ok, idx.reshape(-1), axis=0).reshape(idx.shape) & in_range

        xs = X[:, None, :]                 # (T,1,npix)
        ys = Y[:, None, :]
        # cr = acr + X*bcr + Y*ccr, per component
        crx = g[..., 0:1] + xs * g[..., 3:4] + ys * g[..., 6:7]
        cry = g[..., 1:2] + xs * g[..., 4:5] + ys * g[..., 7:8]
        crz = g[..., 2:3] + xs * g[..., 5:6] + ys * g[..., 8:9]
        safe = jnp.where(jnp.abs(crz) < 1e-8, 1e-8, crz)
        rz = 1.0 / safe
        u = crx * rz
        v = cry * rz
        g3d = -0.5 * (u * u + v * v)
        # screen-space low-pass (2D filter around the projected center)
        dx = xs - g[..., 10:11]
        dy = ys - g[..., 11:12]
        g2d = -0.5 * (dx * dx + dy * dy) / FILTER_2D_VAR
        power = jnp.maximum(g3d, g2d)
        zhit = g[..., 9:10] * rz           # det / cr_z
        gopa = g[..., 15:16]
        alpha = jnp.minimum(ALPHA_MAX, gopa * jnp.exp(power))
        # hard circular truncation at the screen radius — makes the
        # binning's circle cull output-exact (see rasterize_surfels)
        rcut = g[..., 19:20]
        in_circle = (dx * dx + dy * dy) <= rcut * rcut
        if not CIRCLE_TRUNC:  # module-doc test hook: rect semantics
            in_circle = jnp.ones_like(in_circle)
        ok = (
            (power <= 0.0) & (alpha >= ALPHA_MIN) & gok[..., None]
            & (zhit > NEAR_CULL) & in_circle
        )
        alpha = jnp.where(ok, alpha, 0.0)

        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=1)
        T_exc = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
        T_exc = T_exc * T[:, None, :]
        U = T_exc * one_m
        include = (U >= T_EPS).astype(alpha.dtype)
        w = alpha * T_exc * include        # (T,K,npix)

        m = map_depth(zhit)
        # incremental distortion (2DGS): for each slot i front-to-back,
        #   dist += w_i * (m_i^2 * A_<i + M2_<i - 2 m_i * M1_<i)
        # where A/M1/M2 are running sums of w, w*m, w*m^2 before i.
        # A_<i = 1 - T_exc_i (total composited weight so far).
        wm = w * m
        wm2 = w * m * m
        m1_prefix = m1[:, None, :] + jnp.cumsum(wm, axis=1) - wm
        m2_prefix = m2[:, None, :] + jnp.cumsum(wm2, axis=1) - wm2
        a_prefix = 1.0 - T_exc
        dist_add = w * (m * m * a_prefix + m2_prefix - 2.0 * m * m1_prefix)

        C = C + jnp.einsum("tkp,tkc->tpc", w, g[..., 12:15],
                           precision=jax.lax.Precision.HIGHEST)
        Dexp = Dexp + jnp.sum(w * zhit, axis=1)
        Nacc = Nacc + jnp.einsum("tkp,tkc->tpc", w, g[..., 16:19],
                                 precision=jax.lax.Precision.HIGHEST)
        dist = dist + jnp.sum(dist_add, axis=1)
        m1 = m1 + jnp.sum(wm, axis=1)
        m2 = m2 + jnp.sum(wm2, axis=1)

        # median depth: first slot where transmittance after crosses 0.5
        crossed = (T_exc > 0.5) & (U < 0.5) & (alpha > 0)
        zmed = jnp.where(crossed, zhit, 0.0).sum(axis=1)
        any_cross = crossed.any(axis=1)
        Dmed = jnp.where((Dmed == 0.0) & any_cross, zmed, Dmed)

        T = T * jnp.prod(1.0 - alpha * include, axis=1)
        return (T, C, Dexp, Dmed, Nacc, m1, m2, dist), None

    init = (
        jnp.ones((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix, 3), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix, 3), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
    )
    (T, C, Dexp, Dmed, Nacc, _, _, dist), _ = jax.lax.scan(
        jax.checkpoint(step), init, jnp.arange(n_chunks, dtype=jnp.int32)
    )

    alpha_map = 1.0 - T
    image = C + T[..., None] * bg[None, None, :]
    un = lambda x, ch: (
        _untile(x if x.ndim == 3 else x[..., None], tiles_x, tiles_y, ts, ch)
    )
    return (
        un(image, 3), un(alpha_map, 1)[..., 0], un(Dexp, 1)[..., 0],
        un(Dmed, 1)[..., 0], un(Nacc, 3), un(dist, 1)[..., 0],
    )


def _xla_sel_abs(acr, bcr, ccr, det, xy, rad, color, opacity, bg, cot_full,
                 out, bins_arrays, tiles_x, tiles_y, tile_size, max_per_tile,
                 chunk):
    """Ground-truth AbsGS selection grads for the XLA backend.

    Hand-written image-path backward (the scan backend's normal grads come
    from autodiff, which cannot produce per-pixel ABS accumulation): per
    pixel, g_alpha via the suffix trick with the image-MSE cotangent, then
    the screen-translation chain — 3D branch through the affine
    coefficients (∂cr/∂ox = -B, ∂cr/∂oy = -C), 2D branch through the
    filter center — abs-summed per pixel into (N, 2)."""
    from .composite import _tile

    ids, _, s_ok_full, _, _, starts, counts = bins_arrays
    N = xy.shape[0]
    ts = tile_size
    npix = ts * ts
    n_chunks = -(-max_per_tile // chunk)
    X, Y = _tile_pixel_coords(tiles_x, tiles_y, ts)

    image, alpha_map = out[0], out[1]
    cot_t = _tile(cot_full, tiles_x, tiles_y, ts)         # (T, npix, 3)
    T_fin = _tile((1.0 - alpha_map)[..., None], tiles_x, tiles_y, ts)[..., 0]
    img_t = _tile(image, tiles_x, tiles_y, ts)
    # G = Σ cw·w = cot · (image - T_fin·bg);  gTf = (cot·bg)·T_fin
    C_t = img_t - T_fin[..., None] * bg[None, None, :]
    G = jnp.einsum("tpc,tpc->tp", cot_t, C_t)
    gTf = jnp.einsum("tpc,c->tp", cot_t, bg) * T_fin

    coef = jnp.concatenate(
        [acr, bcr, ccr, det[:, None], xy, color, opacity[:, None],
         rad[:, None]], axis=-1,
    )  # (N, 17)
    s_coef = jnp.take(coef, ids, axis=0)
    P = s_coef.shape[0]

    def step(carry, c):
        T, pref, acc = carry
        base = (
            starts[:, None] + c * chunk
            + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        )
        in_range = (base - starts[:, None]) < counts[:, None]
        idx = jnp.clip(base, 0, P - 1)
        g = jnp.take(s_coef, idx.reshape(-1), axis=0).reshape(*idx.shape, 17)
        gok = (
            jnp.take(s_ok_full, idx.reshape(-1), axis=0).reshape(idx.shape)
            & in_range
        )

        xs = X[:, None, :]
        ys = Y[:, None, :]
        crx = g[..., 0:1] + xs * g[..., 3:4] + ys * g[..., 6:7]
        cry = g[..., 1:2] + xs * g[..., 4:5] + ys * g[..., 7:8]
        crz = g[..., 2:3] + xs * g[..., 5:6] + ys * g[..., 8:9]
        safe = jnp.where(jnp.abs(crz) < 1e-8, 1e-8, crz)
        rz = 1.0 / safe
        u = crx * rz
        v = cry * rz
        g3d = -0.5 * (u * u + v * v)
        dx = xs - g[..., 10:11]
        dy = ys - g[..., 11:12]
        g2d = -0.5 * (dx * dx + dy * dy) / FILTER_2D_VAR
        power = jnp.maximum(g3d, g2d)
        zhit = g[..., 9:10] * rz
        alpha = jnp.minimum(ALPHA_MAX, g[..., 15:16] * jnp.exp(power))
        rcut = g[..., 16:17]
        in_circle = (dx * dx + dy * dy) <= rcut * rcut
        if not CIRCLE_TRUNC:  # module-doc test hook: rect semantics
            in_circle = jnp.ones_like(in_circle)
        ok = (
            (power <= 0.0) & (alpha >= ALPHA_MIN) & gok[..., None]
            & (zhit > NEAR_CULL) & in_circle
        )
        alpha = jnp.where(ok, alpha, 0.0)

        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=1)
        T_exc = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
        ) * T[:, None, :]
        U = T_exc * one_m
        include = (U >= T_EPS).astype(alpha.dtype)
        Tinc = T_exc * include
        w = alpha * Tinc

        cw = jnp.einsum("tkc,tpc->tkp", g[..., 12:15], cot_t)
        # inclusive per-chunk prefix of Σ cw·w (suffix trick)
        pref_rows = pref[:, None, :] + jnp.cumsum(cw * w, axis=1)
        suffix = G[:, None, :] - pref_rows
        inv_1ma = 1.0 / jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        inc_m = (Tinc > 0.0).astype(alpha.dtype)
        g_alpha = inc_m * (cw * Tinc - (suffix + gTf[:, None, :]) * inv_1ma)
        not_clamped = (alpha < ALPHA_MAX).astype(alpha.dtype)
        g_power = g_alpha * not_clamped * alpha

        sel3 = (g3d >= g2d).astype(alpha.dtype)
        g3 = g_power * sel3
        g2 = g_power * (1.0 - sel3)
        rz2 = rz * rz
        d_crx = -crx * rz2 * g3
        d_cry = -cry * rz2 * g3
        d_crz = (crx * crx + cry * cry) * rz2 * rz * g3
        gx = (
            -(d_crx * g[..., 3:4] + d_cry * g[..., 4:5] + d_crz * g[..., 5:6])
            + g2 * dx / FILTER_2D_VAR
        )
        gy = (
            -(d_crx * g[..., 6:7] + d_cry * g[..., 7:8] + d_crz * g[..., 8:9])
            + g2 * dy / FILTER_2D_VAR
        )
        sax = jnp.sum(jnp.abs(gx), axis=-1)            # (T, K)
        say = jnp.sum(jnp.abs(gy), axis=-1)
        gid = jnp.take(ids, idx.reshape(-1), axis=0)
        acc = acc.at[gid].add(
            jnp.stack([sax.reshape(-1), say.reshape(-1)], axis=-1)
        )

        T = T * jnp.prod(1.0 - alpha * include, axis=1)
        pref = pref_rows[:, -1, :]
        return (T, pref, acc), None

    num_tiles = tiles_x * tiles_y
    init = (
        jnp.ones((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((N, 2), jnp.float32),
    )
    (_, _, acc), _ = jax.lax.scan(
        jax.checkpoint(step), init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return acc


def depth_to_normal(depth: jnp.ndarray, rays: jnp.ndarray, alpha: jnp.ndarray):
    """Pseudo surface normal from a depth map via cross products of the
    ray-lifted point grid (``renderer_2dgs.py:75-90``)."""
    o, d = rays[..., :3], rays[..., 3:6]
    pts = o + d * depth[..., None]
    dx = pts[2:, 1:-1] - pts[:-2, 1:-1]
    dy = pts[1:-1, 2:] - pts[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # eps-inside-sqrt normalize: linalg.norm has a NaN gradient at the
    # all-zero normals of empty/background pixels
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    out = jnp.zeros_like(pts)
    out = out.at[1:-1, 1:-1].set(n)
    return out * (alpha[..., None] > 0.05)


class Renderer2DGS:
    """Object wrapper mirroring the reference 2DGS ``Renderer`` surface
    (``renderer_2dgs.py:98-283``): returns the extra ``rend_normal`` /
    ``depth_normal`` / ``rend_dist`` keys that trigger the 2DGS
    regularizers in the loss."""

    def __init__(self, sh_degree: int = 1, white_background: bool = True,
                 radius: float = 1.0, depth_ratio: float = 0.0):
        self.sh_degree = sh_degree
        self.bg_color = jnp.ones(3) if white_background else jnp.zeros(3)
        self.radius = radius
        self.depth_ratio = depth_ratio

    def render_img(self, cam, rays, centers, shs, opacity, scales, rotations,
                   bg_color=None, prex: str = "", **kw) -> dict:
        bg = self.bg_color if bg_color is None else jnp.asarray(bg_color)
        sh = shs.reshape(shs.shape[0], -1, 3)
        out = rasterize_surfels(
            centers, sh, opacity.reshape(-1), scales[..., :2], rotations,
            cam, bg, self.sh_degree, **kw,
        )
        alpha = out.alpha
        exp_norm = out.depth_expected / jnp.maximum(alpha, 1e-6)
        surf_depth = (
            (1.0 - self.depth_ratio) * exp_norm + self.depth_ratio * out.depth_median
        )
        # world-space rendered normal (reference rotates view->world)
        wvt = cam.world_view_transform
        rend_normal_world = out.normal @ wvt[:3, :3].T
        result = {
            f"image{prex}": out.image,
            f"depth{prex}": surf_depth[..., None],
            f"acc_map{prex}": alpha,
            f"rend_dist{prex}": out.dist,
            f"rend_normal{prex}": rend_normal_world,
            f"radii{prex}": out.radii,
        }
        if rays is not None:
            result[f"depth_normal{prex}"] = depth_to_normal(surf_depth, rays, alpha)
        return result
