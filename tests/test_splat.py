"""Rasterizer validation against a naive per-pixel splatter (SURVEY.md §4c).

The naive reference composites every Gaussian for every pixel with plain
cumprod math (no tiling, no sorting tricks) and is differentiable by plain
autodiff — the tiled engine must match it in both forward values and
gradients, including the hand-written custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generativedensification_tpu.core import Camera, normalize_quat
from generativedensification_tpu.splat import (
    bin_gaussians,
    project_gaussians,
    rasterize,
)

H = W = 64
TILE = 16
SH_DEG = 1


def _camera():
    c2w = np.eye(4)
    c2w[2, 3] = -2.0  # camera on -z looking at origin (aligned convention)
    return Camera.from_c2w(jnp.asarray(c2w), 0.9, 0.9, W, H, znear=0.01, zfar=10.0)


def _scene(n=80, seed=0, opa_max=0.3):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.45, 0.45, size=(n, 3))
    shs = rng.normal(size=(n, 4, 3)) * 0.3
    shs[:, 0] += 0.8
    opa = rng.uniform(0.05, opa_max, size=(n,))
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.1), size=(n, 3)))
    quats = rng.normal(size=(n, 4))
    return tuple(
        jnp.asarray(a, jnp.float32) for a in (means, shs, opa, scales, quats)
    )


def naive_render(means, shs, opa, scales, quats, cam, bg, tile_size=TILE):
    """Independent per-pixel compositor over globally depth-sorted Gaussians."""
    proj = project_gaussians(
        means, None, shs, opa, cam, SH_DEG,
        scales=scales, rotations=normalize_quat(quats),
    )
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    xy = proj.xy[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opac = jnp.where(proj.valid, proj.opacity, 0.0)[order]
    depth = proj.depth[order]
    radius = proj.radius[order]

    px = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0).reshape(-1)
    py = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1).reshape(-1)

    dx = px[None, :] - xy[:, 0:1]
    dy = py[None, :] - xy[:, 1:2]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(0.99, opac[:, None] * jnp.exp(power))
    # replicate the tiled engine's rect membership (tile-quantized 3σ box)
    tmin_x = jnp.floor((xy[:, 0:1] - radius[:, None]) / tile_size) * tile_size
    tmin_y = jnp.floor((xy[:, 1:2] - radius[:, None]) / tile_size) * tile_size
    tmax_x = jnp.ceil((xy[:, 0:1] + radius[:, None]) / tile_size) * tile_size
    tmax_y = jnp.ceil((xy[:, 1:2] + radius[:, None]) / tile_size) * tile_size
    in_rect = (
        (px[None, :] >= tmin_x) & (px[None, :] < tmax_x)
        & (py[None, :] >= tmin_y) & (py[None, :] < tmax_y)
    )
    ok = (power <= 0) & (alpha >= 1.0 / 255.0) & in_rect
    alpha = jnp.where(ok, alpha, 0.0)

    one_m = 1.0 - alpha
    cum = jnp.cumprod(one_m, axis=0)
    T_exc = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)
    include = (T_exc * one_m >= 1e-4).astype(alpha.dtype)
    w = alpha * T_exc * include
    C = (w[..., None] * color[:, None, :]).sum(0)
    D = (w * depth[:, None]).sum(0)
    T_fin = jnp.prod(1.0 - alpha * include, axis=0)
    img = C + T_fin[:, None] * bg[None, :]
    return (
        jnp.clip(img.reshape(H, W, 3), 0.0, 1.0),
        (1.0 - T_fin).reshape(H, W),
        D.reshape(H, W),
    )


@pytest.fixture(scope="module")
def cam():
    return _camera()


@pytest.fixture(scope="module")
def bg():
    return jnp.asarray([1.0, 1.0, 1.0], jnp.float32)


def _raster(scene, cam, bg, **kw):
    means, shs, opa, scales, quats = scene
    return rasterize(
        means, shs, opa, scales, quats, cam, bg, SH_DEG,
        tile_size=TILE, max_tiles=64, max_per_tile=512, chunk=16, **kw,
    )


class TestForward:
    def test_matches_naive(self, cam, bg):
        scene = _scene()
        out = _raster(scene, cam, bg)
        img_n, alpha_n, depth_n = naive_render(*scene, cam, bg)
        assert float(out.overflow) == 0
        np.testing.assert_allclose(np.asarray(out.image), np.asarray(img_n), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(alpha_n), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.depth), np.asarray(depth_n), atol=1e-4)

    def test_matches_naive_high_opacity(self, cam, bg):
        # near the T=1e-4 termination threshold, float reassociation between
        # the chunked and monolithic cumprod can flip a marginal inclusion;
        # a flipped 0.99-alpha Gaussian moves a pixel by ~1e-2 * color.
        scene = _scene(seed=3, opa_max=0.995)
        out = _raster(scene, cam, bg)
        img_n, alpha_n, _ = naive_render(*scene, cam, bg)
        diff = np.abs(np.asarray(out.image) - np.asarray(img_n))
        assert (diff < 2e-5).mean() > 0.995
        assert diff.max() < 2e-2
        adiff = np.abs(np.asarray(out.alpha) - np.asarray(alpha_n))
        assert (adiff < 2e-5).mean() > 0.995
        assert adiff.max() < 2e-2

    def test_empty_scene_is_background(self, cam):
        means = jnp.full((4, 3), 50.0)  # far outside frustum
        shs = jnp.zeros((4, 4, 3))
        out = rasterize(
            means, shs, jnp.ones(4) * 0.9, jnp.ones((4, 3)) * 0.01,
            jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (4, 1)),
            cam, jnp.asarray([0.2, 0.4, 0.6]), SH_DEG,
            tile_size=TILE, max_tiles=16, max_per_tile=64, chunk=8,
        )
        np.testing.assert_allclose(
            np.asarray(out.image),
            np.broadcast_to([0.2, 0.4, 0.6], (H, W, 3)),
            atol=1e-6,
        )
        assert float(out.alpha.max()) == 0.0
        np.testing.assert_array_equal(np.asarray(out.radii), 0.0)

    def test_single_gaussian_depth_and_center(self, cam, bg):
        means = jnp.asarray([[0.0, 0.0, 0.0]])
        shs = jnp.zeros((1, 4, 3)).at[:, 0].set(2.0)
        out = rasterize(
            means, shs, jnp.asarray([0.99]), jnp.ones((1, 3)) * 0.05,
            jnp.asarray([[1.0, 0, 0, 0]]), cam, jnp.zeros(3), SH_DEG,
            tile_size=TILE, max_tiles=64, max_per_tile=64, chunk=8,
        )
        # camera at z=-2 -> gaussian at view depth 2, peak in image center
        cy, cx = np.unravel_index(np.asarray(out.alpha).argmax(), (H, W))
        assert abs(cx - W / 2) <= 1 and abs(cy - H / 2) <= 1
        # center projects to (31.5, 31.5) — half-pixel offset from any pixel
        # center, so peak alpha is 0.99 * exp(-0.5 * 2 * 0.25 / var)
        peak_alpha = float(out.alpha[cy, cx])
        var = (0.05 * float(cam.focal_x) / 2.0) ** 2 + 0.3
        expected = 0.99 * np.exp(-0.25 / var)
        assert peak_alpha == pytest.approx(expected, abs=0.01)
        # expected-depth / alpha recovers the view-space z exactly
        assert float(out.depth[cy, cx] / peak_alpha) == pytest.approx(2.0, rel=1e-3)

    def test_jit_and_vmap_over_views(self, bg):
        scene = _scene(n=32)
        c2ws = []
        for ang in (0.0, 0.5):
            c2w = np.eye(4)
            c2w[:3, :3] = np.array(
                [
                    [np.cos(ang), 0, np.sin(ang)],
                    [0, 1, 0],
                    [-np.sin(ang), 0, np.cos(ang)],
                ]
            )
            c2w[:3, 3] = c2w[:3, :3] @ [0, 0, -2.0]
            c2ws.append(c2w)
        cams = Camera.from_c2w(jnp.asarray(np.stack(c2ws)), 0.9, 0.9, W, H)

        @jax.jit
        def go(cams):
            return jax.vmap(
                lambda c: _raster(scene, c, bg).image
            )(cams)

        imgs = go(cams)
        assert imgs.shape == (2, H, W, 3)
        assert not np.allclose(np.asarray(imgs[0]), np.asarray(imgs[1]))


class TestBinning:
    def test_segments_are_depth_sorted(self, cam):
        scene = _scene(n=50, seed=5)
        means, shs, opa, scales, quats = scene
        proj = project_gaussians(
            means, None, shs, opa, cam, SH_DEG,
            scales=scales, rotations=normalize_quat(quats),
        )
        bins = bin_gaussians(proj, H, W, tile_size=TILE, max_tiles=64)
        starts = np.asarray(bins.tile_starts)
        counts = np.asarray(bins.tile_counts)
        ids = np.asarray(bins.sorted_ids)
        depth = np.asarray(proj.depth)
        for t in range(len(starts)):
            seg = ids[starts[t]: starts[t] + counts[t]]
            seg_d = depth[seg]
            assert np.all(np.diff(seg_d) >= 0), f"tile {t} not depth sorted"

    def test_overflow_counts_dropped_slots(self, cam):
        scene = _scene(n=50, seed=5)
        means, shs, opa, scales, quats = scene
        proj = project_gaussians(
            means, None, shs, opa, cam, SH_DEG,
            scales=scales, rotations=normalize_quat(quats),
        )
        full = bin_gaussians(proj, H, W, tile_size=TILE, max_tiles=64)
        # with enum_tiles >= every rect, touch status is known for the
        # whole rect and overflow is EXACTLY the dropped live pairs
        capped = bin_gaussians(
            proj, H, W, tile_size=TILE, max_tiles=1, enum_tiles=64
        )
        assert int(full.overflow) == 0
        total_cover = int(np.asarray(full.tile_counts).sum())
        kept = int(np.asarray(capped.tile_counts).sum())
        assert int(capped.overflow) == total_cover - kept
        # the default window (enum_tiles == max_tiles) cannot evaluate the
        # cull bound beyond the window, so overflow is an upper bound
        capped_d = bin_gaussians(proj, H, W, tile_size=TILE, max_tiles=1)
        kept_d = int(np.asarray(capped_d.tile_counts).sum())
        assert int(capped_d.overflow) >= total_cover - kept_d


class TestGradients:
    def test_grads_match_naive_autodiff(self, cam, bg):
        scene = _scene(n=40, seed=7)
        rng = np.random.default_rng(11)
        wimg = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)

        def loss_tiled(means, shs, opa, scales, quats):
            out = rasterize(
                means, shs, opa, scales, quats, cam, bg, SH_DEG,
                tile_size=TILE, max_tiles=64, max_per_tile=512, chunk=16,
            )
            return jnp.sum(out.image * wimg) + 0.3 * jnp.sum(out.alpha) + 0.1 * jnp.sum(out.depth)

        def loss_naive(means, shs, opa, scales, quats):
            img, alpha, depth = naive_render(means, shs, opa, scales, quats, cam, bg)
            return jnp.sum(img * wimg) + 0.3 * jnp.sum(alpha) + 0.1 * jnp.sum(depth)

        g_t = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*scene)
        g_n = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(*scene)
        for gt, gn, name in zip(g_t, g_n, ["means", "shs", "opa", "scales", "quats"]):
            scale = max(1e-3, float(jnp.abs(gn).max()))
            np.testing.assert_allclose(
                np.asarray(gt) / scale, np.asarray(gn) / scale, atol=5e-4,
                err_msg=f"grad mismatch: {name}",
            )

    def test_screen_grads_signed_and_abs(self, cam, bg):
        scene = _scene(n=40, seed=9)
        means, shs, opa, scales, quats = scene
        gt_img = jnp.zeros((H, W, 3))
        zeros = jnp.zeros((means.shape[0], 2))

        def mse(off, off_abs):
            out = rasterize(
                means, shs, opa, scales, quats, cam, bg, SH_DEG,
                tile_size=TILE, max_tiles=64, max_per_tile=512, chunk=16,
                screen_offset=off, screen_abs=off_abs,
            )
            return jnp.mean((out.image - gt_img) ** 2)

        g_signed, g_abs = jax.grad(mse, argnums=(0, 1))(zeros, zeros)
        g_signed, g_abs = np.asarray(g_signed), np.asarray(g_abs)
        # abs-accumulated >= |signed sum| (triangle inequality), not all zero
        assert (g_abs + 1e-12 >= np.abs(g_signed)).all()
        assert g_abs.max() > 0

    def test_abs_equals_signed_for_single_gaussian(self, cam, bg):
        # one gaussian, one-sided gt -> every per-pixel grad same sign region?
        # use a gt that makes dL/dC strictly positive: gt = 0, C > 0
        means = jnp.asarray([[0.1, 0.05, 0.0]])
        shs = jnp.zeros((1, 4, 3)).at[:, 0].set(1.0)
        opa = jnp.asarray([0.6])
        scales = jnp.ones((1, 3)) * 0.08
        quats = jnp.asarray([[1.0, 0, 0, 0]])
        zeros = jnp.zeros((1, 2))

        def loss(off, off_abs):
            out = rasterize(
                means, shs, opa, scales, quats, cam, bg, SH_DEG,
                tile_size=TILE, max_tiles=64, max_per_tile=64, chunk=8,
                screen_offset=off, screen_abs=off_abs,
            )
            # weight x-coordinate linearly: dL/dx_g has consistent sign
            wx = jnp.arange(W, dtype=jnp.float32)[None, :, None]
            return jnp.sum(out.image * wx)

        g_signed, g_abs = jax.grad(loss, argnums=(0, 1))(zeros, zeros)
        assert float(g_abs[0, 0]) >= abs(float(g_signed[0, 0])) - 1e-6
        assert float(g_abs[0, 0]) > 0


class TestFusedSelection:
    def test_sel_abs_matches_isolated_grad(self):
        """rasterize(sel_gt=gt).sel_abs == AbsGS grads of the isolated
        MSE closure (the reference's second-render selection pass)."""
        import numpy as np

        from generativedensification_tpu.core.camera import Camera
        from generativedensification_tpu.splat.rasterizer import rasterize

        rng = np.random.default_rng(7)
        N, H, W = 300, 64, 64
        means = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)), jnp.float32)
        shs = jnp.asarray(rng.normal(size=(N, 4, 3)) * 0.3, jnp.float32)
        opa = jnp.asarray(rng.uniform(0.2, 0.9, N), jnp.float32)
        scales = jnp.asarray(
            np.exp(rng.uniform(np.log(0.02), np.log(0.08), (N, 3))), jnp.float32
        )
        quats = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = -1.9
        cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, 0.1, 10.0)
        bg = jnp.ones(3)
        gt = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
        kw = dict(tile_size=16, max_tiles=8, max_per_tile=1024, chunk=32)

        out = jax.jit(
            lambda: rasterize(means, shs, opa, scales, quats, cam, bg, 1,
                              sel_gt=gt, **kw)
        )()

        def isolated(sabs):
            o = rasterize(means, shs, opa, scales, quats, cam, bg, 1,
                          screen_abs=sabs, **kw)
            return jnp.mean((o.image - gt) ** 2)

        g_abs = jax.jit(jax.grad(isolated))(jnp.zeros((N, 2)))
        np.testing.assert_allclose(
            np.asarray(out.sel_abs), np.asarray(g_abs), rtol=1e-5, atol=1e-7
        )

    def test_sel_output_image_unchanged(self):
        import numpy as np

        from generativedensification_tpu.core.camera import Camera
        from generativedensification_tpu.splat.rasterizer import rasterize

        rng = np.random.default_rng(8)
        N, H, W = 200, 64, 64
        means = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)), jnp.float32)
        shs = jnp.asarray(rng.normal(size=(N, 4, 3)) * 0.3, jnp.float32)
        opa = jnp.asarray(rng.uniform(0.2, 0.9, N), jnp.float32)
        scales = jnp.full((N, 3), 0.04, jnp.float32)
        quats = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = -1.9
        cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, 0.1, 10.0)
        bg = jnp.ones(3)
        gt = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
        kw = dict(tile_size=16, max_tiles=8, max_per_tile=1024, chunk=32)

        a = jax.jit(lambda: rasterize(means, shs, opa, scales, quats, cam,
                                      bg, 1, **kw))()
        b = jax.jit(lambda: rasterize(means, shs, opa, scales, quats, cam,
                                      bg, 1, sel_gt=gt, **kw))()
        np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))

        # gradients through the fused variant match plain composite_tiles
        def loss_plain(m):
            return jnp.sum(rasterize(m, shs, opa, scales, quats, cam, bg, 1,
                                     **kw).image ** 2)

        def loss_sel(m):
            return jnp.sum(rasterize(m, shs, opa, scales, quats, cam, bg, 1,
                                     sel_gt=gt, **kw).image ** 2)

        gp = jax.jit(jax.grad(loss_plain))(means)
        gs = jax.jit(jax.grad(loss_sel))(means)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=1e-6, atol=1e-8)


class TestPairBudget:
    def _scene(self):
        import numpy as np

        from generativedensification_tpu.core.camera import Camera

        rng = np.random.default_rng(11)
        N, H, W = 400, 64, 64
        means = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)), jnp.float32)
        shs = jnp.asarray(rng.normal(size=(N, 4, 3)) * 0.3, jnp.float32)
        opa = jnp.asarray(rng.uniform(0.2, 0.9, N), jnp.float32)
        scales = jnp.asarray(
            np.exp(rng.uniform(np.log(0.02), np.log(0.08), (N, 3))),
            jnp.float32,
        )
        quats = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = -1.9
        cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, 0.1, 10.0)
        return means, shs, opa, scales, quats, cam

    def test_ample_budget_bitwise_equal(self):
        import numpy as np

        from generativedensification_tpu.splat.rasterizer import rasterize

        means, shs, opa, scales, quats, cam = self._scene()
        bg = jnp.ones(3)
        kw = dict(tile_size=16, max_tiles=8, max_per_tile=1024, chunk=32)
        a = jax.jit(lambda m: rasterize(m, shs, opa, scales, quats, cam, bg,
                                        1, **kw))(means)
        # budget >= all live pairs: identical images AND identical grads
        b = jax.jit(lambda m: rasterize(m, shs, opa, scales, quats, cam, bg,
                                        1, max_pairs=400 * 8, **kw))(means)
        np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))

        ga = jax.jit(jax.grad(lambda m: jnp.sum(
            rasterize(m, shs, opa, scales, quats, cam, bg, 1, **kw).image ** 2
        )))(means)
        gb = jax.jit(jax.grad(lambda m: jnp.sum(
            rasterize(m, shs, opa, scales, quats, cam, bg, 1,
                      max_pairs=400 * 8, **kw).image ** 2
        )))(means)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-6, atol=1e-8)

    def test_tiny_budget_overflows_finite(self):
        import numpy as np

        from generativedensification_tpu.splat.rasterizer import rasterize

        means, shs, opa, scales, quats, cam = self._scene()
        bg = jnp.ones(3)
        kw = dict(tile_size=16, max_tiles=8, max_per_tile=1024, chunk=32)
        out = jax.jit(lambda m: rasterize(m, shs, opa, scales, quats, cam,
                                          bg, 1, max_pairs=1024, **kw))(means)
        full = jax.jit(lambda m: rasterize(m, shs, opa, scales, quats, cam,
                                           bg, 1, **kw))(means)
        assert int(out.overflow) > int(full.overflow)
        assert bool(jnp.isfinite(out.image).all())


class TestSelMultiView:
    def test_two_view_normalization(self):
        """Per-view fused sel_abs summed and divided by V equals the AbsGS
        grads of ONE mean over the V-view stack — the reference's joint
        MSE (network.py:865-872); the fused path's per-view cotangent is V
        times the joint one, hence the /V in Network (r2 review finding)."""
        import numpy as np

        from generativedensification_tpu.core.camera import Camera
        from generativedensification_tpu.splat.rasterizer import rasterize

        rng = np.random.default_rng(11)
        N, H, W = 200, 64, 64
        means = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)), jnp.float32)
        shs = jnp.asarray(rng.normal(size=(N, 4, 3)) * 0.3, jnp.float32)
        opa = jnp.asarray(rng.uniform(0.2, 0.9, N), jnp.float32)
        scales = jnp.asarray(
            np.exp(rng.uniform(np.log(0.02), np.log(0.08), (N, 3))),
            jnp.float32,
        )
        quats = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = -1.9
        cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, 0.1, 10.0)
        bg = jnp.ones(3)
        gt0 = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
        gt1 = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
        kw = dict(tile_size=16, max_tiles=8, max_per_tile=1024, chunk=32)

        fused = jax.jit(
            lambda: (
                rasterize(means, shs, opa, scales, quats, cam, bg, 1,
                          sel_gt=gt0, **kw).sel_abs
                + rasterize(means, shs, opa, scales, quats, cam, bg, 1,
                            sel_gt=gt1, **kw).sel_abs
            ) / 2.0
        )()

        def joint(sabs):
            o0 = rasterize(means, shs, opa, scales, quats, cam, bg, 1,
                           screen_abs=sabs, **kw)
            o1 = rasterize(means, shs, opa, scales, quats, cam, bg, 1,
                           screen_abs=sabs, **kw)
            return jnp.mean(
                jnp.stack([(o0.image - gt0) ** 2, (o1.image - gt1) ** 2])
            )

        g = jax.jit(jax.grad(joint))(jnp.zeros((N, 2)))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(g), rtol=1e-5, atol=1e-7
        )
