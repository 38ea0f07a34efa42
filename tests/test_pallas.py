"""Pallas kernel parity vs the XLA compositing path (interpret mode on CPU,
compiled on TPU — same code path either way)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generativedensification_tpu.splat.composite import composite_tiles

TILES = 2  # 2x2 tiles; image is (2*ts)² — kernels support ts in {16, 32}
N = 96     # gaussians
P = 192    # slots


def _data(seed=0, ts=32):
    rng = np.random.default_rng(seed)
    counts = jnp.asarray([70, 50, 0, 60], jnp.int32)
    starts = jnp.asarray([0, 70, 120, 120], jnp.int32)
    # sorted_o is a permutation of the (D=2, N) slot expansion; the
    # gaussian of a slot is o % N (the production binning invariant:
    # slot-major o = d * N + gaussian)
    sorted_o = rng.permutation(P).astype(np.int32)
    ids = sorted_o % N
    valid = np.zeros(P, bool)
    for s, c in zip(np.asarray(starts), np.asarray(counts)):
        valid[s:s + c] = True
    xy = jnp.asarray(rng.uniform(0, 2 * ts, (N, 2)), jnp.float32)
    conic = jnp.tile(jnp.asarray([[0.08, 0.01, 0.06]], jnp.float32), (N, 1))
    color = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    opa = jnp.asarray(rng.uniform(0.2, 0.95, N), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 3, N), jnp.float32)
    bg = jnp.asarray([0.3, 0.6, 0.9])
    # depth_order = identity makes sorted_rank == ids (the slab gather
    # composes depth_order[sorted_rank])
    return xy, conic, color, opa, depth, bg, (
        jnp.asarray(ids), jnp.asarray(sorted_o), jnp.asarray(valid),
        jnp.asarray(ids), jnp.arange(N, dtype=jnp.int32),
        starts, counts
    )


def _run(backend, data, ts=32):
    xy, conic, color, opa, depth, bg, bins = data
    return composite_tiles(
        xy, jnp.zeros_like(xy), conic, color, opa, depth, bg, bins,
        TILES, TILES, ts, 128, 32, backend,
    )


class TestPallasParity:
    @pytest.mark.parametrize("ts", [16, 32])
    def test_forward_matches_xla(self, ts):
        data = _data(ts=ts)
        ox = _run("xla", data, ts)
        op = _run("pallas", data, ts)
        for a, b, name in zip(ox, op, ["image", "alpha", "depth"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name
            )

    @pytest.mark.parametrize("ts", [16, 32])
    def test_gradients_match_xla(self, ts):
        data = _data(seed=3, ts=ts)
        xy, conic, color, opa, depth, bg, bins = data
        rng = np.random.default_rng(1)
        w = jnp.asarray(
            rng.normal(size=(2 * ts, 2 * ts, 3)), jnp.float32
        )

        def loss(be, xy, xy_abs, conic, color, opa, depth):
            img, alpha, dep = composite_tiles(
                xy, xy_abs, conic, color, opa, depth, bg, bins,
                TILES, TILES, ts, 128, 32, be,
            )
            return jnp.sum(img * w) + 0.2 * jnp.sum(alpha) + 0.1 * jnp.sum(dep)

        zeros = jnp.zeros_like(xy)
        args = (xy, zeros, conic, color, opa, depth)
        gx = jax.grad(lambda *a: loss("xla", *a), argnums=tuple(range(6)))(*args)
        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(6)))(*args)
        names = ["xy", "xy_abs", "conic", "color", "opa", "depth"]
        for a, b, name in zip(gx, gp, names):
            scale = max(1e-6, float(jnp.abs(a).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-5,
                err_msg=f"grad {name}",
            )
        # AbsGS channel sanity: abs >= |signed|
        assert (np.asarray(gp[1]) + 1e-9 >= np.abs(np.asarray(gp[0])) - 1e-5).all()


class TestGradReduceModes:
    """Every APOS_MODE / APOS_INV strategy must produce identical grads
    (they only reorder the aligned-grad-slab -> per-gaussian reduction)."""

    @pytest.mark.parametrize(
        "mode", ["gauss", "rank", "gauss_dsum", "gauss_dsum_col", "rank_dsum"]
    )
    def test_modes_match_default(self, mode, monkeypatch):
        from generativedensification_tpu.splat import composite as C

        data = _data(seed=5)
        xy, conic, color, opa, depth, bg, bins = data

        def gsum(*a):
            img, alpha, dep = composite_tiles(
                xy, a[0], conic, color, opa, depth, bg, bins,
                TILES, TILES, 32, 128, 32, "pallas",
            )
            return jnp.sum(img) + jnp.sum(alpha * dep)

        # pin the reference strategy explicitly: the module default has
        # changed before (gauss -> gauss_dsum), and comparing a mode
        # against itself would silently drop coverage of the others
        monkeypatch.setattr(C, "APOS_MODE", "gauss")
        g_ref = jax.grad(gsum)(jnp.zeros_like(xy))
        monkeypatch.setattr(C, "APOS_MODE", mode)
        g_mode = jax.grad(gsum)(jnp.zeros_like(xy))
        np.testing.assert_allclose(
            np.asarray(g_ref), np.asarray(g_mode), atol=1e-6, err_msg=mode
        )

    def test_scatter_inverse_matches_sort(self, monkeypatch):
        data = _data(seed=7)
        xy, conic, color, opa, depth, bg, bins = data

        def gsum(*a):
            img, alpha, dep = composite_tiles(
                xy, a[0], conic, color, opa, depth, bg, bins,
                TILES, TILES, 32, 128, 32, "pallas",
            )
            return jnp.sum(img) + jnp.sum(alpha * dep)

        g_ref = jax.grad(gsum)(jnp.zeros_like(xy))
        monkeypatch.setenv("GD_APOS_INV", "scatter")
        g_sc = jax.grad(gsum)(jnp.zeros_like(xy))
        np.testing.assert_allclose(
            np.asarray(g_ref), np.asarray(g_sc), atol=1e-6
        )


class TestPerTileCapOverflow:
    """Backend grad parity when a tile exceeds ``max_per_tile``.

    The rasterizer clamps tile_counts to the cap so both backends
    composite the same front-most slots; the Pallas backward's aligned
    grad layout must respect the clamp too — a stale cummax delta used
    to aim every later tile's grads into other tiles' segments, and
    beyond-cap slots used to overrun their segment (r2 review finding)."""

    def _data_overflow(self, seed=7, ts=32):
        rng = np.random.default_rng(seed)
        # tile 0 spans 300 slots against a 128 cap: its clamped aligned
        # padding (128) is SMALLER than the next tile's base step (256),
        # the stale-cummax-delta failure mode — plus 172 beyond-cap slots
        # that used to overrun into tile 1's written grad rows
        P_ovf = 384
        counts = jnp.asarray([300, 20, 0, 12], jnp.int32)
        starts = jnp.asarray([0, 300, 320, 320], jnp.int32)
        sorted_o = rng.permutation(P_ovf).astype(np.int32)
        ids = sorted_o % N
        valid = np.zeros(P_ovf, bool)
        for s, c in zip(np.asarray(starts), np.asarray(counts)):
            valid[s:s + c] = True
        xy = jnp.asarray(rng.uniform(0, 2 * ts, (N, 2)), jnp.float32)
        conic = jnp.tile(
            jnp.asarray([[0.08, 0.01, 0.06]], jnp.float32), (N, 1)
        )
        color = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
        opa = jnp.asarray(rng.uniform(0.2, 0.95, N), jnp.float32)
        depth = jnp.asarray(rng.uniform(1, 3, N), jnp.float32)
        bg = jnp.asarray([0.3, 0.6, 0.9])
        return xy, conic, color, opa, depth, bg, (
            jnp.asarray(ids), jnp.asarray(sorted_o), jnp.asarray(valid),
            jnp.asarray(ids), jnp.arange(N, dtype=jnp.int32),
            starts, jnp.minimum(counts, 128),   # the rasterizer's clamp
        )

    def test_gradients_match_xla_with_clamped_tile(self):
        ts = 32
        data = self._data_overflow(ts=ts)
        xy, conic, color, opa, depth, bg, bins = data
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(2 * ts, 2 * ts, 3)), jnp.float32)

        def loss(be, xy, xy_abs, conic, color, opa, depth):
            img, alpha, dep = composite_tiles(
                xy, xy_abs, conic, color, opa, depth, bg, bins,
                TILES, TILES, ts, 128, 32, be,
            )
            return jnp.sum(img * w) + 0.2 * jnp.sum(alpha) + 0.1 * jnp.sum(dep)

        zeros = jnp.zeros_like(xy)
        args = (xy, zeros, conic, color, opa, depth)
        gx = jax.grad(lambda *a: loss("xla", *a), argnums=tuple(range(6)))(*args)
        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(6)))(*args)
        names = ["xy", "xy_abs", "conic", "color", "opa", "depth"]
        for a, b, name in zip(gx, gp, names):
            scale = max(1e-6, float(jnp.abs(a).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-5,
                err_msg=f"grad {name}",
            )


class TestNoabsCancellationStress:
    """Worst-case cancellation of the noabs moment-form backward.

    The Pallas ``noabs`` path reconstructs central moments (Σg·dx,
    Σg·dx², ...) from raw moments against tile-LOCAL pixel coordinates,
    cancelling terms of magnitude ~X²·Σg with X up to ts-1.  Gaussians
    pinned to the far corner of a tile (local x,y ≈ ts-1) with a tight
    footprint maximize the cancellation; grads must still match the XLA
    path's direct dx/dy product form within the advertised ~2-digit
    loss of the row's own scale (ADVICE r3: pin the tolerance so future
    tightening catches regressions)."""

    def _data_corner(self, ts=32, seed=11):
        rng = np.random.default_rng(seed)
        counts = jnp.asarray([48, 48, 48, 48], jnp.int32)
        starts = jnp.asarray([0, 48, 96, 144], jnp.int32)
        sorted_o = rng.permutation(P).astype(np.int32)
        ids = sorted_o % N
        valid = np.ones(P, bool)
        # far corner of each 2x2-grid tile, jittered within the last 2px;
        # tight conic (σ ≈ 1.6px) so the footprint spans a few pixels
        corner = np.array(
            [[ts - 1.5, ts - 1.5]], np.float32
        ) + rng.uniform(-1.0, 1.0, (N, 2)).astype(np.float32)
        tile_oxy = np.stack(
            [(np.arange(N) % 2) * ts, ((np.arange(N) // 2) % 2) * ts], -1
        ).astype(np.float32)
        xy = jnp.asarray(corner + tile_oxy)
        conic = jnp.tile(jnp.asarray([[0.4, 0.05, 0.35]], jnp.float32), (N, 1))
        color = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
        opa = jnp.asarray(rng.uniform(0.3, 0.95, N), jnp.float32)
        depth = jnp.asarray(rng.uniform(1, 3, N), jnp.float32)
        bg = jnp.asarray([0.3, 0.6, 0.9])
        return xy, conic, color, opa, depth, bg, (
            jnp.asarray(ids), jnp.asarray(sorted_o), jnp.asarray(valid),
            jnp.asarray(ids), jnp.arange(N, dtype=jnp.int32),
            starts, counts,
        )

    @pytest.mark.parametrize("ts", [16, 32])
    def test_noabs_grads_corner_gaussians(self, ts):
        data = self._data_corner(ts=ts)
        xy, conic, color, opa, depth, bg, bins = data
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.normal(size=(2 * ts, 2 * ts, 3)), jnp.float32)

        def loss(be, xy, conic, color, opa, depth):
            # want_abs=False selects the Pallas "noabs" moment-form rows
            img, alpha, dep = composite_tiles(
                xy, jnp.zeros_like(xy), conic, color, opa, depth, bg, bins,
                TILES, TILES, ts, 128, 32, be, 0, False,
            )
            return jnp.sum(img * w) + 0.2 * jnp.sum(alpha) + 0.1 * jnp.sum(dep)

        args = (xy, conic, color, opa, depth)
        gx = jax.grad(lambda *a: loss("xla", *a), argnums=tuple(range(5)))(*args)
        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(5)))(*args)
        for a, b, name in zip(gx, gp, ["xy", "conic", "color", "opa", "depth"]):
            scale = max(1e-6, float(jnp.abs(a).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-4,
                err_msg=f"noabs corner grad {name} (ts={ts})",
            )
