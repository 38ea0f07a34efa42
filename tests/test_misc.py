"""kNN, finetune path, torch-converter primitives, debugging hooks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generativedensification_tpu.core.knn import mean_knn_sq_dist


class TestKNN:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        ours = np.asarray(mean_knn_sq_dist(jnp.asarray(pts), k=3, chunk=128))
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        ref = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_grid_spacing(self):
        # regular grid: 3-NN mean sq dist == spacing^2
        ax = np.linspace(0, 1, 5)
        pts = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
        d = np.asarray(mean_knn_sq_dist(jnp.asarray(pts, jnp.float32), chunk=64))
        assert abs(float(np.median(d)) - 0.25**2) < 1e-5


class TestFinetune:
    def test_overfits_single_view(self):
        from generativedensification_tpu.core import Camera
        from generativedensification_tpu.eval.finetune import (
            finetune,
            init_from_pcd,
        )

        rng = np.random.default_rng(1)
        n = 64
        pts = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)), jnp.float32)
        cols = jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32)
        params = init_from_pcd(pts, cols)

        c2w = np.eye(4)
        c2w[2, 3] = -2.0
        cam = Camera.from_c2w(jnp.asarray(c2w[None]), 0.8, 0.8, 32, 32)
        gt = jnp.ones((1, 32, 32, 3)) * 0.5
        bgs = jnp.ones((1, 3))
        kw = dict(tile_size=16, max_tiles=16, max_per_tile=128, chunk=16,
                  backend="xla")

        p0 = jax.tree.map(lambda x: x, params)
        params, loss0 = finetune(
            params, cam, gt, bgs, steps=1, raster_kw=kw
        )
        params, loss1 = finetune(
            params, cam, gt, bgs, steps=30, raster_kw=kw
        )
        assert np.isfinite(loss1)
        assert loss1 < loss0
        moved = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(params))
        )
        assert moved > 0


class TestTorchConvertPrimitives:
    def test_linear_and_conv_layouts(self):
        from generativedensification_tpu.utils.torch_convert import (
            split_qkv,
            t2f_conv2d,
            t2f_conv3d,
            t2f_convtranspose3d,
            t2f_linear,
        )

        rng = np.random.default_rng(2)
        w = rng.normal(size=(8, 4))
        x = rng.normal(size=(4,))
        np.testing.assert_allclose(x @ t2f_linear(w), w @ x, rtol=1e-6)

        w2 = rng.normal(size=(6, 3, 5, 5))
        assert t2f_conv2d(w2).shape == (5, 5, 3, 6)
        w3 = rng.normal(size=(6, 3, 2, 2, 2))
        assert t2f_conv3d(w3).shape == (2, 2, 2, 3, 6)
        wt = rng.normal(size=(3, 6, 2, 2, 2))
        assert t2f_convtranspose3d(wt).shape == (2, 2, 2, 3, 6)

        qkv = rng.normal(size=(12, 4))
        parts = split_qkv(qkv, np.arange(12.0))
        np.testing.assert_allclose(parts["k"]["kernel"], qkv[4:8].T)
        np.testing.assert_allclose(parts["v"]["bias"], np.arange(8.0, 12.0))


class TestDebugHooks:
    def test_nan_guard(self):
        from generativedensification_tpu.utils.debugging import nan_guard

        def bad_step(state, batch):
            return state, {"loss": float("nan")}

        guarded = nan_guard(bad_step, enabled=True)
        with pytest.raises(FloatingPointError):
            guarded(None, None)
        ok = nan_guard(lambda s, b: (s, {"loss": 1.0}), enabled=True)
        assert ok(None, None)[1]["loss"] == 1.0


class TestNeighborIdx:
    def test_matches_bruteforce(self):
        import numpy as np
        import jax.numpy as jnp
        from generativedensification_tpu.points.structure import (
            PointSet, compute_neighbor_idx,
        )

        rng = np.random.default_rng(0)
        B, N = 2, 64
        gc = rng.integers(0, 6, size=(B, N, 3)).astype(np.int32)  # collisions
        mask = np.ones((B, N), bool)
        mask[:, -5:] = False
        ps = PointSet(
            coord=jnp.asarray(gc, jnp.float32),
            feat=jnp.zeros((B, N, 4)),
            mask=jnp.asarray(mask),
            grid_size=jnp.asarray(1.0),
            grid_coord=jnp.asarray(gc),
        )
        nbr = np.asarray(compute_neighbor_idx(ps).neighbor_idx)

        offs = np.stack(
            np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"), axis=-1
        ).reshape(27, 3)
        for b in range(B):
            occupied = {}
            for i in range(N):
                if mask[b, i]:
                    occupied.setdefault(tuple(gc[b, i]), []).append(i)
            for i in range(N):
                if not mask[b, i]:
                    assert (nbr[b, i] == -1).all()
                    continue
                for k in range(27):
                    want = occupied.get(tuple(gc[b, i] + offs[k]))
                    got = nbr[b, i, k]
                    if want is None:
                        assert got == -1, (b, i, k)
                    else:
                        # any co-located point is a valid representative
                        assert got in want, (b, i, k, got, want)
                # the center offset must resolve to the point's own voxel
                assert nbr[b, i, 13] in occupied[tuple(gc[b, i])]


class TestTopPMask:
    def test_nucleus_semantics(self):
        """Inclusive-cumsum nucleus over sorted probs (autoencoder.py:548-612)."""
        import jax.numpy as jnp
        import numpy as np

        from generativedensification_tpu.points.ops import top_p_mask

        prob = jnp.asarray([[0.4, 0.05, 0.3, 0.15, 0.1]])
        mask = jnp.ones((1, 5), bool)
        # sorted desc: .4, .3, .15, .1, .05; cumsum: .4, .7, .85, .95, 1.0
        out = np.asarray(top_p_mask(prob, mask, 0.85)[0])
        assert out.tolist() == [True, False, True, True, False]
        out = np.asarray(top_p_mask(prob, mask, 0.5)[0])
        assert out.tolist() == [True, False, False, False, False]

    def test_invalid_points_excluded(self):
        import jax.numpy as jnp
        import numpy as np

        from generativedensification_tpu.points.ops import top_p_mask

        prob = jnp.asarray([[0.9, 0.6, 0.3]])
        mask = jnp.asarray([[False, True, True]])
        out = np.asarray(top_p_mask(prob, mask, 0.7)[0])
        assert out.tolist() == [False, True, False]


class TestPDNorm:
    def test_condition_selects_affine(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from generativedensification_tpu.points.modules import PDNorm

        m = PDNorm(dim=4, n_conditions=3)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 4)),
                        jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x, 0)
        p = jax.tree.map(lambda a: a, p)
        import flax

        pd = flax.core.unfreeze(p)
        pd["params"]["scale"] = (
            jnp.asarray(pd["params"]["scale"]).at[1].set(2.0)
        )
        pd["params"]["bias"] = (
            jnp.asarray(pd["params"]["bias"]).at[1].set(1.0)
        )
        y0 = m.apply(pd, x, 0)
        y1 = m.apply(pd, x, 1)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y0) * 2.0 + 1.0, rtol=1e-5
        )


class TestBf16Policy:
    def test_compute_dtype_and_param_dtype(self):
        """bf16-mixed policy: module compute in bf16, params f32, LN-stat
        and head outputs back in f32 (VERDICT r1 item 3)."""
        import jax
        import jax.numpy as jnp

        from generativedensification_tpu.models.vit import DinoEncoder
        from generativedensification_tpu.points.modules import (
            PointMLP,
            WindowAttention,
        )
        from generativedensification_tpu.points.ops import masked_layer_norm
        from generativedensification_tpu.points.structure import (
            PointSet,
            serialize_pointset,
        )

        x = jnp.ones((2, 48, 32), jnp.float32)
        mlp = PointMLP(hidden=64, out=32, dtype=jnp.bfloat16)
        p = mlp.init(jax.random.PRNGKey(0), x)
        assert all(v.dtype == jnp.float32 for v in jax.tree.leaves(p))
        y = mlp.apply(p, x)
        assert y.dtype == jnp.bfloat16

        ps = PointSet(coord=jnp.zeros((1, 96, 3)), feat=jnp.zeros((1, 96, 32)),
                      mask=jnp.ones((1, 96), bool), grid_size=0.1)
        ps = serialize_pointset(ps, ("z",))
        att = WindowAttention(channels=32, num_heads=4, patch_size=48,
                              dtype=jnp.bfloat16)
        pa = att.init(jax.random.PRNGKey(0), ps)
        assert all(v.dtype == jnp.float32 for v in jax.tree.leaves(pa))
        ya = att.apply(pa, ps)
        assert ya.dtype == jnp.bfloat16

        # fp32 island: the masked LN keeps the input dtype but its stats
        # are f32 — a bf16 input with large magnitudes must not overflow
        big = (jnp.full((1, 4, 32), 3e4) +
               jnp.arange(32.0)).astype(jnp.bfloat16)
        out = masked_layer_norm(big)
        assert out.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())

        # the image encoder's final norm returns f32 (feeds the f32 lift)
        enc = DinoEncoder("tiny_test", dtype=jnp.bfloat16)
        img = jnp.ones((1, 32, 32, 3), jnp.float32)
        pe = enc.init(jax.random.PRNGKey(0), img)
        tokens = enc.apply(pe, img)
        assert tokens.dtype == jnp.float32


class TestAdaLayerNorm:
    def test_modulates_ln_by_global_affine(self):
        """affine(global_feat) * LN_noaffine(feat), affine broadcast over
        points (reference layers/normalization.py:77-93)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from generativedensification_tpu.points.modules import AdaLayerNorm
        from generativedensification_tpu.points.ops import masked_layer_norm

        rng = np.random.default_rng(1)
        feat = jnp.asarray(rng.normal(size=(2, 6, 4)), jnp.float32)
        gfeat = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
        m = AdaLayerNorm(dim=4)
        p = m.init(jax.random.PRNGKey(0), feat, gfeat)
        y = m.apply(p, feat, gfeat)

        w = np.asarray(p["params"]["affine"]["kernel"])
        b = np.asarray(p["params"]["affine"]["bias"])
        mod = np.asarray(gfeat) @ w + b
        expect = mod[:, None, :] * np.asarray(masked_layer_norm(feat))
        np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-6)


class TestStaticOpacityPool:
    """Eval-exact opacity pool vs the dynamic-mask oracle (VERDICT r2 #4).

    Reference keeps every point with sigmoid(op) > 0.005 in the fine union
    (network.py:804-805); the TPU pool is static.  Whenever the pool covers
    the true mask count, pool membership must contain the oracle set
    exactly — and at mask_pool >= N the pool is the identity."""

    def _op(self, seed=0, B=2, N=512, frac_pass=0.3):
        rng = np.random.default_rng(seed)
        op = rng.uniform(0.006, 1.0, size=(B, N)).astype(np.float32)
        off = rng.uniform(0.0, 0.004, size=(B, N)).astype(np.float32)
        mask = rng.uniform(size=(B, N)) < frac_pass
        return jnp.asarray(np.where(mask, op, off))

    def test_pool_covers_oracle_when_budget_sufficient(self):
        from generativedensification_tpu.models.network import (
            static_opacity_pool,
        )

        op = self._op()
        oracle = np.asarray(op > 0.005)
        count = int(oracle.sum(1).max())
        pool_idx = np.asarray(static_opacity_pool(op, count))
        assert pool_idx.shape[1] == count
        for b in range(op.shape[0]):
            oracle_set = set(np.flatnonzero(oracle[b]).tolist())
            pool_set = set(pool_idx[b].tolist())
            # every oracle point is in the pool; extras (if this row's
            # count < max) fail the downstream 0.005 validity check
            assert oracle_set <= pool_set

    def test_identity_at_full_budget(self):
        from generativedensification_tpu.models.network import (
            static_opacity_pool,
        )

        op = self._op(seed=1)
        B, N = op.shape
        for pool in (N, N + 100, 10**6):
            idx = np.asarray(static_opacity_pool(op, pool))
            np.testing.assert_array_equal(
                idx, np.tile(np.arange(N, dtype=np.int32), (B, 1))
            )

    def test_undersized_pool_drops_oracle_points(self):
        """Negative control: a budget below the true count must lose
        oracle members (this is the training-time approximation the eval
        config avoids)."""
        from generativedensification_tpu.models.network import (
            static_opacity_pool,
        )

        op = self._op(seed=2, frac_pass=0.9)
        oracle = np.asarray(op > 0.005)
        count = int(oracle.sum(1).max())
        small = count // 2
        pool_idx = np.asarray(static_opacity_pool(op, small))
        b = int(np.argmax(oracle.sum(1)))
        oracle_set = set(np.flatnonzero(oracle[b]).tolist())
        pool_set = set(pool_idx[b].tolist())
        assert len(oracle_set - pool_set) > 0
        # but the kept ones are the TOP-opacity subset
        kept = np.sort(np.asarray(op)[b][pool_idx[b]])
        dropped = np.asarray(op)[b][sorted(oracle_set - pool_set)]
        assert kept.min() >= dropped.max() - 1e-6
