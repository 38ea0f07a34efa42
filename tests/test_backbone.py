"""Fast unit tests for backbone sampling primitives (no network compile)."""

import jax
import jax.numpy as jnp
import numpy as np

class TestNeighborConv27VJP:
    """r5: the CPE's feat-gradient is the tap-reversed gather-contraction
    over per-voxel cotangent sums (autodiff's 27N-row scatter-add
    serialized 19 ms/step on TPU).  Must match plain autodiff exactly —
    including multi-occupied voxels (representative collapse) and dead
    padding points."""

    def test_matches_autodiff_with_duplicates(self):
        from generativedensification_tpu.points.modules import neighbor_conv27
        from generativedensification_tpu.points.structure import (
            PointSet,
            compute_neighbor_idx,
        )

        rng = np.random.default_rng(0)
        B, N, C = 2, 64, 16
        gc = rng.integers(0, 6, size=(B, N, 3)).astype(np.int32)
        gc[0, 5] = gc[0, 7]   # multi-occupied voxels
        gc[0, 6] = gc[0, 7]
        gc[1, 10] = gc[1, 11]
        mask = np.ones((B, N), bool)
        mask[:, -6:] = False
        ps = PointSet(coord=jnp.zeros((B, N, 3)), feat=jnp.zeros((B, N, C)),
                      mask=jnp.asarray(mask), grid_coord=jnp.asarray(gc))
        nbr = compute_neighbor_idx(ps).neighbor_idx
        feat = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(27, C, C)) * 0.1, jnp.float32)

        def old(feat, w):
            hit = nbr >= 0
            safe = jnp.maximum(nbr, 0)
            g = jnp.take_along_axis(
                feat, safe.reshape(B, -1)[..., None], axis=1
            ).reshape(B, N, 27, C)
            g = jnp.where(hit[..., None], g, 0.0)
            return jnp.einsum("bnoc,ocd->bnd", g, w)

        def new(feat, w):
            return neighbor_conv27(feat, nbr, w, jnp.float32)

        # scan-over-taps accumulation order differs from the fused
        # einsum contraction by f32 association only
        np.testing.assert_allclose(np.asarray(new(feat, w)),
                                   np.asarray(old(feat, w)),
                                   rtol=0, atol=1e-5)
        ct = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        gn = jax.vjp(new, feat, w)[1](ct)
        go = jax.vjp(old, feat, w)[1](ct)
        np.testing.assert_allclose(np.asarray(gn[0]), np.asarray(go[0]),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gn[1]), np.asarray(go[1]),
                                   rtol=0, atol=1e-4)


class TestBlockedSelfAttention:
    """r5: the ViT attention is computed in query blocks (the full
    (B·V, H, 1025, 1025) matrices were the B=3 flagship's largest
    allocations).  Exact: same params tree AND same outputs as flax's
    MultiHeadDotProductAttention."""

    def test_matches_flax_mhdpa(self):
        from flax import linen as nn
        from generativedensification_tpu.models.vit import (
            BlockedSelfAttention,
        )

        B, L, D, H = 2, 37, 64, 4
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
        new = BlockedSelfAttention(D, H, q_block=16)
        old = nn.MultiHeadDotProductAttention(
            num_heads=H, qkv_features=D, deterministic=True,
            force_fp32_for_softmax=True)
        params = new.init({"params": jax.random.PRNGKey(0)}, x)
        import jax.tree_util as jtu

        paths_new = sorted(str(k) for k, _ in
                           jtu.tree_flatten_with_path(params)[0])
        paths_old = sorted(str(k) for k, _ in jtu.tree_flatten_with_path(
            old.init({"params": jax.random.PRNGKey(0)}, x, x))[0])
        assert paths_new == paths_old
        y_new = new.apply(params, x)
        y_old = old.apply(params, x, x)  # same params
        np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old),
                                   rtol=0, atol=1e-6)
