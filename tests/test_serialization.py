import numpy as np
import jax.numpy as jnp
import pytest

from generativedensification_tpu.serialization import (
    code_argsort,
    decode,
    encode,
    hilbert_decode,
    hilbert_encode,
    z_decode,
    z_encode,
)


def _as_int(code):
    """(N, 2) [hi, lo] int32 pairs -> python ints for assertions."""
    c = np.asarray(code).astype(np.int64)
    return (c[..., 0] << 24) | c[..., 1]


def _all_coords(depth):
    n = 1 << depth
    g = np.stack(np.meshgrid(*([np.arange(n)] * 3), indexing="ij"), -1)
    return g.reshape(-1, 3)


class TestZOrder:
    def test_known_bit_layout(self):
        # bit i of x -> 3i+2, y -> 3i+1, z -> 3i (reference z_order.py:41-50)
        assert _as_int(z_encode(jnp.asarray([[1, 0, 0]])))[0] == 0b100
        assert _as_int(z_encode(jnp.asarray([[0, 1, 0]])))[0] == 0b010
        assert _as_int(z_encode(jnp.asarray([[0, 0, 1]])))[0] == 0b001
        assert _as_int(z_encode(jnp.asarray([[2, 0, 0]])))[0] == 0b100000
        assert _as_int(z_encode(jnp.asarray([[3, 5, 6]])))[0] == (
            0b100100 | 0b010000010 | 0b001001000
        )

    def test_high_bits_cross_word_boundary(self):
        # bit 8 of x -> code bit 26 -> hi word bit 2
        code = z_encode(jnp.asarray([[256, 0, 0]]), depth=16)
        assert int(code[0, 0]) == 0b100 and int(code[0, 1]) == 0

    def test_roundtrip_exhaustive_depth3(self):
        g = _all_coords(3)
        codes = z_encode(jnp.asarray(g), depth=3)
        assert len(np.unique(_as_int(codes))) == len(g)  # bijective
        back = np.asarray(z_decode(codes, depth=3))
        np.testing.assert_array_equal(back, g)

    def test_roundtrip_random_depth16(self):
        rng = np.random.default_rng(0)
        g = rng.integers(0, 1 << 16, size=(1000, 3))
        back = np.asarray(z_decode(z_encode(jnp.asarray(g), 16), 16))
        np.testing.assert_array_equal(back, g)

    def test_code_argsort_is_lexicographic(self):
        rng = np.random.default_rng(4)
        g = rng.integers(0, 1 << 16, size=(512, 3))
        codes = z_encode(jnp.asarray(g), 16)
        perm = np.asarray(code_argsort(codes))
        vals = _as_int(codes)[perm]
        assert np.all(np.diff(vals) >= 0)


class TestHilbert:
    def test_roundtrip_exhaustive_depth3(self):
        g = _all_coords(3)
        codes = hilbert_encode(jnp.asarray(g), num_bits=3)
        c = _as_int(codes)
        assert len(np.unique(c)) == len(g)
        assert c.min() == 0 and c.max() == len(g) - 1  # a true permutation
        back = np.asarray(hilbert_decode(codes, num_bits=3))
        np.testing.assert_array_equal(back, g)

    def test_locality_consecutive_codes_are_adjacent(self):
        # the defining Hilbert property: consecutive curve positions are
        # L1-distance-1 neighbors in the grid
        depth = 3
        n = (1 << depth) ** 3
        lin = np.arange(n, dtype=np.int64)
        codes = jnp.stack(
            [jnp.asarray(lin >> 24, jnp.int32), jnp.asarray(lin & 0xFFFFFF, jnp.int32)],
            axis=-1,
        )
        pts = np.asarray(hilbert_decode(codes, num_bits=depth))
        steps = np.abs(np.diff(pts.astype(np.int64), axis=0)).sum(-1)
        np.testing.assert_array_equal(steps, 1)

    def test_roundtrip_random_depth16(self):
        rng = np.random.default_rng(1)
        g = rng.integers(0, 1 << 16, size=(500, 3))
        back = np.asarray(
            hilbert_decode(hilbert_encode(jnp.asarray(g), 16), 16)
        )
        np.testing.assert_array_equal(back, g)


class TestEncodeDispatch:
    def test_batch_packing(self):
        g = jnp.asarray([[1, 2, 3], [4, 5, 6]])
        b = jnp.asarray([0, 3])
        code = encode(g, b, depth=4, order="z")
        gc, batch = decode(code, depth=4, order="z")
        np.testing.assert_array_equal(np.asarray(batch), [0, 3])
        np.testing.assert_array_equal(np.asarray(gc), np.asarray(g))
        # batch dominates ordering (hi word compares first)
        assert int(code[1, 0]) > int(code[0, 0])

    def test_batch_packing_deep(self):
        rng = np.random.default_rng(2)
        g = jnp.asarray(rng.integers(0, 1 << 12, size=(64, 3)))
        b = jnp.asarray(rng.integers(0, 4, size=(64,)))
        code = encode(g, b, depth=12, order="z")
        gc, batch = decode(code, depth=12, order="z")
        np.testing.assert_array_equal(np.asarray(batch), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(gc), np.asarray(g))
        perm = np.asarray(code_argsort(code))
        assert np.all(np.diff(np.asarray(b)[perm]) >= 0)

    def test_trans_swaps_xy(self):
        g = jnp.asarray([[1, 2, 3]])
        gt = jnp.asarray([[2, 1, 3]])
        np.testing.assert_array_equal(
            np.asarray(encode(g, order="z-trans", depth=4)),
            np.asarray(encode(gt, order="z", depth=4)),
        )
        np.testing.assert_array_equal(
            np.asarray(encode(g, order="hilbert-trans", depth=4)),
            np.asarray(encode(gt, order="hilbert", depth=4)),
        )

    def test_unknown_order_raises(self):
        with pytest.raises(NotImplementedError):
            encode(jnp.zeros((1, 3), jnp.int32), order="peano")
