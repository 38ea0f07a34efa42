"""A/B the grad-slab -> per-Gaussian reduction (the #1 glue item, 3.0ms).

Variants (all reduce a (16, M)/(M, 16) aligned grad slab to per-Gaussian
(N, 16) sums through the slot-major apos map, D=4):
  row        — current default: D x (N,)-index ROW gathers from (M, 16)
               {0,1} + elementwise adds (gauss_dsum)
  row1       — ONE fused (D*N,)-index row gather + reshape + sum
  col        — D x (N,)-index LANE gathers from the attribute-major
               (16, M) slab + adds (output (16, N))
  col_t      — col + pallas_transpose16 back to (N, 16)
  row_bf16   — row gathers from a bf16 (M, 16) slab (halves bytes/access;
               VERDICT r3 weak #7 asked for the measurement)

Timing protocol: real-args jit (argless closure jits constant-fold through
the axon tunnel) + an in-device fori chain with a serial dependence so the
per-dispatch tunnel cost amortizes.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from generativedensification_tpu.splat.pallas_kernels import pallas_transpose16

N = 131072
D = 4
M = 591360  # _grad_slab_width(524288, 256) ballpark, TBLK-aligned
ITERS = 30

rng = np.random.default_rng(0)
grad_rows = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))
grad_cols = jnp.asarray(np.ascontiguousarray(np.asarray(grad_rows).T))
# apos: ~50% of slots dead (sentinel M-1), live ones random in the written
# prefix (~320k rows) — mirrors the bench scene's 258k live / 524k slots
apos_np = np.full((D * N,), M - 1, np.int32)
live = rng.random(D * N) < 0.5
apos_np[live] = rng.integers(0, 320000, size=live.sum(), dtype=np.int32)
apos = jnp.asarray(apos_np)
by_slot = apos.reshape(D, N)


def chain(f):
    @jax.jit
    def run(x, apos):
        def body(_, carry):
            ap, acc = carry
            r = f(x, ap)
            # serial dependence THROUGH THE INDICES: the next iteration's
            # apos depends on this result, so XLA can neither hoist the
            # gather nor overlap iterations (a latency-bound op measured
            # with independent iterations reports throughput, not the
            # critical-path cost the real backward pays)
            ap = ap + (r.ravel()[0] * 0.0).astype(jnp.int32)
            return ap, acc + r.ravel()[0] * 0.0
        _, acc = jax.lax.fori_loop(
            0, ITERS, body, (apos, jnp.float32(0.0))
        )
        return acc
    return run


def timeit(name, f, x, apos):
    run = chain(f)
    jax.block_until_ready(run(x, apos))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x, apos))
        dt = min(dt, time.perf_counter() - t0)
    print(f"{name:10s} {dt / ITERS * 1e3:7.3f} ms")


def row(x, apos):
    by = apos.reshape(D, N)
    r = jnp.take(x, by[0], axis=0, mode="clip")
    for d in range(1, D):
        r = r + jnp.take(x, by[d], axis=0, mode="clip")
    return r


def row1(x, apos):
    r = jnp.take(x, apos, axis=0, mode="clip")
    return r.reshape(D, N, 16).sum(axis=0)


def col(x, apos):
    by = apos.reshape(D, N)
    r = jnp.take(x, by[0], axis=1, mode="clip")
    for d in range(1, D):
        r = r + jnp.take(x, by[d], axis=1, mode="clip")
    return r


def col_t(x, apos):
    return pallas_transpose16(col(x, apos))


def row_bf16(x, apos):
    return row(x, apos).astype(jnp.float32)


def rowv(x, apos):
    """Row gathers from the TRANSPOSE VIEW of the packed attribute-major
    (16, M) slab — this is what the real backward does (the (M, 16)
    row-major array the plain ``row`` variant gathers from is physically
    128-lane PADDED on TPU, 512B/row for 64B useful; the in-graph form
    reads strided columns of the packed slab instead)."""
    return row(x.T, apos)


def rowv10(x, apos):
    """rowv from the 10-row live slice (the noabs _MODE_ROWS form)."""
    return row(x[:10].T, apos)


def rowv_dead(x, apos):
    """All indices at the dead sentinel M-1: measures what the ~50% dead
    slots of the real apos cost (one repeated row address)."""
    return row(x.T, jnp.full_like(apos, M - 1))


def rowv_live(x, apos):
    """All indices live/random: the other bound for the dead-slot cost."""
    live_idx = jnp.where(apos == M - 1, (apos * 7919) % 320000, apos)
    return row(x.T, live_idx)


def rowv_bf16(x, apos):
    return row(x.T, apos).astype(jnp.float32)


timeit("row", row, grad_rows, apos)
timeit("row1", row1, grad_rows, apos)
timeit("col", col, grad_cols, apos)
timeit("col_t", col_t, grad_cols, apos)
timeit("row_bf16", row_bf16, grad_rows.astype(jnp.bfloat16), apos)
timeit("rowv", rowv, grad_cols, apos)
timeit("rowv10", rowv10, grad_cols, apos)
timeit("rowv_dead", rowv_dead, grad_cols, apos)
timeit("rowv_live", rowv_live, grad_cols, apos)
timeit("rowv_bf16", rowv_bf16, grad_cols.astype(jnp.bfloat16), apos)
