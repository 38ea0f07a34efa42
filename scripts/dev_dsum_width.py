"""Width sweep of the dsum row gather over the PACKED-slab transpose view.

STATUS: INCONCLUSIVE HARNESS — every variant reads ~0.001 ms on-chip:
XLA (or the axon execution cache) collapses the whole fori_loop despite
the serial dependence, in both the narrow-consumer and full-sum forms
(dev_dsum_diag.py chased it; the process also intermittently hung
pre-devices).  The numbers this script prints MUST NOT be trusted.
The width question it was built for is answered in-graph instead: the
device trace charges 3.0 ms for the 10-row-slice dsum gathers (PERF.md
round-4 trace), matching dev_dsum_ab's rowv10.  Kept for a future
session to fix the harness; see the axon discipline notes in PERF.md.

Original intent: from the (16, M) packed slab's (M, 16) bitcast view,
slicing the gather to 10 rows is 4.3x faster than 16 (3.24 vs 13.93 ms
serial, dev_dsum_ab) — far beyond the 10/16 byte ratio; map the curve
and test split-gather combinations.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 131072
D = 4
M = 591360
ITERS = 30

rng = np.random.default_rng(0)
grad_cols = jnp.asarray(rng.normal(size=(16, M)).astype(np.float32))
apos_np = np.full((D * N,), M - 1, np.int32)
live = rng.random(D * N) < 0.5
apos_np[live] = rng.integers(0, 320000, size=live.sum(), dtype=np.int32)
apos = jnp.asarray(apos_np)


def chain(f):
    @jax.jit
    def run(x, apos):
        def body(_, carry):
            ap, acc = carry
            r = f(x, ap)
            # consume the FULL result (a narrow consumer lets XLA slice
            # the gather itself away) and route the serial dependence
            # through a data-dependent zero (x*0.0 constant-folds)
            s = jnp.sum(r)
            ap = ap + jnp.isnan(s).astype(jnp.int32)
            return ap, acc + s * 1e-30
        _, acc = jax.lax.fori_loop(0, ITERS, body, (apos, jnp.float32(0.0)))
        return acc
    return run


def timeit(name, f):
    run = chain(f)
    jax.block_until_ready(run(grad_cols, apos))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(grad_cols, apos))
        dt = min(dt, time.perf_counter() - t0)
    print(f"{name:14s} {dt / ITERS * 1e3:7.3f} ms", flush=True)


def row_slice(r0, r1):
    def f(x, apos):
        v = x[r0:r1].T
        by = apos.reshape(D, N)
        r = jnp.take(v, by[0], axis=0, mode="clip")
        for d in range(1, D):
            r = r + jnp.take(v, by[d], axis=0, mode="clip")
        return r
    return f


def row_split(*spans):
    def f(x, apos):
        outs = []
        by = apos.reshape(D, N)
        for r0, r1 in spans:
            v = x[r0:r1].T
            r = jnp.take(v, by[0], axis=0, mode="clip")
            for d in range(1, D):
                r = r + jnp.take(v, by[d], axis=0, mode="clip")
            outs.append(r)
        return jnp.concatenate(outs, axis=1)
    return f


def row_1d():
    # 10 separate (M,)-operand 1-D gathers (one per attribute row)
    def f(x, apos):
        by = apos.reshape(D, N)
        outs = []
        for a in range(10):
            v = x[a]
            r = jnp.take(v, by[0], mode="clip")
            for d in range(1, D):
                r = r + jnp.take(v, by[d], mode="clip")
            outs.append(r)
        return jnp.stack(outs, axis=1)
    return f


for w in (1, 2, 3, 4, 5, 6, 8, 10, 12, 16):
    timeit(f"w{w}", row_slice(0, w))
timeit("split5+5", row_split((0, 5), (5, 10)))
timeit("split8+2", row_split((0, 8), (8, 10)))
timeit("split4+3+3", row_split((0, 4), (4, 7), (7, 10)))
timeit("split2x5", row_split((0, 2), (2, 4), (4, 6), (6, 8), (8, 10)))
timeit("rows_1d", row_1d())
