"""Diagnose why dev_dsum_width reads ~0: caching vs DCE.

STATUS: UNRESOLVED — two launches hung before reaching the device
(~6s CPU then nothing; a fresh jax.devices() probe from another process
connected instantly both times, so the tunnel itself was fine).  The
in-graph device trace supersedes these microbenches for the dsum
question; kept for a future session.  fresh=True times with new index
arrays per call to defeat any (executable, args)-level result caching.
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
grad_rows = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))


def make_apos(seed):
    r = np.random.default_rng(seed)
    a = np.full((D * N,), M - 1, np.int32)
    live = r.random(D * N) < 0.5
    a[live] = r.integers(0, 320000, size=live.sum(), dtype=np.int32)
    return jnp.asarray(a)


def row(x, apos):
    by = apos.reshape(D, N)
    r = jnp.take(x, by[0], axis=0, mode="clip")
    for d in range(1, D):
        r = r + jnp.take(x, by[d], axis=0, mode="clip")
    return r


def chain_old(f):
    @jax.jit
    def run(x, apos):
        def body(_, carry):
            ap, acc = carry
            r = f(x, ap)
            ap = ap + (r.ravel()[0] * 0.0).astype(jnp.int32)
            return ap, acc + r.ravel()[0] * 0.0
        _, acc = jax.lax.fori_loop(0, ITERS, body, (apos, jnp.float32(0.0)))
        return acc
    return run


def chain_new(f):
    @jax.jit
    def run(x, apos):
        def body(_, carry):
            ap, acc = carry
            r = f(x, ap)
            s = jnp.sum(r)
            ap = ap + jnp.isnan(s).astype(jnp.int32)
            return ap, acc + s * 1e-30
        _, acc = jax.lax.fori_loop(0, ITERS, body, (apos, jnp.float32(0.0)))
        return acc
    return run


def timeit(name, run, x, fresh=False):
    a0 = make_apos(1)
    out = run(x, a0)
    jax.block_until_ready(out)
    dt = float("inf")
    for i in range(3):
        a = make_apos(2 + i) if fresh else a0
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        r = run(x, a)
        jax.block_until_ready(r)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{name:28s} {dt / ITERS * 1e3:7.3f} ms  acc={float(r):.3e}",
          flush=True)


# exact dev_dsum_ab rowv reproduction (old chain, .T view)
timeit("old-chain rowv (.T view)", chain_old(lambda x, a: row(x.T, a)),
       grad_cols)
# old chain on the materialized row-major operand (dev_dsum_ab 'row')
timeit("old-chain row (rows op)", chain_old(row), grad_rows)
# new chain, same variants
timeit("new-chain rowv (.T view)", chain_new(lambda x, a: row(x.T, a)),
       grad_cols)
timeit("new-chain rowv10", chain_new(lambda x, a: row(x[:10].T, a)),
       grad_cols)
# fresh indices per call (defeats any arg-level caching)
timeit("new-chain rowv10 freshapos", chain_new(lambda x, a: row(x[:10].T, a)),
       grad_cols, fresh=True)
timeit("old-chain rowv10 freshapos", chain_old(lambda x, a: row(x[:10].T, a)),
       grad_cols, fresh=True)
