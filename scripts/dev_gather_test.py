import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
N = 131072
P = 1048576
P_al = P + 32768
attrs = jnp.asarray(rng.normal(size=(N, 16)), jnp.float32)
attrs_t = jnp.asarray(np.ascontiguousarray(np.asarray(attrs).T))
ids = jnp.asarray(rng.integers(0, N, P), jnp.int32)
pos = jnp.asarray(rng.permutation(P_al)[:P], jnp.int32)

def timeit(f, iters=10):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f()
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/iters*1e3

# A: row gather (P,16)
fA = jax.jit(lambda: jnp.take(attrs, ids, axis=0).sum())
print("row gather (P,16):", round(timeit(fA),2), "ms")
# B: 16 element gathers
fB = jax.jit(lambda: sum(jnp.take(attrs_t[j], ids).sum() for j in range(16)))
print("16 elem gathers:", round(timeit(fB),2), "ms")
# C: row gather + row scatter + transpose
def c():
    g = jnp.take(attrs, ids, axis=0)
    s = jnp.zeros((P_al, 16), jnp.float32).at[pos].set(g, mode="drop")
    return s.T.sum()
print("gather+scatter+T:", round(timeit(jax.jit(c)),2), "ms")
# D: transpose alone
big = jnp.asarray(rng.normal(size=(P_al, 16)), jnp.float32)
fD = jax.jit(lambda: big.T @ jnp.ones((P_al,1)))
print("transpose+matvec:", round(timeit(fD),2), "ms")
# E: combined index then 16 element gathers at aligned positions
fE = jax.jit(lambda: sum(
    jnp.zeros(P_al, jnp.float32).at[pos].set(jnp.take(attrs_t[j], ids), mode="drop").sum()
    for j in range(16)))
print("16x (gather+scatter):", round(timeit(fE),2), "ms")
