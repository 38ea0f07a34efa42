"""Serial on-chip A/B of the queued round-2 knobs (PERF.md "Queued on-chip A/Bs").

One process, strictly serial (tunnel rule), chained protocol (20-iter
device-resident fori_loop, min-of-2) so per-dispatch tunnel cost stays out
of the comparison.  Knobs are trace-time reads, so a fresh jit per variant
suffices; APOS_MODE is a module global and is set directly.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache: compiles dominate wall time on this 1-core
# host (~3-4 min per chain); cache makes re-measurement ~free
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from generativedensification_tpu.core.camera import Camera
from generativedensification_tpu.core.transforms import normalize_quat
from generativedensification_tpu.splat import rasterize
from generativedensification_tpu.splat import composite

rng = np.random.default_rng(0)
n = 131072
H = W = 512
means = jnp.asarray(rng.uniform(-0.45, 0.45, size=(n, 3)), jnp.float32)
shs = jnp.asarray(rng.normal(size=(n, 4, 3)) * 0.3 + 0.2, jnp.float32)
opa_raw = jnp.asarray(rng.normal(size=(n,)) - 1.0, jnp.float32)
scale_raw = jnp.asarray(
    rng.uniform(np.log(0.002), np.log(0.01), size=(n, 3)), jnp.float32)
quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
c2w = np.eye(4, dtype=np.float32); c2w[2, 3] = -1.9
cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, W, H, znear=0.1, zfar=10.0)
bg = jnp.ones(3)
gt = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)

KW32 = dict(sh_degree=1, tile_size=32, max_tiles=4, max_per_tile=4096,
            chunk=32)
# the honest 16px config (zero drops needs mt=9/enum=9; pair budget keeps
# slot space sane) — lost at 52.4ms under the slot-reduce apos design,
# re-measured under the dsum reduction
KW16 = dict(sh_degree=1, tile_size=16, max_tiles=9, enum_tiles=9,
            max_per_tile=4096, chunk=32, max_pairs=3 * n)
ITERS = 20


def timed_chain(KW=KW32):
    def loss_fn(means, shs, opa_raw, scale_raw, quats):
        out = rasterize(means, shs, jax.nn.sigmoid(opa_raw),
                        jnp.exp(scale_raw), quats, cam, bg, **KW)
        return jnp.mean((out.image - gt) ** 2)

    grad_fn = jax.grad(lambda p: loss_fn(*p))

    @jax.jit
    def chain(p):
        def body(_, q):
            g = grad_fn(q)
            return jax.tree.map(lambda a, b: a - 1e-30 * b, q, g)
        return jax.lax.fori_loop(0, ITERS, body, p)

    p0 = (means, shs, opa_raw, scale_raw, quats)
    jax.block_until_ready(chain(p0))
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(p0))
        dt = min(dt, time.perf_counter() - t0)
    return dt / ITERS


ALL_VARIANTS = {
    "base": ({}, "gauss", KW32),
    "rank": ({}, "rank", KW32),
    "gauss_dsum": ({}, "gauss_dsum", KW32),
    "rank_dsum": ({}, "rank_dsum", KW32),
    "scatter": ({"GD_APOS_INV": "scatter"}, "gauss", KW32),
    "scatter_dsum": ({"GD_APOS_INV": "scatter"}, "gauss_dsum", KW32),
    "approx": ({"GD_RECIP": "approx"}, "gauss_dsum", KW32),
    "ts16_dsum": ({}, "gauss_dsum", KW16),
}

names = sys.argv[1:] or list(ALL_VARIANTS)
import subprocess
import datetime

commit = subprocess.run(
    ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
    capture_output=True, text=True,
).stdout.strip() or "unknown"
with open("/tmp/ab_results.txt", "a") as out:
    out.write(
        f"# run {datetime.datetime.now().isoformat(timespec='seconds')} "
        f"commit={commit} variants={','.join(names)}\n"
    )
    for name in names:
        env, apos, kw = ALL_VARIANTS[name]
        for k in ("GD_APOS_INV", "GD_RECIP"):
            os.environ.pop(k, None)
        os.environ.update(env)
        composite.APOS_MODE = apos
        ms = timed_chain(kw) * 1e3
        line = f"{name:20s} {ms:7.2f} ms/render  ({1e3/ms:.1f} r/s)"
        print(line, flush=True)
        out.write(line + "\n")
        out.flush()
