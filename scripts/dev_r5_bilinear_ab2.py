"""Device-trace the bilinear VJP A/B (trustworthy instrument)."""
import sys, os, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from generativedensification_tpu.models.backbone import bilinear_sample

V, H, W, C, M = 4, 512, 512, 8, 49152
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(size=(V, H, W, C)), jnp.float32)
xys = jnp.asarray(rng.uniform(-1, 1, (V, M, 2)), jnp.float32)
cts = jnp.asarray(rng.normal(size=(V, M, C)), jnp.float32)

def plain(img, xy_norm):
    Hh, Ww, Cc = img.shape
    x = ((xy_norm[..., 0] + 1.0) * Ww - 1.0) * 0.5
    y = ((xy_norm[..., 1] + 1.0) * Hh - 1.0) * 0.5
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = (x - x0)[..., None]; wy = (y - y0)[..., None]
    def tap(xi, yi):
        inb = (xi >= 0) & (xi < Ww) & (yi >= 0) & (yi < Hh)
        v = img[jnp.clip(yi, 0, Hh - 1).astype(jnp.int32),
                jnp.clip(xi, 0, Ww - 1).astype(jnp.int32)]
        return jnp.where(inb[..., None], v, 0.0)
    return (tap(x0, y0) * (1 - wx) * (1 - wy) + tap(x0 + 1, y0) * wx * (1 - wy)
            + tap(x0, y0 + 1) * (1 - wx) * wy + tap(x0 + 1, y0 + 1) * wx * wy)

def run(f, label):
    def vj(imgs, xys, cts):
        out, pull = jax.vjp(lambda a, b: jax.vmap(f)(a, b), imgs, xys)
        gi, gx = pull(cts)
        return out, gi, gx
    jf = jax.jit(vj)
    r = jf(imgs, xys, cts); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = jf(imgs, xys, cts)
    jax.block_until_ready(r)
    print(f"{label}: {(time.perf_counter()-t0)/10*1e3:.2f} ms/call incl dispatch", flush=True)
    tdir = f"/tmp/bl_trace_{label.split()[0]}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            r = jf(imgs, xys, cts)
        jax.block_until_ready(r)
    fpath = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    evs = json.loads(gzip.open(fpath).read())["traceEvents"]
    tot = collections.defaultdict(float)
    for e in evs:
        if e.get("ph") == "X" and "dur" in e and (e.get("args") or {}).get("long_name"):
            if not e["name"].startswith("jit_"):
                tot[e["name"]] += e["dur"]
    s = sum(tot.values())/3
    print(f"  device total {s/1e3:.2f} ms; top:")
    for n, v in sorted(tot.items(), key=lambda kv: -kv[1])[:4]:
        print(f"    {v/3:8.1f} us {n}")

run(bilinear_sample, "custom windowed-scatter")
run(plain, "plain autodiff")
