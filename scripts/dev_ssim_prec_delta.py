"""Measure the TPU SSIM value delta: bf16-pass convs (JAX DEFAULT) vs f32.

The reference forces fp32 SSIM; on TPU the default conv precision runs
one bf16 pass.  GD_SSIM_PREC selects; this probe quantifies the value
and gradient deviation on realistic inputs so the documented deviation
has a number (PERF.md r5).
"""
import sys, os, importlib
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
H, W = 512, 2048
a = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
b = np.clip(a + rng.normal(size=a.shape).astype(np.float32) * 0.05, 0, 1)
a, b = jnp.asarray(a), jnp.asarray(b)

vals = {}
grads = {}
CASES = {
    "shift": {"GD_SSIM_IMPL": "shift"},
    "conv_bf16pass": {"GD_SSIM_IMPL": "conv", "GD_SSIM_PREC": "default"},
    "conv_f32": {"GD_SSIM_IMPL": "conv", "GD_SSIM_PREC": "highest"},
}
for name, env in CASES.items():
    for k, v in env.items():
        os.environ[k] = v
    import generativedensification_tpu.train.loss as L
    importlib.reload(L)

    def f(x):
        return L.ms_ssim(x, b)

    v, g = jax.jit(jax.value_and_grad(f))(a)
    jax.block_until_ready(g)
    vals[name] = float(v)
    grads[name] = np.asarray(g)
    print(f"{name}: ms_ssim = {vals[name]:.8f}", flush=True)

dv = abs(vals["shift"] - vals["conv_f32"])
dg = np.abs(grads["shift"] - grads["conv_f32"])
gm = np.abs(grads["conv_f32"]).max()
print(f"value delta: {dv:.3e}")
print(f"grad max abs delta: {dg.max():.3e}  (rel to max |g| {gm:.3e}: "
      f"{dg.max()/max(gm,1e-30):.3e})")
