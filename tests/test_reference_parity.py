"""Cross-checks against the ACTUAL reference torch code (VERDICT r4 ask #3).

The reference's pure-torch/numpy modules import cleanly with the bare
torch-cpu wheel when loaded standalone via ``importlib`` (bypassing the
CUDA-dependent package ``__init__``s):

* ``lightning/point_decoder/utils/serialization/z_order.py`` + ``hilbert.py``
  — codec bit-equality on random depth-8/16 coords,
* ``tools/rsh.py`` — ``rsh_cart_3`` values,
* ``lightning/utils.py`` — ``MiniCam`` matrices, ``CosineWarmupScheduler``
  LR trajectory,
* ``dataLoader/utils.py`` — ``build_rays``.

These replace hand-derived goldens with the reference implementation itself
as the oracle.  Skipped wholesale when ``/root/reference`` or torch is
absent (public CI without the vendor drop).
"""

import importlib.util
import math
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference checkout not present", allow_module_level=True)


def _load(name, relpath):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_z = _load("ref_z_order", "lightning/point_decoder/utils/serialization/z_order.py")
ref_h = _load("ref_hilbert", "lightning/point_decoder/utils/serialization/hilbert.py")
ref_rsh = _load("ref_rsh", "tools/rsh.py")
ref_lutils = _load("ref_lightning_utils", "lightning/utils.py")
ref_dutils = _load("ref_dataloader_utils", "dataLoader/utils.py")


def _combine(code2):
    """Repo (N, 2) uint32 [hi, lo] pairs -> numpy int64 full codes.

    The repo packs 24 coordinate bits in ``lo`` (LO_BITS, zorder.py) and the
    remaining ``3*depth - 24`` above them in ``hi``.
    """
    c = np.asarray(code2).astype(np.uint64)
    return (c[..., 0] << np.uint64(24) | c[..., 1]).astype(np.int64)


@pytest.mark.parametrize("depth", [8, 16])
def test_zorder_bit_parity(depth):
    from generativedensification_tpu.serialization.zorder import z_decode, z_encode

    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 1 << depth, size=(2000, 3))
    tx = torch.from_numpy(xyz)
    ref_code = ref_z.xyz2key(tx[:, 0].long(), tx[:, 1].long(), tx[:, 2].long(),
                             b=None, depth=depth)
    got = _combine(z_encode(xyz.astype(np.uint32), depth=depth))
    np.testing.assert_array_equal(got, ref_code.numpy())

    # decode roundtrip against the reference decoder on the SAME keys
    rx, ry, rz, _ = ref_z.key2xyz(ref_code, depth=depth)
    ref_xyz = torch.stack([rx, ry, rz], dim=-1).numpy()
    from generativedensification_tpu.serialization.zorder import interleave3  # noqa: F401
    got_xyz = np.asarray(z_decode(np.asarray(z_encode(xyz.astype(np.uint32), depth=depth)),
                                  depth=depth))
    np.testing.assert_array_equal(got_xyz, ref_xyz)


@pytest.mark.parametrize("num_bits", [8, 16])
def test_hilbert_bit_parity(num_bits):
    from generativedensification_tpu.serialization.hilbert import (
        hilbert_decode,
        hilbert_encode,
    )

    rng = np.random.default_rng(1)
    xyz = rng.integers(0, 1 << num_bits, size=(2000, 3))
    ref_code = ref_h.encode(torch.from_numpy(xyz).long(), num_dims=3,
                            num_bits=num_bits)
    got = _combine(hilbert_encode(xyz.astype(np.uint32), num_bits=num_bits))
    np.testing.assert_array_equal(got, ref_code.numpy())

    ref_xyz = ref_h.decode(ref_code, num_dims=3, num_bits=num_bits).numpy()
    got_xyz = np.asarray(
        hilbert_decode(np.asarray(hilbert_encode(xyz.astype(np.uint32),
                                                 num_bits=num_bits)),
                       num_bits=num_bits))
    np.testing.assert_array_equal(got_xyz, ref_xyz)


def test_rsh_cart_3_parity():
    from generativedensification_tpu.core.sh import rsh_cart

    rng = np.random.default_rng(2)
    v = rng.normal(size=(4096, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    ref = ref_rsh.rsh_cart_3(torch.from_numpy(v)).numpy()
    got = np.asarray(rsh_cart(v, degree=3))
    assert got.shape == ref.shape == (4096, 16)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_minicam_parity():
    from generativedensification_tpu.core.camera import Camera

    rng = np.random.default_rng(3)
    for i in range(4):
        # random rigid c2w (NeRF convention like the eval path's MiniCam use)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = rng.normal(size=3)
        fovx, fovy = 0.6 + 0.3 * rng.random(2)
        cam_ref = ref_lutils.MiniCam(
            torch.from_numpy(c2w).float(), 512, 512,
            torch.tensor(fovy), torch.tensor(fovx), 0.1, 100.0, "cpu")
        cam = Camera.from_c2w(c2w.astype(np.float32), fovx, fovy, 512, 512,
                              znear=0.1, zfar=100.0)
        np.testing.assert_allclose(np.asarray(cam.world_view_transform),
                                   cam_ref.world_view_transform.numpy(),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(cam.full_proj_transform),
                                   cam_ref.full_proj_transform.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam.camera_center),
                                   cam_ref.camera_center.numpy(), atol=2e-6)


def test_build_rays_parity():
    from generativedensification_tpu.core.rays import build_rays

    rng = np.random.default_rng(4)
    V, H, W = 3, 32, 40
    c2ws = np.tile(np.eye(4, dtype=np.float64)[None], (V, 1, 1))
    for v in range(V):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w_, x, y, z = q
        c2ws[v, :3, :3] = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w_ * z), 2 * (x * z + w_ * y)],
            [2 * (x * y + w_ * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w_ * x)],
            [2 * (x * z - w_ * y), 2 * (y * z + w_ * x), 1 - 2 * (x * x + y * y)],
        ])
        c2ws[v, :3, 3] = rng.normal(size=3)
    ixts = np.tile(np.array([[50.0, 0, W / 2], [0, 55.0, H / 2], [0, 0, 1]])[None],
                   (V, 1, 1))
    # the reference mutates ixts in place; give each its own copy
    ref = ref_dutils.build_rays(c2ws.copy(), ixts.copy(), H, W, scale=1.0)
    got = np.asarray(build_rays(c2ws.astype(np.float32), ixts.astype(np.float32),
                                H, W, scale=1.0))
    assert got.shape == ref.shape == (V, H, W, 6)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_scheduler_lr_parity():
    """LR trajectory vs the reference CosineWarmupScheduler (which is, by its
    own code, warmup-then-CONSTANT-1e-4 — the cosine branch is commented out,
    ``lightning/utils.py:96-108``)."""
    from generativedensification_tpu.train.optim import warmup_then_constant

    base_lr, warmup = 4e-4, 50
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = ref_lutils.CosineWarmupScheduler(opt, warmup_iters=warmup,
                                             max_iters=200)
    schedule = warmup_then_constant(base_lr, warmup_iters=warmup)
    # torch LRScheduler sets the lr for _step_count=s at construction (s=1)
    # and after each .step(); repo schedule(s) must match the lr the
    # reference exposes at the same _step_count.
    for s in range(1, 120):
        ref_lr = opt.param_groups[0]["lr"]
        got = float(schedule(np.int32(s)))
        assert math.isclose(got, ref_lr, rel_tol=1e-6, abs_tol=1e-12), (s, got, ref_lr)
        sched.step()
