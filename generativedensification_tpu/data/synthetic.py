"""Procedural synthetic dataset for tests and benchmarks.

Generates random Gaussian-blob scenes on an orbit camera rig and renders
ground-truth views with the framework's own (validated) rasterizer on
first access.  Used by the training smoke tests ("can the model overfit a
scene?") and as the zero-IO benchmark feed — the reference has no
counterpart (its de-facto test harness is the released checkpoints,
SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from .base import register_dataset
from .utils import align_first_view, build_rays_np, fov_to_ixt


def orbit_c2ws(n: int, radius: float = 1.9, elevation: float = 0.3):
    """n OpenCV-convention cameras orbiting the origin."""
    out = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = np.array(
            [
                radius * np.cos(elevation) * np.sin(ang),
                radius * np.sin(elevation),
                -radius * np.cos(elevation) * np.cos(ang),
            ]
        )
        z = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
        out.append(c2w)
    return np.stack(out)


def make_probe_batch(B: int, V_total: int, H: int, W: int, n_views: int,
                     seed: int = 0):
    """Random-image batch with a geometrically consistent orbit camera rig
    — the cheap shape/compile probe used by the driver contracts and the
    converter CLI (no rendering, no IO)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    fov = 0.8
    c2ws = orbit_c2ws(V_total)
    w2cs = np.linalg.inv(c2ws)
    c2ws, w2cs, _, r = align_first_view(c2ws, w2cs)
    ixt = fov_to_ixt(np.array([fov, fov]), [W, H])
    ixts = np.tile(ixt, (V_total, 1, 1))
    rays_down = build_rays_np(c2ws, ixts.copy(), H, W, 1.0 / 16)

    tile = lambda x: jnp.asarray(np.tile(x[None], (B,) + (1,) * x.ndim))
    return {
        "tar_rgb": jnp.asarray(
            rng.uniform(size=(B, V_total, H, W, 3)).astype(np.float32)
        ),
        "tar_c2w": tile(c2ws),
        "tar_w2c": tile(w2cs),
        "tar_ixt": tile(ixts.astype(np.float32)),
        "fovx": jnp.full((B,), fov, jnp.float32),
        "fovy": jnp.full((B,), fov, jnp.float32),
        "near_far": jnp.asarray(
            np.tile([r - 0.8, r + 0.8], (B, 1)).astype(np.float32)
        ),
        "bg_color": jnp.ones((B, V_total, 3), jnp.float32),
        "tar_rays_down": tile(rays_down),
    }


@register_dataset("synthetic")
class SyntheticDataset:
    def __init__(self, cfg):
        self.cfg = cfg
        self.img_size = np.array(cfg.img_size)
        self.n_group = cfg.n_group
        self.n_scenes = min(int(cfg.n_scenes), 64)
        self.n_gaussians = int(cfg.get("n_gaussians", 512)) if hasattr(cfg, "get") else 512
        self.fov = 0.8
        self._cache = {}

    def __len__(self):
        return self.n_scenes

    def _scene_gaussians(self, seed):
        rng = np.random.default_rng(seed)
        n = self.n_gaussians
        means = rng.uniform(-0.35, 0.35, size=(n, 3))
        shs = rng.normal(size=(n, 4, 3)) * 0.3
        shs[:, 0] += 0.6
        opa = rng.uniform(0.3, 0.95, size=(n,))
        scales = np.exp(rng.uniform(np.log(0.01), np.log(0.06), size=(n, 3)))
        quats = rng.normal(size=(n, 4))
        return means, shs, opa, scales, quats

    def _render_gt(self, seed, c2ws, ixts):
        import jax.numpy as jnp

        from ..core.camera import Camera
        from ..core.transforms import normalize_quat
        from ..splat import rasterize

        means, shs, opa, scales, quats = self._scene_gaussians(seed)
        H, W = self.img_size
        cams = Camera.from_c2w(
            jnp.asarray(c2ws), self.fov, self.fov, int(W), int(H),
            znear=0.1, zfar=10.0,
        )
        import jax

        imgs = jax.vmap(
            lambda c: rasterize(
                jnp.asarray(means, jnp.float32),
                jnp.asarray(shs, jnp.float32),
                jnp.asarray(opa, jnp.float32),
                jnp.asarray(scales, jnp.float32),
                normalize_quat(jnp.asarray(quats, jnp.float32)),
                c,
                jnp.ones(3),
                1,
                tile_size=16,
                max_tiles=16,
                max_per_tile=min(2048, self.n_gaussians * 4),
                chunk=32,
            ).image
        )(cams)
        return np.asarray(imgs)

    def __getitem__(self, index):
        if index in self._cache:
            return self._cache[index]
        V = 2 * self.n_group
        H, W = self.img_size
        c2ws = orbit_c2ws(V)
        w2cs = np.linalg.inv(c2ws)
        c2ws, w2cs, tmats, r = align_first_view(c2ws, w2cs)
        ixt = fov_to_ixt(np.array([self.fov, self.fov]), [W, H])
        ixts = np.tile(ixt, (V, 1, 1))

        imgs = self._render_gt(index, c2ws, ixts)
        ret = {
            "fovx": np.float32(self.fov),
            "fovy": np.float32(self.fov),
            "tar_c2w": c2ws,
            "tar_w2c": w2cs,
            "tar_ixt": ixts.astype(np.float32),
            "tar_rgb": imgs.astype(np.float32),
            "tar_msk": np.ones((V, int(H), int(W)), np.uint8),
            "bg_color": np.ones((V, 3), np.float32),
            "transform_mats": tmats,
            "near_far": np.array([r - 0.8, r + 0.8], np.float32),
            "meta": {
                "scene": f"synthetic_{index}",
                "tar_view": list(range(V)),
                "frame_id": 0,
                "tar_h": int(H),
                "tar_w": int(W),
            },
        }
        ret["tar_rays"] = build_rays_np(c2ws, ixts.copy(), H, W, 1.0)
        ret["tar_rays_down"] = build_rays_np(c2ws, ixts.copy(), H, W, 1.0 / 16)
        self._cache[index] = ret
        return ret
