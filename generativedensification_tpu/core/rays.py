"""Ray construction (origin + direction per pixel), jnp-native.

Matches the reference math of ``dataLoader/utils.py:21-34`` (``build_rays``):
pixel centers at ``(x + 0.5, y + 0.5, 1)`` back-projected through ``K^-1``
then rotated to world by ``c2w[:3,:3]``; directions are *not* normalized
(they carry the 1/f scaling used by the Plücker embedding downstream).
"""

from __future__ import annotations

import jax.numpy as jnp


def build_rays(c2ws: jnp.ndarray, ixts: jnp.ndarray, H: int, W: int, scale: float = 1.0):
    """Per-pixel rays for V views.

    Args:
      c2ws: (V, 4, 4) camera-to-world poses.
      ixts: (V, 3, 3) intrinsics at full resolution (scaled internally).
      H, W: full resolution; output is at ``int(H*scale) x int(W*scale)``.

    Returns:
      (V, H', W', 6) array of [origin(3), direction(3)] per pixel.
    """
    Hs, Ws = int(H * scale), int(W * scale)
    c2ws = jnp.asarray(c2ws, jnp.float32)
    ixts = jnp.asarray(ixts, jnp.float32)
    ixts = ixts.at[:, :2].multiply(scale)

    x = jnp.arange(Ws, dtype=jnp.float32) + 0.5
    y = jnp.arange(Hs, dtype=jnp.float32) + 0.5
    X, Y = jnp.meshgrid(x, y, indexing="xy")
    pix = jnp.stack([X, Y, jnp.ones_like(X)], axis=-1)  # (H', W', 3)

    # direction_world = (K^-1 @ pix) rotated by R; as row vectors:
    # d = pix @ (K^-T R^T) = pix @ (K^-1)^T @ c2w[:3,:3]^T
    i2w = jnp.swapaxes(jnp.linalg.inv(ixts), -1, -2) @ jnp.swapaxes(
        c2ws[:, :3, :3], -1, -2
    )  # (V, 3, 3)
    dirs = jnp.einsum("hwc,vcd->vhwd", pix, i2w)
    origins = jnp.broadcast_to(c2ws[:, None, None, :3, 3], dirs.shape)
    return jnp.concatenate([origins, dirs], axis=-1)


def camera_rays(cam) -> jnp.ndarray:
    """Per-pixel rays (H, W, 6) straight from a ``core.Camera``.

    Equivalent to ``build_rays(c2w, K, H, W)`` for the camera's pose and
    fov-derived intrinsics (pixel centers at +0.5, unnormalized
    directions).  Used by the 2DGS render path's depth->normal lift, where
    the reference threads the loader's ``batch['tar_rays']``
    (``renderer_2dgs.py:75-90``) — same math, recomputed from the camera.
    """
    H, W = cam.height, cam.width
    x = (jnp.arange(W, dtype=jnp.float32) + 0.5 - W / 2.0) / cam.focal_x
    y = (jnp.arange(H, dtype=jnp.float32) + 0.5 - H / 2.0) / cam.focal_y
    X, Y = jnp.meshgrid(x, y, indexing="xy")
    d_cam = jnp.stack([X, Y, jnp.ones_like(X)], axis=-1)  # (H, W, 3)
    R_c2w = cam.world_view_transform[:3, :3]  # w2c.T upper block = R_c2w
    dirs = jnp.einsum("hwc,dc->hwd", d_cam, R_c2w)
    origin = -cam.camera_center  # camera_center = -c2w[:3, 3] convention
    origins = jnp.broadcast_to(origin, dirs.shape)
    return jnp.concatenate([origins, dirs], axis=-1)


def build_rays_ortho(c2ws: jnp.ndarray, H: int, W: int, scale: float = 1.0):
    """Orthographic rays (``dataLoader/utils.py:37-54`` semantics).

    Pixel grid mapped to [-scale, scale] on the camera plane; all directions
    equal the camera z axis.
    """
    c2ws = jnp.asarray(c2ws, jnp.float32)
    rot = c2ws[:, :3, :3]
    t = c2ws[:, :3, 3]

    d = jnp.einsum("c,vcd->vd", jnp.array([0.0, 0.0, 1.0]), jnp.swapaxes(rot, -1, -2))
    rays_d = jnp.broadcast_to(d[:, None, None, :], (c2ws.shape[0], H, W, 3))

    x = ((jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2 - 1.0) * scale
    y = ((jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2 - 1.0) * scale
    X, Y = jnp.meshgrid(x, y, indexing="xy")
    plane = jnp.stack([X, Y, jnp.zeros_like(X)], axis=-1)  # (H, W, 3)
    rays_o = jnp.einsum("hwc,vcd->vhwd", plane, jnp.swapaxes(rot, -1, -2)) + t[:, None, None, :]
    return jnp.concatenate([rays_o, rays_d], axis=-1)


def rays_to_plucker(rays: jnp.ndarray):
    """Rays (..., 6) -> Plücker coordinates (..., 6) = [d̂, o × d̂].

    Mirrors ``lightning/network.py:756-765``: direction normalized, moment is
    cross(origin, normalized direction).
    """
    o, d = rays[..., :3], rays[..., 3:6]
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
    m = jnp.cross(o, d)
    return jnp.concatenate([d, m], axis=-1)
