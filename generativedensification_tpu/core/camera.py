"""Camera model (pinhole, 3DGS rasterization convention).

Parity notes (conventions pinned to the reference, re-derived here):
  * ``get_projection_matrix`` matches ``lightning/utils.py:5-19`` of the
    reference: an OpenGL-style perspective matrix with ``P[0,0]=1/tan(fovx/2)``,
    ``P[3,2]=+1`` (positive z sign) and z mapped to ``[0, zfar/(zfar-znear)]``
    range before the w-divide.
  * ``Camera`` matches ``MiniCam`` (``lightning/utils.py:22-48``): the
    rasterizer consumes *transposed* (row-vector) matrices
    ``world_view_transform = w2c.T`` and
    ``full_proj_transform = w2c.T @ P.T``, and the camera center carries the
    dataset's alignment convention ``camera_center = -c2w[:3, 3]``.
  * ``align_cameras`` reproduces the canonical "align cameras using first
    view" block repeated in every reference loader
    (``dataLoader/gobjverse.py:68-75``): re-normalize all poses so view 0
    sits at distance ``r`` on the -z axis looking at the origin.

All functions are jnp, shape-polymorphic over leading batch dims, and safe to
call under ``jit`` / ``vmap``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


def rigid_inverse(mat: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid [R t; 0 1] transform (f32-accurate)."""
    R = mat[..., :3, :3]
    t = mat[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -(Rt @ t[..., None])], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], mat.dtype), (*mat.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def get_projection_matrix(znear, zfar, fovx, fovy, dtype=jnp.float32):
    """OpenGL-style perspective projection used by the splatting pipeline.

    Maps view-space (x right, y down/up per dataset, z forward with +z sign)
    to clip space.  Column-vector convention; callers transpose for the
    rasterizer's row-vector layout.
    """
    znear, zfar, fovx, fovy = jnp.broadcast_arrays(
        jnp.asarray(znear, dtype),
        jnp.asarray(zfar, dtype),
        jnp.asarray(fovx, dtype),
        jnp.asarray(fovy, dtype),
    )
    tan_half_fovx = jnp.tan(fovx / 2)
    tan_half_fovy = jnp.tan(fovy / 2)

    zero = jnp.zeros_like(znear)
    one = jnp.ones_like(znear)
    p00 = 1.0 / tan_half_fovx
    p11 = 1.0 / tan_half_fovy
    p22 = zfar / (zfar - znear)
    p23 = -(zfar * znear) / (zfar - znear)

    rows = [
        [p00, zero, zero, zero],
        [zero, p11, zero, zero],
        [zero, zero, p22, p23],
        [zero, zero, one, zero],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


@struct.dataclass
class Camera:
    """A render camera, the unit consumed by the rasterizer.

    A pytree dataclass: every field is a jnp array so a batch of cameras is
    just a ``Camera`` with leading batch dims, usable under ``vmap``.
    Static render resolution lives in pytree-aux fields.
    """

    world_view_transform: jnp.ndarray  # (..., 4, 4)  = w2c.T  (row-vector)
    full_proj_transform: jnp.ndarray   # (..., 4, 4)  = w2c.T @ P.T
    camera_center: jnp.ndarray         # (..., 3)
    tan_half_fovx: jnp.ndarray         # (...)
    tan_half_fovy: jnp.ndarray         # (...)
    znear: jnp.ndarray                 # (...)
    zfar: jnp.ndarray                  # (...)
    height: int = struct.field(pytree_node=False, default=512)
    width: int = struct.field(pytree_node=False, default=512)

    @classmethod
    def from_c2w(
        cls,
        c2w: jnp.ndarray,
        fovx,
        fovy,
        width: int,
        height: int,
        znear=0.1,
        zfar=100.0,
    ) -> "Camera":
        """Build from a camera-to-world pose (NeRF convention, aligned frame).

        Note the reference convention ``camera_center = -c2w[:3, 3]``
        (``lightning/utils.py:48``) — a consequence of the dataset camera
        alignment, kept for numerical parity.
        """
        c2w = jnp.asarray(c2w, jnp.float32)
        batch_shape = c2w.shape[:-2]
        fovx = jnp.broadcast_to(jnp.asarray(fovx, jnp.float32), batch_shape)
        fovy = jnp.broadcast_to(jnp.asarray(fovy, jnp.float32), batch_shape)
        w2c = rigid_inverse(c2w)
        wvt = jnp.swapaxes(w2c, -1, -2)
        proj = get_projection_matrix(znear, zfar, fovx, fovy)
        full = wvt @ jnp.swapaxes(proj, -1, -2)
        return cls(
            world_view_transform=wvt,
            full_proj_transform=full,
            camera_center=-c2w[..., :3, 3],
            tan_half_fovx=jnp.tan(fovx / 2),
            tan_half_fovy=jnp.tan(fovy / 2),
            znear=jnp.asarray(znear, jnp.float32) * jnp.ones_like(fovx),
            zfar=jnp.asarray(zfar, jnp.float32) * jnp.ones_like(fovx),
            height=int(height),
            width=int(width),
        )

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_half_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_half_fovy)


def align_cameras(c2ws: jnp.ndarray, ref_dist: float | Any = None):
    """Re-normalize a set of poses so view 0 is canonical.

    Returns ``(aligned_c2ws, transform_mats)`` where
    ``aligned = transform @ c2w`` and ``transform = ref_c2w @ w2c[0]`` with
    ``ref_c2w`` placing the camera at ``(0, 0, -r)`` looking down +z
    (mirrors ``dataLoader/gobjverse.py:68-75``).
    """
    c2ws = jnp.asarray(c2ws, jnp.float32)
    if ref_dist is None:
        ref_dist = jnp.linalg.norm(c2ws[0, :3, 3])
    ref_c2w = jnp.eye(4, dtype=c2ws.dtype)
    # camera at (0,0,-r), axes: x -> -x, z -> +z (180deg yaw), y up unchanged
    ref_c2w = ref_c2w.at[:3, :3].set(
        jnp.array([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]], c2ws.dtype)
    )
    ref_c2w = ref_c2w.at[2, 3].set(-ref_dist)
    transform = ref_c2w @ rigid_inverse(c2ws[0])
    aligned = jnp.einsum("ij,njk->nik", transform, c2ws)
    return aligned, transform


def fov_to_intrinsics(fovx, fovy, width, height):
    """(3,3) pinhole intrinsics from fields of view (pixels, +0.5 center)."""
    fx = width / (2.0 * jnp.tan(jnp.asarray(fovx) / 2))
    fy = height / (2.0 * jnp.tan(jnp.asarray(fovy) / 2))
    return jnp.array(
        [[fx, 0.0, width / 2.0], [0.0, fy, height / 2.0], [0.0, 0.0, 1.0]],
        jnp.float32,
    )


def intrinsics_to_fov(ixt: jnp.ndarray, width, height):
    fovx = 2.0 * jnp.arctan2(width / 2.0, ixt[..., 0, 0])
    fovy = 2.0 * jnp.arctan2(height / 2.0, ixt[..., 1, 1])
    return fovx, fovy
