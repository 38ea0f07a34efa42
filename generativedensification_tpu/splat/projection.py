"""Per-Gaussian view-space preprocessing (the EWA projection stage).

Differentiable jnp; XLA fuses the whole stage into a handful of MXU/VPU
fusions.  Math follows the EWA splatting formulation used by 3DGS (and
reproduced by the reference's CUDA forward): view transform -> perspective
Jacobian -> 2D covariance (+0.3 px low-pass) -> conic + screen radius.

Conventions pinned to the reference call sites
(``lightning/renderer.py:106-126, 234-259``):
  * matrices are row-vector ("transposed") form: ``p_view = [p,1] @ w2c.T``,
  * pixel centers via ndc2Pix: ``((ndc + 1) * S - 1) / 2``,
  * activations applied by the caller (scale=exp, opacity=sigmoid,
    rotation=normalize) — this stage consumes activated values.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.sh import eval_sh_color
from ..core.transforms import build_covariance

# 3DGS constants
NEAR_CULL = 0.2          # view-space z culling threshold
LOWPASS = 0.3            # pixel-space covariance dilation
RADIUS_SIGMA = 3.0       # extent = 3 sigma
FOV_CLAMP = 1.3          # clamp projected x/z, y/z to 1.3*tan(fov/2)


@struct.dataclass
class ProjectedGaussians:
    """Screen-space primitives for one view (leading dims = input dims)."""

    xy: jnp.ndarray        # (N, 2) pixel coordinates of the projected mean
    depth: jnp.ndarray     # (N,)  view-space z
    conic: jnp.ndarray     # (N, 3) inverse 2D covariance (a, b, c) packed
    color: jnp.ndarray     # (N, 3) RGB from SH
    opacity: jnp.ndarray   # (N,)  activated opacity
    radius: jnp.ndarray    # (N,)  screen-space extent in pixels (f32)
    valid: jnp.ndarray     # (N,)  bool — survives near/degenerate culling


def compute_cov2d(
    mean_view: jnp.ndarray,
    cov3d: jnp.ndarray,
    view_rot: jnp.ndarray,
    focal_x,
    focal_y,
    tan_half_fovx,
    tan_half_fovy,
) -> jnp.ndarray:
    """EWA: Σ₂ = J W Σ₃ Wᵀ Jᵀ + λI.

    Args:
      mean_view: (N, 3) view-space means.
      cov3d: (N, 3, 3) world-space covariance.
      view_rot: (3, 3) world→view rotation (the W matrix).
    Returns:
      (N, 2, 2) screen-space covariance (before conic inversion).
    """
    z = mean_view[..., 2]
    # clamp the projection point to the (dilated) frustum to bound J
    lim_x = FOV_CLAMP * tan_half_fovx
    lim_y = FOV_CLAMP * tan_half_fovy
    txz = jnp.clip(mean_view[..., 0] / z, -lim_x, lim_x)
    tyz = jnp.clip(mean_view[..., 1] / z, -lim_y, lim_y)
    x = txz * z
    y = tyz * z

    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(z)
    J = jnp.stack(
        [
            jnp.stack([focal_x * inv_z, zero, -focal_x * x * inv_z2], axis=-1),
            jnp.stack([zero, focal_y * inv_z, -focal_y * y * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    T = J @ view_rot  # (N, 2, 3)
    cov2d = T @ cov3d @ jnp.swapaxes(T, -1, -2)
    return cov2d + LOWPASS * jnp.eye(2, dtype=cov2d.dtype)


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray | None,
    shs: jnp.ndarray,
    opacity: jnp.ndarray,
    camera,
    sh_degree: int,
    scales: jnp.ndarray | None = None,
    rotations: jnp.ndarray | None = None,
    screen_offset: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project N Gaussians into one camera.

    Args:
      means3d: (N, 3) world means.
      cov3d: (N, 3, 3) world covariance, or None to build from
        ``scales`` (activated) + ``rotations`` (normalized quats).
      shs: (N, (deg+1)^2, 3) SH coefficients.
      opacity: (N,) activated opacity.
      camera: ``core.camera.Camera`` (single view).
      screen_offset: optional (N, 2) additive screen-space offset — the
        zero dummy through which screen-space gradients are observed
        (reference contract: ``renderer.py:234-247`` zero means2D tensor).
    """
    f32 = jnp.float32
    means3d = means3d.astype(f32)
    N = means3d.shape[0]
    ones = jnp.ones((N, 1), f32)
    hom = jnp.concatenate([means3d, ones], axis=-1)

    p_view = hom @ camera.world_view_transform[..., :3]  # (N, 3)
    depth = p_view[..., 2]

    p_clip = hom @ camera.full_proj_transform  # (N, 4)
    w = p_clip[..., 3:4]
    safe_w = jnp.where(jnp.abs(w) < 1e-7, jnp.sign(w) * 1e-7 + 1e-12, w)
    ndc = p_clip[..., :3] / safe_w

    xy = jnp.stack(
        [
            ((ndc[..., 0] + 1.0) * camera.width - 1.0) * 0.5,
            ((ndc[..., 1] + 1.0) * camera.height - 1.0) * 0.5,
        ],
        axis=-1,
    )
    if screen_offset is not None:
        xy = xy + screen_offset.astype(f32)

    if cov3d is None:
        cov3d = build_covariance(scales.astype(f32), rotations.astype(f32))
    view_rot = camera.world_view_transform[:3, :3].T  # (w2c.T)[:3,:3].T = R_w2c
    cov2d = compute_cov2d(
        p_view,
        cov3d,
        view_rot,
        camera.focal_x,
        camera.focal_y,
        camera.tan_half_fovx,
        camera.tan_half_fovy,
    )

    a = cov2d[..., 0, 0]
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1]
    det = a * c - b * b
    valid = (depth > NEAR_CULL) & (det > 0.0)
    safe_det = jnp.where(valid, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(RADIUS_SIGMA * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    # off-screen cull: bounding box entirely outside the image
    on_screen = (
        (xy[..., 0] + radius > 0)
        & (xy[..., 0] - radius < camera.width)
        & (xy[..., 1] + radius > 0)
        & (xy[..., 1] - radius < camera.height)
    )
    valid = valid & on_screen & (radius > 0)

    campos = camera.camera_center
    color = eval_sh_color(shs.astype(f32), means3d - campos, sh_degree)

    return ProjectedGaussians(
        xy=xy,
        depth=depth,
        conic=conic,
        color=color,
        opacity=opacity.astype(f32),
        radius=jnp.where(valid, radius, 0.0),
        valid=valid,
    )
