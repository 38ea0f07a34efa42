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


def _symm6_from_scales_rots(scales, rotations):
    """Σ = R diag(s²) Rᵀ as six (N,) components (s00,s01,s02,s11,s12,s22).

    Fully scalar-expanded: batched (N, 3, 3) matmuls get TPU layouts with
    2-3 of 128 lanes used and cost ~6ms in the backward at 131k Gaussians;
    the component form is pure lane-parallel elementwise math (<0.5ms)."""
    q = rotations
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )  # matches core.transforms.quat_to_rotmat
    s = (scales[..., 0], scales[..., 1], scales[..., 2])
    m = [[r[j][i] * s[i] for i in range(3)] for j in range(3)]

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    return (
        dot3(m[0], m[0]), dot3(m[0], m[1]), dot3(m[0], m[2]),
        dot3(m[1], m[1]), dot3(m[1], m[2]), dot3(m[2], m[2]),
    )


def _symm6_from_cov3d(cov3d):
    return (
        cov3d[..., 0, 0], cov3d[..., 0, 1], cov3d[..., 0, 2],
        cov3d[..., 1, 1], cov3d[..., 1, 2], cov3d[..., 2, 2],
    )


def compute_cov2d_abc(
    mean_view: jnp.ndarray,
    symm6,
    view_rot: jnp.ndarray,
    focal_x,
    focal_y,
    tan_half_fovx,
    tan_half_fovy,
):
    """EWA Σ₂ = J W Σ₃ Wᵀ Jᵀ + λI, scalar-expanded -> (a, b, c) (N,) each.

    ``symm6``: the six upper-triangle components of Σ₃.
    ``view_rot``: (3, 3) world→view rotation (the W matrix; per-view
    scalars, so T = J @ W expands to 6 lane-parallel (N,) expressions)."""
    z = mean_view[..., 2]
    # clamp the projection point to the (dilated) frustum to bound J
    lim_x = FOV_CLAMP * tan_half_fovx
    lim_y = FOV_CLAMP * tan_half_fovy
    txz = jnp.clip(mean_view[..., 0] / z, -lim_x, lim_x)
    tyz = jnp.clip(mean_view[..., 1] / z, -lim_y, lim_y)
    x = txz * z
    y = tyz * z

    inv_z = 1.0 / z
    fxz = focal_x * inv_z
    fyz = focal_y * inv_z
    gx = focal_x * x * inv_z * inv_z   # -J[0,2]
    gy = focal_y * y * inv_z * inv_z   # -J[1,2]
    W = view_rot
    # T = J @ W rows (J = [[fxz, 0, -gx], [0, fyz, -gy]])
    t0 = tuple(fxz * W[0, k] - gx * W[2, k] for k in range(3))
    t1 = tuple(fyz * W[1, k] - gy * W[2, k] for k in range(3))

    s00, s01, s02, s11, s12, s22 = symm6

    def quad(u, v):
        return (
            u[0] * v[0] * s00 + u[1] * v[1] * s11 + u[2] * v[2] * s22
            + (u[0] * v[1] + u[1] * v[0]) * s01
            + (u[0] * v[2] + u[2] * v[0]) * s02
            + (u[1] * v[2] + u[2] * v[1]) * s12
        )

    a = quad(t0, t0) + LOWPASS
    b = quad(t0, t1)
    c = quad(t1, t1) + LOWPASS
    return a, b, c


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
        symm6 = _symm6_from_scales_rots(scales.astype(f32), rotations.astype(f32))
    else:
        symm6 = _symm6_from_cov3d(cov3d.astype(f32))
    view_rot = camera.world_view_transform[:3, :3].T  # (w2c.T)[:3,:3].T = R_w2c
    a, b, c = compute_cov2d_abc(
        p_view,
        symm6,
        view_rot,
        camera.focal_x,
        camera.focal_y,
        camera.tan_half_fovx,
        camera.tan_half_fovy,
    )

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
