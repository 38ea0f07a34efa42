"""Pure-jnp math core: cameras, rays, spherical harmonics, rotations.

Everything in this package is dependency-free (jnp only), closed-form, and
unit-tested against analytic cases.  Conventions mirror the reference
implementation (see docstrings for file:line citations) so that released
checkpoints remain numerically comparable.
"""

from .camera import Camera, get_projection_matrix, align_cameras
from .rays import build_rays, build_rays_ortho
from .sh import rsh_cart, eval_sh_color, sh_dim
from .transforms import (
    quat_to_rotmat,
    normalize_quat,
    build_covariance,
    build_scaling_rotation,
)
from .activations import trunc_exp, inverse_sigmoid

__all__ = [
    "Camera",
    "get_projection_matrix",
    "align_cameras",
    "build_rays",
    "build_rays_ortho",
    "rsh_cart",
    "eval_sh_color",
    "sh_dim",
    "quat_to_rotmat",
    "normalize_quat",
    "build_covariance",
    "build_scaling_rotation",
    "trunc_exp",
    "inverse_sigmoid",
]
