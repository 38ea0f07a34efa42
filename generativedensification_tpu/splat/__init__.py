"""Differentiable 3D Gaussian splatting, TPU-native.

Replaces the reference's CUDA ``diff-gaussian-rasterization`` (GDM fork with
AbsGS absolute screen-space gradients + depth/alpha outputs, SURVEY.md §2.9.1)
and ``diff-surfel-rasterization`` (2DGS, §2.9.2).

Pipeline (all static shapes, ``jit``/``vmap``-safe):

  1. ``project_gaussians``   — perspective projection + EWA 2D covariance,
                               SH→RGB, culling mask (pure jnp, autodiff).
  2. ``bin_gaussians``       — tile binning: per-Gaussian tile-slot expansion
                               with a static duplication cap, one packed
                               uint32 (tile, depth-rank) sort per view,
                               per-tile segment offsets via searchsorted.
  3. ``composite``           — front-to-back alpha compositing over per-tile
                               depth-ordered slabs. ``jax.custom_vjp``: the
                               hand-written backward runs *front-to-back* as
                               well (prefix-sum trick: suffix contributions
                               S_i = C_final - A_i), and emits the AbsGS
                               absolute gradient channels as the cotangent of
                               a zero dummy input — mirroring the reference's
                               ``means2D.grad[:, 2:4]`` contract
                               (``lightning/network.py:865-878``).

Backends: an XLA (pure-jnp) implementation that runs everywhere, and Pallas
TPU kernels for the compositing hot loop (forward + backward).
"""

from .projection import project_gaussians, ProjectedGaussians
from .binning import bin_gaussians, TileBins
from .rasterizer import rasterize, render_view, Renderer, RasterizeOutput

__all__ = [
    "project_gaussians",
    "ProjectedGaussians",
    "bin_gaussians",
    "TileBins",
    "rasterize",
    "render_view",
    "Renderer",
    "RasterizeOutput",
]
