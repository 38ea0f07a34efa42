"""Generative Densification — TPU-native (JAX / Flax / Pallas / pjit).

A from-scratch re-implementation of the capabilities of
stnamjef/GenerativeDensification (CVPR 2025, arXiv 2412.06234): feed-forward
generalizable 3D reconstruction with a LaRa-style multi-view transformer
producing coarse 3D Gaussians and a point-serialization transformer that
selectively densifies the highest-gradient Gaussians before differentiable
splatting.

Everything is designed TPU-first:
  * compute path: jnp / Flax modules traced under ``jax.jit``; the hot
    rasterization loop is a Pallas TPU kernel with a custom VJP,
  * static shapes everywhere (fixed point budgets + validity masks instead of
    the reference's dynamic top-k / masking),
  * parallelism via ``jax.sharding.Mesh`` + ``NamedSharding`` (data-parallel
    by default, mesh-ready parameter shardings).
"""

__version__ = "0.1.0"
