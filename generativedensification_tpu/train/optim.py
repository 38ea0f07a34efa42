"""Optimizer assembly (optax).

Parity with ``lightning/system.py:87-127`` + ``lightning/utils.py:89-108``:
AdamW lr 4e-4, betas (0.9, 0.95), weight decay 0.05 excluding biases and
LayerNorm parameters; linear warmup over 1000 iterations to the base lr,
then a *constant* 1e-4 (the cosine branch is commented out in the
reference); global-norm gradient clip 0.5; optional gradient accumulation
via ``optax.MultiSteps`` (``accumulate_grad_batches=2``).
"""

from __future__ import annotations

import jax
import optax


def warmup_then_constant(
    base_lr: float,
    warmup_iters: int = 1000,
    constant_lr: float = 1e-4,
    initial_lr: float = 1e-10,
):
    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.minimum(step.astype(jnp.float32) / warmup_iters, 1.0)
        warm = initial_lr + (base_lr - initial_lr) * frac
        return jnp.where(step <= warmup_iters, warm, constant_lr)

    return schedule


def _decay_mask(params):
    """True = apply weight decay.  Biases and norm scales are 1-D; every
    matrix/conv/embedding parameter is >= 2-D (matches the reference's
    LayerNorm+bias exclusion set)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def make_optimizer(
    params,
    lr: float = 4e-4,
    beta1: float = 0.9,
    beta2: float = 0.95,
    weight_decay: float = 0.05,
    warmup_iters: int = 1000,
    grad_clip: float = 0.5,
    accumulate: int = 1,
):
    schedule = warmup_then_constant(lr, warmup_iters)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            learning_rate=schedule,
            b1=beta1,
            b2=beta2,
            weight_decay=weight_decay,
            mask=_decay_mask(params),
        ),
    )
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx, schedule
