"""The jitted data-parallel train / eval step.

One function traced once: forward (coarse + fine) -> loss -> grads ->
clip/AdamW/accumulate -> new state.  Parameters live replicated on the
mesh, the batch is sharded on its leading dim, and GSPMD inserts the
gradient all-reduce over ICI — the TPU-native replacement for the
reference's Lightning DDP wiring (``train_lightning.py:71-85``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .loss import Losses
from .state import TrainState


def make_train_step(
    net,
    tx,
    losses: Losses | None = None,
    with_fine: bool = True,
    donate: bool = True,
):
    """Build the jitted train step: (state, batch) -> (state, stats)."""
    losses = losses or Losses()

    def train_step(state: TrainState, batch):
        rng, drop_rng, shuf_rng = jax.random.split(state.rng, 3)

        def loss_fn(params):
            out = net.apply(
                params,
                batch,
                with_fine=with_fine,
                deterministic=False,
                rngs={"dropout": drop_rng, "shuffle": shuf_rng},
            )
            loss, stats = losses(batch, out, state.step)
            # surface the binning slot-cap overflow diagnostic: a non-zero
            # value means max_tiles clipped tile coverage and gradients are
            # silently wrong — must stay 0 in healthy training (PERF.md)
            stats = dict(stats)
            stats["overflow"] = jnp.sum(out["overflow"]).astype(jnp.float32)
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if not with_fine:
            # Coarse-only phase (step <= start_fine): the fine-stage params
            # get zero grads, and torch AdamW under Lightning
            # DDP(find_unused_parameters=True) skips them entirely — optax
            # adamw would still weight-decay them.  Zero the update for any
            # leaf whose gradient is identically zero.  Known deltas vs the
            # reference, both transient: (a) a USED leaf whose grad happens
            # to be exactly zero one step skips that step's momentum/decay
            # update (torch would apply it; its moments still update here
            # exactly as torch's); (b) structurally-unused leaves keep
            # mu = nu = 0 just like torch, but optax's bias-correction
            # count is global, so their first ~20 post-activation updates
            # are smaller than torch's fresh-state ones.
            updates = jax.tree.map(
                lambda u, g: jnp.where(jnp.any(g != 0), u, jnp.zeros_like(u)),
                updates,
                grads,
            )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        stats = dict(stats)
        stats["loss"] = loss
        stats["grad_norm"] = optax.global_norm(grads)
        return new_state, stats

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(net, losses: Losses | None = None, with_fine: bool = True):
    losses = losses or Losses()

    def eval_step(params, batch):
        out = net.apply(params, batch, with_fine=with_fine, deterministic=True)
        loss, stats = losses(batch, out, jnp.asarray(10**9))
        stats = dict(stats)
        stats["loss"] = loss
        return out, stats

    return jax.jit(eval_step)


def shard_train_step(train_step, mesh):
    """Constrain a compiled step's inputs: replicated state, data-sharded
    batch (GSPMD then lays out collectives over ICI)."""
    dat = NamedSharding(mesh, P("data"))

    def wrapped(state, batch):
        batch = jax.tree.map(lambda x: jax.device_put(x, dat), batch)
        return train_step(state, batch)

    return wrapped
