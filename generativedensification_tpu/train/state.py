"""Train state + orbax checkpointing.

Checkpoint/resume contract mirrors the reference's Lightning
``ModelCheckpoint`` (SURVEY.md §5): params + optimizer state + step + PRNG
key saved periodically, resumable via ``ckpt_path``; orbax
``CheckpointManager`` replaces the Lightning callback.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def create_train_state(params, tx, seed: int = 0) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=jax.random.PRNGKey(seed),
    )


def _manager(ckpt_dir: str, max_to_keep: int | None = None):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    max_to_keep: int | None = None) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(ckpt_dir: str, template: TrainState,
                       step: int | None = None) -> TrainState:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored


def restore_params(ckpt_dir: str, step: int | None = None):
    """Restore only the ``params`` subtree of a training checkpoint.

    Template-free restore: the eval path must load *training* checkpoints
    whose full optimizer state it neither has nor wants — a mismatched
    state template cannot be used (r1 weak #7).
    """
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    restored = mgr.restore(step)  # raw pytree, as saved
    mgr.close()
    if isinstance(restored, dict) and "params" in restored:
        return restored["params"]
    return restored.params


def latest_step(ckpt_dir: str) -> int | None:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    s = mgr.latest_step()
    mgr.close()
    return s
