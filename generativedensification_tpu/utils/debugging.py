"""Debug / observability hooks (SURVEY.md §5 aux subsystems).

The reference leaves ``torch.autograd.set_detect_anomaly(True)`` on in
production (``train_lightning.py:31``) and has no profiler.  Here both are
config-gated:

  * ``nan_guard`` — wrap a step function so every output is checked for
    NaN/Inf after each call (cheap host-side check on already-computed
    stats; a full ``jax.debug``-level check would force materialization).
  * ``profile_step`` — ``jax.profiler`` trace context for N steps, dumping
    a TensorBoard-compatible trace to ``cfg.tpu.profile_dir``.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import numpy as np


def nan_guard(step_fn: Callable, enabled: bool = True) -> Callable:
    """Wrap (state, batch) -> (state, stats): raise on non-finite stats."""
    if not enabled:
        return step_fn

    def wrapped(state, batch):
        state, stats = step_fn(state, batch)
        bad = {
            k: float(v)
            for k, v in stats.items()
            if np.ndim(v) == 0 and not np.isfinite(float(v))
        }
        if bad:
            raise FloatingPointError(
                f"non-finite training stats (nan_check=True): {bad}"
            )
        return state, stats

    return wrapped


@contextlib.contextmanager
def maybe_profile(profile_dir: str | None):
    """Trace the enclosed steps to ``profile_dir`` if set."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
