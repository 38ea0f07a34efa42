"""Device mesh + sharding rules.

The reference's only distribution strategy is 4-GPU DDP over NCCL
(SURVEY.md §2.8).  The TPU-native equivalent: a 1-D ``data`` mesh axis,
batches sharded on their leading dim, parameters replicated; XLA/GSPMD
inserts the gradient all-reduce over ICI.  The mesh helper accepts any
device count (8-device virtual CPU in tests, full slices in production)
and is multi-host ready (``jax.devices()`` spans processes under
``jax.distributed``; per-host batch sharding happens in the data pipeline
by ``jax.process_index()``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_data`` devices (-1: all)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_data > 0:
        devices = devices[:n_data]
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def shard_batch(batch, mesh: Mesh):
    """Shard every array's leading (batch) dim across the data axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
