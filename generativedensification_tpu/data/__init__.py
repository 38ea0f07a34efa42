"""Host-side data pipeline (numpy) + device feed.

Same dataset registry surface as the reference ``dataLoader/__init__.py``:
``dataset_dict[name](cfg)`` -> dataset yielding the standard batch dict
(SURVEY.md §2.6).  Loading is host-side numpy; batching/prefetch happens in
:mod:`.pipeline`, which shards scenes per process and feeds jnp batches.
"""

from .base import dataset_dict, register_dataset
from .pipeline import BatchLoader, collate

# register datasets
from . import gobjverse  # noqa: F401
from . import gso  # noqa: F401
from . import instant3d  # noqa: F401
from . import shapenet  # noqa: F401
from . import mipnerf  # noqa: F401
from . import synthetic  # noqa: F401

__all__ = ["dataset_dict", "register_dataset", "BatchLoader", "collate"]
