"""BatchLoader prefetch must OVERLAP dataset IO with the training step.

VERDICT r3 ask #7: the distributed-loading story (SURVEY §2.8) claims the
background-thread prefetch hides HDF5 read latency behind the step; this
times it.  The dataset does a real HDF5 read plus a fixed sleep (sleep
makes the assertion robust to CPU contention — overlap of sleeps needs no
free core), the consumer "step" sleeps too; if prefetch works, wall time
approaches max(io, step) per batch instead of their sum.
"""

import os
import time

import h5py
import numpy as np

from generativedensification_tpu.data.pipeline import BatchLoader


class _H5SleepDataset:
    def __init__(self, path, n, io_sleep):
        self.path = path
        self.n = n
        self.io_sleep = io_sleep

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with h5py.File(self.path, "r") as f:
            img = f["images"][i][()]
        time.sleep(self.io_sleep)
        return {"images": img, "meta": {"i": i}}


def test_prefetch_overlaps_io_with_step(tmp_path):
    path = os.path.join(tmp_path, "scenes.h5")
    n, hw = 8, 64
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "images", data=np.random.default_rng(0).random((n, hw, hw, 3)),
            dtype=np.float32,
        )

    io_s, step_s = 0.10, 0.10
    ds = _H5SleepDataset(path, n, io_s)
    loader = BatchLoader(
        ds, batch_size=1, shuffle=False, num_prefetch=2,
        process_index=0, process_count=1,
    )

    t0 = time.perf_counter()
    nb = 0
    for batch in loader:
        assert batch["images"].shape == (1, hw, hw, 3)
        time.sleep(step_s)   # the "train step"
        nb += 1
    wall = time.perf_counter() - t0

    assert nb == n
    serial = n * (io_s + step_s)            # no-overlap lower bound ~1.6s
    overlapped = n * max(io_s, step_s)      # perfect overlap ~0.8s
    # require at least ~2/3 of the theoretical overlap win; the HDF5 read
    # itself (~ms) and thread wakeups eat a little of it
    assert wall < serial - 0.5 * (serial - overlapped), (
        f"prefetch did not overlap: wall={wall:.2f}s serial={serial:.2f}s "
        f"ideal={overlapped:.2f}s"
    )
