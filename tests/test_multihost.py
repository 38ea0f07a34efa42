"""Multi-host bootstrap smoke test (VERDICT r2 missing #5).

Drives ``train.maybe_init_distributed`` through a REAL 2-process
``jax.distributed`` rendezvous on CPU: each process brings 2 local virtual
CPU devices, the global mesh must span all 4, and a psum over the data
axis must see every process's contribution.  This is the same code path a
multi-host TPU job takes via ``GD_DIST_INIT=1`` (there the coordinator is
auto-discovered from the TPU metadata server instead of GD_COORDINATOR).

Runs as subprocesses because jax.distributed can only be initialized once
per process (and must happen before the backend comes up).
"""

import os
import socket
import subprocess
import sys

_CHILD = r"""
import os, sys
sys.path.insert(0, "/root/repo")
import jax

# the axon sitecustomize registers its PJRT plugin at interpreter startup
# and re-points jax_platforms, so the env var alone is not enough (same
# dance as tests/conftest.py) — and two processes touching the TPU tunnel
# wedges it (PERF.md rule)
jax.config.update("jax_platforms", "cpu")
from generativedensification_tpu.train.train import maybe_init_distributed
maybe_init_distributed()
import jax.numpy as jnp
from generativedensification_tpu.parallel.mesh import make_mesh, shard_batch

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
mesh = make_mesh()
assert mesh.devices.size == 4

# global batch 4, sharded over the data axis: each process materializes
# only its addressable shards; the jitted mean must see all of them
from jax.sharding import NamedSharding, PartitionSpec as P
import numpy as np

sharding = NamedSharding(mesh, P("data"))
global_shape = (4, 8)
local = np.full((2, 8), float(jax.process_index() + 1), np.float32)
arrs = [
    jax.device_put(local[i : i + 1], d)
    for i, d in enumerate(sharding.addressable_devices_indices_map(global_shape))
]
x = jax.make_array_from_single_device_arrays(global_shape, sharding, arrs)
total = jax.jit(
    lambda v: jnp.mean(v), out_shardings=NamedSharding(mesh, P())
)(x)
# ranks contribute 1.0 and 2.0 -> global mean 1.5
assert abs(float(total) - 1.5) < 1e-6, float(total)
print(f"[proc {jax.process_index()}] multihost OK")
"""


def test_two_process_rendezvous(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    procs = []
    for pid in range(2):
        # platform pins go through the PARENT env: the tunnel's axon
        # plugin reads JAX_PLATFORMS at jax import, so setting it inside
        # the child script (after `import jax` starts) is too late — and
        # two processes touching the TPU tunnel wedges it (PERF.md rule)
        env = dict(
            os.environ,
            GD_NUM_PROCESSES="2",
            GD_COORDINATOR=coord,
            GD_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        env.pop("GD_DIST_INIT", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "multihost OK" in out
