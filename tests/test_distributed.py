"""Two-process jax.distributed smoke test (VERDICT r1 item 7).

Spawns two CPU subprocesses with a localhost coordinator and checks that
`maybe_init_distributed` wires them into one JAX runtime: global device
count = 2x local, distinct process indices, and a cross-process psum that
actually sums contributions from both hosts. Turns `parallel/mesh.py`'s
multi-host path from "wired" into "tested" — this is the same
jax.distributed bring-up a real multi-host TPU slice uses over DCN.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
# each process: single CPU device, no virtual-mesh flag
os.environ["XLA_FLAGS"] = ""
import jax
jax.config.update("jax_platforms", "cpu")

from asr_using_robust_nn_tpu.parallel import maybe_init_distributed

ok = maybe_init_distributed()
assert ok, "coordinator env set, must initialize"
import jax.numpy as jnp

nproc = jax.process_count()
pid = jax.process_index()
assert nproc == 2, nproc
assert jax.device_count() == 2 * jax.local_device_count()

# host-level collective: each process contributes (pid+1)
from jax.experimental import multihost_utils

total = multihost_utils.process_allgather(jnp.asarray([pid + 1.0]))
assert float(total.sum()) == 3.0, total

# DEVICE-level collective over the global mesh: build a global array from
# per-process shards and jit-reduce it — XLA must insert the cross-process
# all-reduce (the DCN path a real multi-host slice depends on)
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("data",))
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    np.asarray([pid + 1.0], dtype=np.float32),
    (jax.device_count(),),
)
out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(out) == 3.0, out
print(f"WORKER_OK pid={pid} nproc={nproc} devices={jax.device_count()}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init():
    port = _free_port()
    env_base = {
        **os.environ,
        "REPO": REPO,
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        "JAX_PLATFORMS": "cpu",
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid} nproc=2" in out, out
