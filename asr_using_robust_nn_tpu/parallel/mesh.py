"""Mesh construction and sharding helpers.

The reference is single-process Keras with no parallelism of any kind
(SURVEY.md §2.4). The TPU-native scaling surface for this workload is batch
data parallelism over a 1-D mesh: params replicated, batches split on the
'data' axis, gradients/metrics reduced by XLA collectives over ICI (psum
inserted by GSPMD), multi-host via jax.distributed left to the runner.
Model sizes (~1.65-2.8 M params) make TP/PP unnecessary; sequence length is
clamped at the frontend (44/101 frames), so long audio becomes more batch
rows — which this axis shards (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "data_mesh", "replicated", "sharded_batch", "DATA_AXIS",
    "maybe_init_distributed",
]

DATA_AXIS = "data"


def maybe_init_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Optional multi-host setup over DCN (SURVEY.md §2.4): call once per
    process before any jax op on a multi-host slice; no-op (False) when the
    environment provides no coordinator (single-host, the common case).
    After this, jax.devices() spans all hosts and the same 1-D data mesh
    code scales across them — collectives ride ICI within a slice and DCN
    between slices, all inserted by XLA."""
    import os

    import jax

    coord = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord is None:
        return False

    def _env_int(name):
        v = os.environ.get(name)
        return int(v) if v is not None else None

    # When neither the caller nor the env pins count/id, pass None through:
    # jax.distributed.initialize then uses its own cluster auto-detection
    # (TPU pod metadata, SLURM, ...). Defaulting to (1, 0) here would make
    # every host of a launcher-managed slice initialize as its own
    # 1-process cluster.
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=(num_processes if num_processes is not None
                       else _env_int("JAX_NUM_PROCESSES")),
        process_id=(process_id if process_id is not None
                    else _env_int("JAX_PROCESS_ID")),
    )
    return True


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_batch(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def pad_to_multiple(x: np.ndarray, m: int, axis: int = 0):
    """Pad a host batch so its leading dim divides the mesh size; returns
    (padded, true_n). Padding rows are zeros; callers mask metrics."""
    n = x.shape[axis]
    rem = (-n) % m
    if rem == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    return np.pad(x, pad_width), n
