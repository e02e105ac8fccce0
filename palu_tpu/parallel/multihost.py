"""Multi-host setup: the same (data, model) mesh over a pod slice.

TP (head groups) stays inside a host's ICI domain; DP (batch lanes /
continuous-batching requests) spans hosts over DCN. Collectives are still
inserted by GSPMD from the NamedSharding rules in mesh.py -- the only
multi-host-specific work is process bootstrap and host-local data feeding.

Exercised by a REAL 2-process jax.distributed cluster in
tests/test_multiprocess.py (cross-process collectives, host-local lane
feeding, process-spanning data axis); the driver's dryrun additionally
validates the sharded program on 8 virtual devices
(see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["initialize_multihost", "make_pod_mesh", "host_local_batch_slice"]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env fallbacks (JAX_COORDINATOR_ADDRESS
    / JAX_NUM_PROCESSES / JAX_PROCESS_ID). No-op when single-process."""
    if num_processes in (None, 1) and os.environ.get("JAX_NUM_PROCESSES", "1") == "1":
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(model_parallelism: int) -> Mesh:
    """(data, model) mesh over ALL devices in the slice: `model` uses the
    `model_parallelism` fastest-varying devices (intra-host ICI), `data`
    spans the rest (inter-host DCN for multi-host)."""
    devices = np.asarray(jax.devices())
    if len(devices) % model_parallelism:
        raise ValueError(
            f"{len(devices)} devices not divisible by model={model_parallelism}"
        )
    data = len(devices) // model_parallelism
    return Mesh(devices.reshape(data, model_parallelism), ("data", "model"))


def host_local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """Which rows of the global batch this host feeds (continuous batching
    shards requests over the data axis; each host owns the lanes whose data-
    axis shard lives on its devices)."""
    n_data = mesh.devices.shape[0]
    per = global_batch // n_data
    # find the data-axis coordinates owned by this process
    local = set()
    for i in range(n_data):
        row = mesh.devices[i]
        if any(d.process_index == jax.process_index() for d in np.atleast_1d(row)):
            local.add(i)
    lo = min(local) if local else 0
    hi = max(local) + 1 if local else 0
    return slice(lo * per, hi * per)
