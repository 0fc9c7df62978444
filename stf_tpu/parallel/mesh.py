"""Mesh/sharding utilities — the TPU-native replacement for the reference's
DDP/NCCL runtime (`compressai/utils/__init__.py:19-80`, `train.py:323-364`).

Mapping (SURVEY.md §2.9):
    DDP gradient all-reduce      -> jit over a `data`-sharded batch; XLA
                                    inserts the psum over ICI/DCN
    DistributedSampler           -> per-process dataset shard
                                    (`ImageFolder.batches(shard=...)`)
    rank gating (`is_main_process`) -> jax.process_index() == 0
    dist.barrier()               -> multihost sync_global_devices
    torchrun/SLURM rendezvous    -> jax.distributed.initialize()

The model itself is replicated (these codecs are ~30-75M params — far below
HBM); the batch axis is sharded. jit with NamedSharding-annotated inputs
compiles to one SPMD program; gradients are averaged automatically because
the loss is a mean over the sharded batch axis.
"""

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None, **kwargs):
    """Multi-host bring-up (call once per process before device use)."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator, **kwargs)
    else:
        jax.distributed.initialize(**kwargs)


def create_mesh(
    data: Optional[int] = None,
    devices: Optional[Sequence] = None,
    batch_size: Optional[int] = None,
) -> Mesh:
    """1-D data mesh over all (or the given) devices.

    When `batch_size` is given, the data axis is capped to the largest
    device count that divides it (a 2-image batch on an 8-device host uses
    2 devices — the reference's DDP has the analogous constraint via its
    process count)."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices)
    if batch_size is not None:
        while data > 1 and batch_size % data != 0:
            data -= 1
    return Mesh(np.asarray(devices[:data]).reshape(data), ("data",))


def data_parallel_shardings(mesh: Mesh):
    """(replicated, batch-sharded) NamedShardings for (state, batch)."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def make_parallel_train_step(train_step, mesh: Mesh):
    """jit the (state, batch, rng) -> (state, metrics) step for the mesh.

    Inputs: state replicated, batch sharded on `data`. Outputs keep the same
    shardings; metrics are scalars (replicated).
    """
    repl, data = data_parallel_shardings(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def sync_global_devices(name: str = "barrier"):
    """Host barrier (reference `dist.barrier()`, `train.py:417`)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
