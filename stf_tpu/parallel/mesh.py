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

The model itself is replicated by default (these codecs are ~30-75M params
— far below HBM); the batch axis is sharded. jit with
NamedSharding-annotated inputs compiles to one SPMD program; gradients are
averaged automatically because the loss is a mean over the sharded batch
axis.

Beyond reference parity (the reference's only strategy is DDP), a 2-D
`(data, model)` mesh adds tensor parallelism the GSPMD way: parameters are
annotated with PartitionSpecs (`tensor_parallel_shardings` shards
conv/linear output channels over the `model` axis) and XLA inserts the
all-gathers /
reduce-scatters over ICI. Shardings are layout, not semantics — the same
jitted step is numerically the data-parallel step. Pipeline / sequence /
expert parallelism are deliberately absent: the reference has no analog
(SURVEY.md §2.9) and these models are orders of magnitude below the scale
where they pay.
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
    model: int = 1,
) -> Mesh:
    """Device mesh: 1-D `(data,)` by default, 2-D `(data, model)` when
    `model` > 1 (tensor parallelism via `tensor_parallel_shardings`).

    When `batch_size` is given, the data axis is capped to the largest
    device count that divides it (a 2-image batch on an 8-device host uses
    2 devices — the reference's DDP has the analogous constraint via its
    process count)."""
    devices = list(devices if devices is not None else jax.devices())
    model = max(int(model), 1)
    if data is None:
        data = len(devices) // model
    if batch_size is not None:
        while data > 1 and batch_size % data != 0:
            data -= 1
    if data < 1 or data * model > len(devices):
        raise ValueError(
            f"mesh needs {max(data, 1)}x{model} devices, have "
            f"{len(devices)}"
        )
    if model == 1:
        return Mesh(np.asarray(devices[:data]).reshape(data), ("data",))
    return Mesh(
        np.asarray(devices[: data * model]).reshape(data, model),
        ("data", "model"),
    )


def data_parallel_shardings(mesh: Mesh):
    """(replicated, batch-sharded) NamedShardings for (state, batch)."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def tensor_parallel_shardings(tree, mesh: Mesh):
    """Per-leaf NamedShardings sharding every trailing channel axis that
    divides the `model` mesh axis; everything else replicated.

    This is GSPMD tensor parallelism: conv kernels (HWIO) and linear
    weights (IO) split across output channels, matching 1-D biases/scales
    split the same way, and XLA inserts the all-gathers/reduce-scatters
    the channel-mixing ops need. Applied to a whole TrainState it also
    covers the optimizer moments (their shapes mirror the params). The
    specs are layout only — any leaf they don't fit (odd widths, scalars,
    the step counter) stays replicated and the program is still the exact
    same math."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = int(axes.get("model", 1))

    def spec(leaf):
        shape = getattr(leaf, "shape", None)
        if tp > 1 and shape and shape[-1] % tp == 0:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + ["model"]))
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def make_parallel_train_step(train_step, mesh: Mesh, state=None):
    """jit the (state, batch, rng) -> (state, metrics) step for the mesh.

    1-D mesh (or `state=None`): state replicated, batch sharded on `data`
    (pure data parallelism, the reference's DDP). On a 2-D `(data, model)`
    mesh, pass the concrete initial `state` and its params + optimizer
    moments are additionally sharded over `model` via
    `tensor_parallel_shardings` — dp x tp in one jitted SPMD program. Outputs
    keep the input shardings; metrics are scalars (replicated).
    """
    repl, data = data_parallel_shardings(mesh)
    state_sh = repl
    if state is not None and "model" in mesh.axis_names:
        state_sh = tensor_parallel_shardings(state, mesh)
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
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
