"""Worker process for the two-process jax.distributed test.

Run as: python _mp_worker.py <process_id> <num_processes> <port> <data_dir>
<out_dir>. Exercises the real multi-host path (the reference's DDP mode,
`train.py:323-364`): process-sharded ImageFolder loading,
make_array_from_process_local_data, host-0 gating, and the epoch barrier.
"""

import json
import os
import sys


def main(proc_id: int, nprocs: int, port: int, data_dir: str, out_dir: str):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )

    import numpy as np

    from stf_tpu.datasets import ImageFolder
    from stf_tpu.models import WACNN
    from stf_tpu.parallel import (
        create_mesh,
        data_parallel_shardings,
        is_main_process,
        make_parallel_train_step,
        process_count,
        sync_global_devices,
    )
    from stf_tpu.training import create_train_state, make_train_step

    assert process_count() == nprocs
    assert len(jax.devices()) == nprocs  # one CPU device per process

    mesh = create_mesh()
    _, data_sh = data_parallel_shardings(mesh)

    model = WACNN(N=16, M=24, num_slices=2, max_support_slices=1)
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    step = make_parallel_train_step(make_train_step(model, lmbda=0.01), mesh)

    ds = ImageFolder(data_dir, "train", (64, 64), seed=0)
    local = next(
        iter(ds.batches(1, epoch=0, num_workers=1, shard=(proc_id, nprocs)))
    )
    batch = jax.make_array_from_process_local_data(data_sh, local)

    state, metrics = step(state, batch, jax.random.key(1))
    loss = float(metrics["loss"])

    if is_main_process():  # host-0 gating, reference rank-0 semantics
        with open(os.path.join(out_dir, "mp_loss.json"), "w") as f:
            json.dump({"loss": loss, "nprocs": nprocs}, f)
    sync_global_devices("epoch")
    print(f"worker {proc_id} done, loss={loss}")


if __name__ == "__main__":
    main(
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        sys.argv[4], sys.argv[5],
    )
