"""Worker for the two-process tensor-parallel + orbax checkpoint test.

Run as: python _mp_tp_worker.py <proc_id> <nprocs> <port> <data_dir>
<out_dir> <phase>. Each process gets TWO local CPU devices, so the
(data=2, model=2) mesh places each model-axis shard on devices from BOTH
processes — the exact cross-process sharding the orbax backend's
collective-save claims are about (`training/checkpoint.py:34-60`).

Phases:
  train_resume — train 1 epoch with --tp 2 --ckpt-format orbax (collective
      sharded save), then resume from the save dir for a 2nd epoch in the
      same process pair; writes step counts + a params digest.
  refuse — --tp 2 with the default msgpack format on a multi-host mesh
      must SystemExit at STARTUP (not at the first epoch save).
"""

import json
import os
import sys


def _digest(params):
    import jax
    import numpy as np

    from stf_tpu.training.checkpoint import _host_params

    hp = _host_params(params)  # collective: all processes call this
    leaves = jax.tree_util.tree_leaves(hp)
    return float(sum(np.abs(np.asarray(l), dtype=np.float64).sum()
                     for l in leaves))


def main(proc_id, nprocs, port, data_dir, out_dir, phase):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert len(jax.devices()) == 2 * nprocs

    from stf_tpu.models import WACNN
    from stf_tpu.zoo import models

    models["cnn_tiny_test_mp"] = lambda **kw: WACNN(
        N=16, M=24, num_slices=2, max_support_slices=1, **kw
    )

    from stf_tpu.training.train import main as train_main

    save_dir = os.path.join(out_dir, "ckpt")
    argv = [
        "-m", "cnn_tiny_test_mp",
        "-d", data_dir,
        "-e", "1",
        "--batch-size", "4",
        "--test-batch-size", "4",
        "--patch-size", "64", "64",
        "--save-dir", save_dir,
        "--num-workers", "1",
        "--seed", "0",
        "--tp", "2",
        "--ckpt-format", "orbax",
    ]

    if phase == "refuse":
        try:
            train_main([
                a if a != "orbax" else "msgpack" for a in argv
            ])
        except SystemExit as e:
            ok = "requires --ckpt-format orbax" in str(e)
            if proc_id == 0:
                with open(os.path.join(out_dir, "refuse.json"), "w") as f:
                    json.dump({"refused": ok, "message": str(e)}, f)
            print(f"worker {proc_id} refuse phase: {ok}")
            return
        raise AssertionError("msgpack+tp multi-host did not refuse")

    assert phase == "train_resume"
    state = train_main(argv)
    step1, digest1 = int(state.step), _digest(state.params)

    state2 = train_main(
        argv[:5] + ["2"] + argv[6:] + ["--checkpoint", save_dir]
    )
    step2, digest2 = int(state2.step), _digest(state2.params)

    if proc_id == 0:
        with open(os.path.join(out_dir, "tp_result.json"), "w") as f:
            json.dump(
                {
                    "step_epoch1": step1,
                    "digest_epoch1": digest1,
                    "step_epoch2": step2,
                    "digest_epoch2": digest2,
                },
                f,
            )
    print(f"worker {proc_id} done: steps {step1}->{step2}")


if __name__ == "__main__":
    main(
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        sys.argv[4], sys.argv[5], sys.argv[6],
    )
