"""Two-process jax.distributed training-step test (CPU backend).

The reference's production training mode is multi-process DDP
(`train.py:323-364`, `utils/__init__.py:34-56`). Our equivalent is
jax.distributed + a global mesh + make_array_from_process_local_data. This
test spawns two real processes (one CPU device each), runs one data-
parallel train step on a process-sharded ImageFolder batch, and checks the
loss equals a single-process run over the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(__file__)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mpdata")
    (root / "train").mkdir()
    rng = np.random.default_rng(42)
    for i in range(2):
        arr = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "train" / f"img{i}.png")
    return str(root)


def test_two_process_train_step_matches_single_process(
    tiny_dataset, tmp_path
):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(TESTS_DIR), env.get("PYTHONPATH", "")]
    )
    # children must not inherit the parent's 8-device flag
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(TESTS_DIR, "_mp_worker.py"),
                str(i), "2", str(port), tiny_dataset, str(tmp_path),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    with open(tmp_path / "mp_loss.json") as f:
        mp = json.load(f)
    assert mp["nprocs"] == 2

    # single-process reference: same global batch on a 2-device mesh
    import jax

    from stf_tpu.datasets import ImageFolder
    from stf_tpu.models import WACNN
    from stf_tpu.parallel import (
        create_mesh,
        make_parallel_train_step,
        shard_batch,
    )
    from stf_tpu.training import create_train_state, make_train_step

    model = WACNN(N=16, M=24, num_slices=2, max_support_slices=1)
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    mesh = create_mesh(data=2, devices=jax.devices()[:2])
    step = make_parallel_train_step(make_train_step(model, lmbda=0.01), mesh)

    ds = ImageFolder(tiny_dataset, "train", (64, 64), seed=0)
    batch = next(iter(ds.batches(2, epoch=0, num_workers=1)))
    state, metrics = step(state, shard_batch(batch, mesh), jax.random.key(1))

    np.testing.assert_allclose(
        float(metrics["loss"]), mp["loss"], rtol=1e-5
    )
