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


@pytest.fixture(scope="module")
def tp_dataset(tmp_path_factory):
    # smooth images, not noise: a 1-step-trained entropy model assigns
    # ~zero likelihood to noise latents -> test loss inf -> is_best never
    # fires -> params_best.msgpack never written (fixture pathology)
    from PIL import Image

    root = tmp_path_factory.mktemp("tpdata")
    yy, xx = np.mgrid[0:80, 0:80] / 80.0
    # 4 test images: 2 per process shard = one full local test batch
    # (a 1-image shard under a 2-image batch drops everything ->
    # count 0 -> test loss inf -> is_best never fires)
    for split, n in (("train", 4), ("test", 4)):
        (root / split).mkdir()
        for i in range(n):
            img = np.stack(
                [0.5 + 0.3 * np.sin(xx * (3 + i) + s) * np.cos(yy * 2 + s)
                 for s in (0.0, 1.0, 2.0)],
                -1,
            )
            arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / split / f"img{i}.png")
    return str(root)


def _spawn_tp_workers(phase, tp_dataset, out_dir):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(TESTS_DIR), env.get("PYTHONPATH", "")]
    )
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(TESTS_DIR, "_mp_tp_worker.py"),
                str(i), "2", str(port), tp_dataset, str(out_dir), phase,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"tp worker ({phase}) failed:\n{out}"


def test_two_process_msgpack_tp_refusal(tp_dataset, tmp_path):
    """--tp 2 with the default msgpack format on a real 2-process mesh
    must SystemExit at STARTUP (the save would otherwise crash after a
    full epoch of compute, `training/train.py:151-160`)."""
    _spawn_tp_workers("refuse", tp_dataset, tmp_path)
    with open(tmp_path / "refuse.json") as f:
        assert json.load(f)["refused"]


def test_two_process_tensor_parallel_orbax(tp_dataset, tmp_path):
    """Train --tp 2 --ckpt-format orbax across two REAL processes (each
    model-axis shard spans both), resume from the collective save, and
    check the allgathered params sidecar + the orbax shards + a
    single-process run of the same recipe all agree."""
    _spawn_tp_workers("train_resume", tp_dataset, tmp_path)

    with open(tmp_path / "tp_result.json") as f:
        res = json.load(f)
    # 4 imgs / global batch 4 = 1 step per epoch
    assert res["step_epoch1"] == 1
    assert res["step_epoch2"] == 2

    save_dir = tmp_path / "ckpt"
    assert (save_dir / "orbax").is_dir()
    assert (save_dir / "params.msgpack").exists()
    assert (save_dir / "params_best.msgpack").exists()

    import jax
    import optax
    from flax import serialization

    from stf_tpu.models import WACNN
    from stf_tpu.training import create_train_state
    from stf_tpu.training.checkpoint import OrbaxCheckpointer

    model = WACNN(N=16, M=24, num_slices=2, max_support_slices=1)
    # template mirrors the worker's train.main state (same optimizer
    # structure: schedule + aux lr + clip)
    schedule = optax.piecewise_constant_schedule(
        1e-4, {320: 0.1, 345: 0.1}
    )
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3),
        learning_rate=schedule,
    )
    rb = OrbaxCheckpointer(str(save_dir), read_only=True)
    restored, meta = rb.restore(state)
    rb.close()
    assert int(restored.step) == 2
    assert meta["model"] == "cnn_tiny_test_mp"

    # the eval-CLI sidecar (written host-0 after a cross-process
    # allgather) must hold exactly the shards orbax persisted
    with open(save_dir / "params.msgpack", "rb") as f:
        sidecar = serialization.from_bytes(state.params, f.read())
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        sidecar, restored.params,
    )

    # single-process run of the same recipe (tp=2 on the in-process CPU
    # mesh): params after epoch 1 must match the 2-process run's epoch-1
    # sidecar up to fp reduction order
    from stf_tpu.training.train import main as train_main
    from stf_tpu.zoo import models as registry

    registry["cnn_tiny_test_mp"] = lambda **kw: WACNN(
        N=16, M=24, num_slices=2, max_support_slices=1, **kw
    )
    try:
        sp_dir = tmp_path / "sp_ckpt"
        sp_argv = [
            "-m", "cnn_tiny_test_mp",
            "-d", tp_dataset,
            "-e", "1",
            "--batch-size", "4",
            "--test-batch-size", "4",
            "--patch-size", "64", "64",
            "--save-dir", str(sp_dir),
            "--num-workers", "1",
            "--seed", "0",
            "--tp", "2",
            "--ckpt-format", "orbax",
        ]
        train_main(sp_argv)
        # mirror the worker's resume so both runs end after 2 epochs
        train_main(
            sp_argv[:5] + ["2"] + sp_argv[6:]
            + ["--checkpoint", str(sp_dir)]
        )
    finally:
        registry.pop("cnn_tiny_test_mp", None)
    with open(sp_dir / "params.msgpack", "rb") as f:
        sp_params = serialization.from_bytes(state.params, f.read())

    # Both runs ended after the same 2 epochs on the same global batches.
    # Partitioning differences reorder fp reductions, and Adam NORMALIZES
    # steps to ~±lr regardless of gradient magnitude — so an element whose
    # true gradient is near zero can take opposite-signed steps in the two
    # runs (measured: isolated elements drift ~1.5e-4 after 2 steps of
    # lr=1e-4). Element-wise rtol therefore can't be tight; instead:
    # every element must stay within the 2-sign-flipped-steps ceiling
    # (2 * 2 * lr), and the FRACTION of elements that moved more than one
    # step must be tiny — wrong wiring (wrong batch/restore/resume epoch)
    # flips a large fraction, not isolated near-zero-grad elements. Exact
    # math parity is pinned by the 2-process DP loss-equality test.
    counts = {"mismatch": 0, "total": 0}

    def acc(a, b):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        assert d.max() < 5e-4, f"param drift {d.max()} exceeds 2-step ceiling"
        counts["mismatch"] += int((d > 1.2e-4).sum())
        counts["total"] += d.size

    jax.tree_util.tree_map(acc, sp_params, sidecar)
    assert counts["mismatch"] / counts["total"] < 0.005, counts
