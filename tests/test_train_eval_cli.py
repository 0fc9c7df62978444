"""Smoke tests for the training loop and the eval CLI on a tiny synthetic
dataset with a scaled-down model (CPU CI)."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    for split, n in (("train", 6), ("test", 2)):
        d = root / split
        d.mkdir()
        for i in range(n):
            arr = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def tiny_registry(request):
    """Register a tiny model under a test-only name."""
    from stf_tpu.models import WACNN
    from stf_tpu.zoo import models

    models["cnn_tiny_test"] = lambda **kw: WACNN(
        N=16, M=24, num_slices=2, max_support_slices=1, **kw
    )
    request.addfinalizer(lambda: models.pop("cnn_tiny_test", None))
    return "cnn_tiny_test"


def test_train_two_epochs_and_resume(tiny_dataset, tiny_registry, tmp_path):
    from stf_tpu.training.train import main

    save_dir = str(tmp_path / "ckpt")
    argv = [
        "-m", tiny_registry,
        "-d", tiny_dataset,
        "-e", "2",
        "--batch-size", "2",
        "--test-batch-size", "2",
        "--patch-size", "64", "64",
        "--save-dir", save_dir,
        "--num-workers", "2",
    ]
    state = main(argv)
    assert int(state.step) == 2 * 3  # 6 imgs / batch 2 = 3 steps/epoch
    assert os.path.exists(os.path.join(save_dir, "checkpoint.msgpack"))
    assert os.path.exists(os.path.join(save_dir, "params.msgpack"))
    assert os.path.exists(os.path.join(save_dir, "checkpoint_best.msgpack"))

    # resume for one more epoch
    state2 = main(
        argv[:-2]
        + ["--num-workers", "2", "-e", "3", "--checkpoint",
           os.path.join(save_dir, "checkpoint.msgpack")]
    )
    assert int(state2.step) == 3 * 3


def test_train_tensor_parallel_cli(tiny_dataset, tiny_registry, tmp_path):
    """--tp 2 on the 8-device CPU mesh: params + optimizer moments shard
    over the model axis; training runs, saves, and the saved params are
    finite (numerical dp-equality is pinned in tests/test_parallel.py)."""
    import jax

    from stf_tpu.training.train import main

    save_dir = str(tmp_path / "ckpt_tp")
    state = main([
        "-m", tiny_registry,
        "-d", tiny_dataset,
        "-e", "1",
        "--batch-size", "2",
        "--test-batch-size", "2",
        "--patch-size", "64", "64",
        "--save-dir", save_dir,
        "--num-workers", "2",
        "--tp", "2",
    ])
    assert int(state.step) == 3
    # the training state really is tensor-parallel, not silently replicated
    assert any(
        getattr(leaf, "ndim", 0) == 4
        and "model" in str(leaf.sharding.spec)
        for leaf in jax.tree_util.tree_leaves(state.params)
    )
    assert os.path.exists(os.path.join(save_dir, "checkpoint.msgpack"))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_orbax_checkpoint_roundtrip_bit_exact(tiny_registry, tmp_path):
    """Orbax backend restores params/opt_state/step bit-identically
    (collective sharded save; template arrays keep their shardings)."""
    import jax
    import jax.numpy as jnp

    from stf_tpu.training import create_train_state, make_train_step
    from stf_tpu.training.checkpoint import (
        OrbaxCheckpointer,
        is_orbax_checkpoint,
    )
    from stf_tpu.zoo import models

    model = models[tiny_registry]()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    # one real step so opt_state moments are non-trivial
    step_fn = jax.jit(make_train_step(model, lmbda=0.01))
    batch = jnp.asarray(
        np.random.default_rng(0).random((2, 64, 64, 3), np.float32)
    )
    state, _ = step_fn(state, batch, jax.random.key(1))

    save_dir = str(tmp_path / "ck")
    ckpt = OrbaxCheckpointer(save_dir)
    ckpt.save(state, epoch=0, loss=1.25,
              meta={"model": tiny_registry, "lmbda": 0.01, "metric": "mse"},
              is_best=True, best_loss=1.25)
    ckpt.close()
    assert is_orbax_checkpoint(save_dir)
    # is_best=True writes BOTH eval-CLI sidecars
    assert os.path.exists(os.path.join(save_dir, "params.msgpack"))
    assert os.path.exists(os.path.join(save_dir, "params_best.msgpack"))

    fresh = create_train_state(
        model, jax.random.key(7), input_shape=(1, 64, 64, 3)
    )
    # restore through the read_only path (the foreign --checkpoint
    # dispatch): no writes to the source dir, and save() refuses
    ro = OrbaxCheckpointer(save_dir, read_only=True)
    restored, meta = ro.restore(fresh)
    with pytest.raises(RuntimeError, match="read_only"):
        ro.save(state, 1, 1.0, {}, False, 1.0)
    ro.close()
    assert meta["epoch"] == 0 and meta["best_loss"] == 1.25
    assert int(restored.step) == int(state.step)
    for want, got in zip(
        jax.tree_util.tree_leaves((state.params, state.opt_state)),
        jax.tree_util.tree_leaves((restored.params, restored.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_train_orbax_format_and_resume(tiny_dataset, tiny_registry, tmp_path):
    from stf_tpu.training.train import main

    save_dir = str(tmp_path / "ckpt_orbax")
    argv = [
        "-m", tiny_registry,
        "-d", tiny_dataset,
        "-e", "2",
        "--batch-size", "2",
        "--test-batch-size", "2",
        "--patch-size", "64", "64",
        "--save-dir", save_dir,
        "--ckpt-format", "orbax",
        "--num-workers", "2",
    ]
    state = main(argv)
    assert int(state.step) == 2 * 3
    assert os.path.isdir(os.path.join(save_dir, "orbax"))
    assert os.path.isdir(os.path.join(save_dir, "orbax_best"))
    assert os.path.exists(os.path.join(save_dir, "params.msgpack"))

    # resume from the save DIR (orbax dispatch) for one more epoch
    state2 = main(argv + ["-e", "3", "--checkpoint", save_dir])
    assert int(state2.step) == 3 * 3


def test_eval_cli(tiny_dataset, tiny_registry, tmp_path, capsys):
    import jax

    from stf_tpu.cli.eval_model import main as eval_main
    from stf_tpu.training import create_train_state
    from stf_tpu.zoo import models, save_checkpoint

    model = models[tiny_registry]()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    ckpt = str(tmp_path / "m.msgpack")
    save_checkpoint(ckpt, tiny_registry, state.params)

    recon = str(tmp_path / "recon")
    eval_main(
        [
            "-d", os.path.join(tiny_dataset, "test"),
            "-a", tiny_registry,
            "-p", ckpt,
            "-r", recon,
        ]
    )
    out = capsys.readouterr().out
    result = json.loads(out)
    r = result["results"]
    assert "psnr" in r and "bpp" in r and "encoding_time" in r
    assert r["bpp"][0] > 0
    assert len(os.listdir(recon)) == 2


def test_eval_cli_entropy_estimation(tiny_dataset, tiny_registry, tmp_path, capsys):
    import jax

    from stf_tpu.cli.eval_model import main as eval_main
    from stf_tpu.training import create_train_state
    from stf_tpu.zoo import models, save_checkpoint

    model = models[tiny_registry]()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    ckpt = str(tmp_path / "m.msgpack")
    save_checkpoint(ckpt, tiny_registry, state.params)

    eval_main(
        [
            "-d", os.path.join(tiny_dataset, "test"),
            "-a", tiny_registry,
            "-p", ckpt,
            "-r", str(tmp_path / "recon2"),
            "--entropy-estimation",
        ]
    )
    result = json.loads(capsys.readouterr().out)
    assert result["description"] == "Inference (entropy estimation)"
    assert result["results"]["bpp"][0] > 0


def test_eval_cli_lane_backend(tiny_dataset, tiny_registry, tmp_path, capsys):
    """--backend lane runs the TPU-resident entropy path (interpreted on
    CPU) through the real CLI and must agree with the host backend's
    metrics (same symbols; reconstructions differ only by fusion-level
    float noise)."""
    import jax

    from stf_tpu.cli.eval_model import main as eval_main
    from stf_tpu.training import create_train_state
    from stf_tpu.zoo import models, save_checkpoint

    model = models[tiny_registry]()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    ckpt = str(tmp_path / "ml.msgpack")
    save_checkpoint(ckpt, tiny_registry, state.params)

    results = {}
    for backend in ("host", "lane"):
        eval_main(
            [
                "-d", os.path.join(tiny_dataset, "test"),
                "-a", tiny_registry,
                "-p", ckpt,
                "-r", str(tmp_path / f"recon_{backend}"),
                "--backend", backend,
            ]
        )
        results[backend] = json.loads(capsys.readouterr().out)["results"]
    assert results["lane"]["bpp"][0] > 0
    np.testing.assert_allclose(
        results["lane"]["psnr"][0], results["host"]["psnr"][0], rtol=1e-4
    )


def test_eval_cli_half(tiny_dataset, tiny_registry, tmp_path, capsys):
    """--half runs bf16 transforms with an f32 entropy bottleneck (the
    RD-guarded configuration): metrics must stay finite and bpp must be
    close to the f32 run's (exact CDF tables either way)."""
    import jax

    from stf_tpu.cli.eval_model import main as eval_main
    from stf_tpu.training import create_train_state
    from stf_tpu.zoo import models, save_checkpoint

    model = models[tiny_registry]()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    ckpt = str(tmp_path / "mh.msgpack")
    save_checkpoint(ckpt, tiny_registry, state.params)

    results = {}
    for extra, tag in (([], "f32"), (["--half"], "bf16")):
        eval_main(
            ["-d", os.path.join(tiny_dataset, "test"),
             "-a", tiny_registry, "-p", ckpt,
             "-r", str(tmp_path / f"recon_h_{tag}")] + extra
        )
        results[tag] = json.loads(capsys.readouterr().out)["results"]
    assert np.isfinite(results["bf16"]["psnr"][0])
    np.testing.assert_allclose(
        results["bf16"]["bpp"][0], results["f32"]["bpp"][0], rtol=0.1
    )


def test_eval_cli_batched(tiny_dataset, tiny_registry, tmp_path, capsys):
    """--batch-size groups same-shape images through one codec walk."""
    import jax

    from stf_tpu.cli.eval_model import main as eval_main
    from stf_tpu.training import create_train_state
    from stf_tpu.zoo import models, save_checkpoint

    model = models[tiny_registry]()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    ckpt = str(tmp_path / "mb.msgpack")
    save_checkpoint(ckpt, tiny_registry, state.params)

    eval_main(
        [
            "-d", os.path.join(tiny_dataset, "test"),
            "-a", tiny_registry,
            "-p", ckpt,
            "-r", str(tmp_path / "recon_b"),
            "--batch-size", "2",
        ]
    )
    result = json.loads(capsys.readouterr().out)
    r = result["results"]
    assert r["bpp"][0] > 0 and np.isfinite(r["psnr"][0])
    assert len(os.listdir(tmp_path / "recon_b")) == 2


def test_eval_cli_pipeline(tiny_dataset, tiny_registry, tmp_path, capsys):
    """--pipeline 2 splits the channel-AR walk into interleaved
    sub-batches (the bench's WACNN shipping config); metrics must match
    the default single-sub walk exactly on the host backend (same
    symbols, same per-image streams)."""
    import jax

    from stf_tpu.cli.eval_model import main as eval_main
    from stf_tpu.training import create_train_state
    from stf_tpu.zoo import models, save_checkpoint

    model = models[tiny_registry]()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    ckpt = str(tmp_path / "mp.msgpack")
    save_checkpoint(ckpt, tiny_registry, state.params)

    results = {}
    for pipeline in ("1", "2"):
        eval_main(
            [
                "-d", os.path.join(tiny_dataset, "test"),
                "-a", tiny_registry,
                "-p", ckpt,
                "-r", str(tmp_path / f"recon_p{pipeline}"),
                "--batch-size", "2",
                "--pipeline", pipeline,
            ]
        )
        results[pipeline] = json.loads(capsys.readouterr().out)["results"]
    # host streams are per-image and pipeline-independent: bpp identical;
    # reconstructions differ only by sub-batch-shape compilation noise
    np.testing.assert_array_equal(results["2"]["bpp"], results["1"]["bpp"])
    np.testing.assert_allclose(
        results["2"]["psnr"], results["1"]["psnr"], rtol=1e-4
    )


def test_eval_cli_transform_chunks(tiny_dataset, tiny_registry, tmp_path,
                                   capsys):
    """--transform-chunks runs analyze/synthesize as lax.map chunks inside
    the jitted transforms (the HBM lever for large batches): metrics must
    match the unchunked batched run (same math, chunked schedule)."""
    import jax

    from stf_tpu.cli.eval_model import main as eval_main
    from stf_tpu.training import create_train_state
    from stf_tpu.zoo import models, save_checkpoint

    model = models[tiny_registry]()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    ckpt = str(tmp_path / "mc.msgpack")
    save_checkpoint(ckpt, tiny_registry, state.params)

    results = {}
    for chunks in ("1", "2"):
        eval_main(
            [
                "-d", os.path.join(tiny_dataset, "test"),
                "-a", tiny_registry,
                "-p", ckpt,
                "-r", str(tmp_path / f"recon_c{chunks}"),
                "--batch-size", "2",
                "--transform-chunks", chunks,
            ]
        )
        results[chunks] = json.loads(capsys.readouterr().out)["results"]
    assert results["2"]["bpp"][0] > 0
    np.testing.assert_allclose(
        results["2"]["bpp"][0], results["1"]["bpp"][0], rtol=0.02
    )
    np.testing.assert_allclose(
        results["2"]["psnr"][0], results["1"]["psnr"][0], rtol=1e-3
    )


@pytest.mark.parametrize("arch", ["cnn", "stf"])
def test_eval_cli_full_size_constructors(arch, tmp_path, capsys):
    """The PUBLISHED full-size constructors run end-to-end through the
    eval CLI at one small shape — closes the gap between 'tested' (tiny
    configs) and 'shipped' (full-size registry entries)."""
    import jax
    from PIL import Image

    from stf_tpu.cli.eval_model import main as eval_main
    from stf_tpu.training import create_train_state
    from stf_tpu.zoo import models, save_checkpoint

    d = tmp_path / "img"
    d.mkdir()
    rng = np.random.default_rng(3)
    Image.fromarray(
        (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    ).save(d / "a.png")

    model = models[arch]()  # full-size published config
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    ckpt = str(tmp_path / f"{arch}.msgpack")
    save_checkpoint(ckpt, arch, state.params)

    eval_main(
        ["-d", str(d), "-a", arch, "-p", ckpt,
         "-r", str(tmp_path / "recon")]
    )
    r = json.loads(capsys.readouterr().out)["results"]
    assert r["bpp"][0] > 0 and np.isfinite(r["psnr"][0])
