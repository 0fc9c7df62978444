"""End-to-end smoke tests for the two specialty trainer CLIs
(`dytrain.main`, `train_gd.main`) on a tiny synthetic dataset with
scaled-down registry models (CPU CI).

The component math of both trainers is covered elsewhere
(tests/test_dystf.py pins the distill loss, tests/test_cc_gd.py the
gates/tick-tock/prune-export machinery); these tests execute the actual
`main()` loops — teacher construction from the registry, tick scheduling,
stop conditions, checkpoint + prune-export wiring — the way production
invokes them (reference `dytrain.py:365-464`, `train_gd.py:392-505`).
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("trainer_ds")
    rng = np.random.default_rng(7)
    for split, n in (("train", 4), ("test", 2)):
        d = root / split
        d.mkdir()
        for i in range(n):
            arr = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def test_dytrain_main_end_to_end(tiny_dataset, tmp_path, capsys):
    """dytrain.main: builds the frozen teacher from the registry (student
    name minus the `dy` prefix), runs distill steps, evals with the same
    criterion, and writes the reference-shaped checkpoints."""
    from stf_tpu.models import DYSTF, SymmetricalTransFormer
    from stf_tpu.training.dytrain import main
    from stf_tpu.zoo import models

    tiny = dict(
        embed_dim=8, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 4),
        num_slices=4,
    )
    models["dystf_tiny_cli"] = lambda **kw: DYSTF(
        pruning_locs=(3, 4), sparse_ratio=(0.75, 0.5), **tiny, **kw
    )
    # teacher name is the student's minus the "dy" prefix
    models["stf_tiny_cli"] = lambda **kw: SymmetricalTransFormer(
        **tiny, **kw
    )
    try:
        save_dir = str(tmp_path / "ckpt_dy")
        state = main([
            "-m", "dystf_tiny_cli",
            "-d", tiny_dataset,
            "-e", "2",
            "--batch-size", "2",
            "--test-batch-size", "2",
            "--patch-size", "64", "64",
            "--ratio", "0.75,0.5",
            "--save-dir", save_dir,
            "--num-workers", "1",
            "--log-every", "1",
        ])
    finally:
        models.pop("dystf_tiny_cli", None)
        models.pop("stf_tiny_cli", None)

    # 4 imgs / batch 2 = 2 steps/epoch, 2 epochs
    assert int(state.step) == 4
    for leaf in __import__("jax").tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # reference-shaped checkpoint layout (epoch loop saved + best)
    assert os.path.exists(os.path.join(save_dir, "checkpoint.msgpack"))
    assert os.path.exists(os.path.join(save_dir, "checkpoint_best.msgpack"))
    # the loop really ran the distill criterion (pred/kl/token parts logged)
    out = capsys.readouterr().out
    assert "pred" in out and "kl" in out and "token" in out
    assert "dytrain test epoch 1" in out


def test_train_gd_main_tick_prune_export(tiny_dataset, tmp_path, capsys):
    """train_gd.main: a tick fires (tick-freq 1), masks actually prune
    (param_scale drops below 1), the flops-target stop condition ends the
    run, and the prune export reloads into a deps-built model."""
    import jax

    from stf_tpu.models.cc_gd import CC_GD
    from stf_tpu.training.train_gd import main, param_scale
    from stf_tpu.zoo import models

    models["cc_gd_tiny_cli"] = lambda **kw: CC_GD(
        N=32, M=40, num_slices=4, max_support_slices=2, **kw
    )
    try:
        save_dir = str(tmp_path / "ckpt_gd")
        state = main([
            "-m", "cc_gd_tiny_cli",
            "-d", tiny_dataset,
            "-e", "4",
            "--batch-size", "2",
            "--patch-size", "64", "64",
            "--tick-freq", "1",
            "--tick-round", "1",
            "--tick-num", "2",
            "--subset-scale", "1.0",
            # tick-num 2 on this tiny model prunes ~0.4% of params
            # (measured scale 0.9958) -> a 0.999 target trips the stop
            # condition after the first tick
            "--flops-target", "0.999",
            "--save-dir", save_dir,
            "--num-workers", "1",
            "--log-every", "1",
        ])
    finally:
        models.pop("cc_gd_tiny_cli", None)

    out = capsys.readouterr().out
    assert "tick at epoch 0" in out
    # tick pruned tick-num channels per round -> param scale below 1
    scale = param_scale(state.params)
    assert scale < 1.0
    # flops-target 0.99 stops after the first tick -> exactly 1 epoch ran
    assert "gd test epoch 1" not in out
    assert os.path.exists(os.path.join(save_dir, "checkpoint.msgpack"))

    # prune export was written with the model's REAL widths in the sidecar
    # and loads back into a deps-built model of those widths
    pruned = os.path.join(save_dir, "pruned_model.msgpack")
    deps_file = pruned + ".deps.json"
    assert os.path.exists(pruned) and os.path.exists(deps_file)
    with open(deps_file) as f:
        assert json.load(f)["model_kwargs"]["N"] == 32
    from stf_tpu.training.train_gd import load_pruned_checkpoint

    model, params = load_pruned_checkpoint(pruned)
    assert isinstance(model, CC_GD) and model.N == 32 and model.deps
    x = jax.numpy.zeros((1, 64, 64, 3))
    out_fwd = model.apply({"params": params}, x, training=False)
    assert np.all(np.isfinite(np.asarray(out_fwd["x_hat"])))
