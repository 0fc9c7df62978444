"""CC_GD gate-decorator pruning tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_tpu.models.cc_gd import CC_GD
from stf_tpu.training.train_gd import (
    accumulate_scores,
    gate_l1_penalty,
    iter_gate_paths,
    param_scale,
    prune_export,
    prune_masks,
)
from stf_tpu.training.losses import rate_distortion_loss

SMALL = dict(N=32, M=40, num_slices=4, max_support_slices=2)


@pytest.fixture(scope="module")
def model_params():
    model = CC_GD(**SMALL)
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)),
        training=False,
    )
    return model, variables["params"]


def test_gates_present_and_forward(model_params):
    model, params = model_params
    gates = list(iter_gate_paths(params))
    # h_a(3) + h_mean_s(3) + h_scale_s(3) + 4 slices * 3 transforms * 2
    assert len(gates) == 9 + 4 * 3 * 2
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    out = model.apply(
        {"params": params}, x, training=True, rngs={"noise": jax.random.key(3)}
    )
    assert out["x_hat"].shape == x.shape


def test_gate_penalty_and_optimizer_freezes_masks(model_params):
    from stf_tpu.training import create_train_state

    model, _ = model_params
    state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3))
    pen = gate_l1_penalty(state.params)
    n_gate_ch = sum(
        g.shape[0] for _, g, _ in iter_gate_paths(state.params)
    )
    np.testing.assert_allclose(float(pen), n_gate_ch, rtol=1e-6)  # init ones

    # one train step: masks must stay exactly 1.0 (zeroed partition)
    from stf_tpu.training import make_train_step

    step = jax.jit(make_train_step(model, lmbda=0.01))
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    new_state, _ = step(state, x, jax.random.key(2))
    for _, _, mask in iter_gate_paths(new_state.params):
        np.testing.assert_array_equal(np.asarray(mask), 1.0)


def test_tick_optimizer_freezes_non_gate_params(model_params):
    """Regression: optax.masked passed raw gradients through for non-gate
    leaves (silent gradient ascent on frozen params during tick). The tick
    optimizer must leave every non-gate param bit-identical and move gates."""
    import optax

    from stf_tpu.training.train_gd import make_gate_tx

    model, params = model_params
    x = jax.random.uniform(jax.random.key(8), (1, 64, 64, 3))

    def loss_fn(p):
        out = model.apply(
            {"params": p}, x, training=True, rngs={"noise": jax.random.key(9)}
        )
        return rate_distortion_loss(out, x, 0.01).loss

    grads = jax.grad(loss_fn)(params)
    tx = make_gate_tx(1e-2)
    updates, _ = tx.update(grads, tx.init(params), params)
    new_params = optax.apply_updates(params, updates)

    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(new_params)[0]
    }
    gate_moved = 0
    for path, old in flat_old:
        key = jax.tree_util.keystr(path)
        new = flat_new[key]
        is_gate = any(getattr(k, "key", None) == "gate" for k in path)
        if is_gate:
            if not np.array_equal(np.asarray(old), np.asarray(new)):
                gate_moved += 1
        else:
            np.testing.assert_array_equal(
                np.asarray(old), np.asarray(new), err_msg=key
            )
    assert gate_moved > 0


def test_prune_masks_exact_count(model_params):
    """prune_masks with num=k zeroes exactly k channels when scores are
    unique and no keep floor binds (regression for the off-by-one)."""
    model, params = model_params
    rng = np.random.default_rng(0)
    scores = {
        path: rng.permutation(len(np.asarray(mask))).astype(np.float64) + 1.0
        for path, _, mask in iter_gate_paths(params)
    }
    # make scores globally unique by adding a distinct per-gate offset
    for j, path in enumerate(sorted(scores)):
        scores[path] = scores[path] + j * 1e-4
    total = sum(np.asarray(m).size for _, _, m in iter_gate_paths(params))
    pruned = prune_masks(params, scores, num=7, minimal_frac=0.0)
    kept = sum(
        int((np.asarray(m) > 0).sum()) for _, _, m in iter_gate_paths(pruned)
    )
    assert total - kept == 7


def test_score_accumulation_and_pruning(model_params):
    model, params = model_params
    x = jax.random.uniform(jax.random.key(4), (1, 64, 64, 3))

    def loss_fn(p):
        out = model.apply(
            {"params": p}, x, training=True, rngs={"noise": jax.random.key(5)}
        )
        return rate_distortion_loss(out, x, 0.01).loss

    grads = jax.grad(loss_fn)(params)
    scores = accumulate_scores({}, params, grads)
    assert len(scores) == len(list(iter_gate_paths(params)))
    assert all(np.all(s >= 0) for s in scores.values())

    before = param_scale(params)
    assert before == 1.0
    pruned = prune_masks(params, scores, num=10)
    after = param_scale(pruned)
    assert after < 1.0
    # keep floors respected: every gate keeps at least 1 channel
    for _, _, mask in iter_gate_paths(pruned):
        assert np.asarray(mask).sum() >= 1


def _prune_some(model, params, num, *, protect=()):
    """Prune `num` channels by random-gradient Taylor scores, forcing the
    masks of `protect`ed gates back to ones."""
    x = jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))

    def loss_fn(p):
        out = model.apply(
            {"params": p}, x, training=True, rngs={"noise": jax.random.key(7)}
        )
        return rate_distortion_loss(out, x, 0.01).loss

    grads = jax.grad(loss_fn)(params)
    scores = accumulate_scores({}, params, grads)
    pruned = prune_masks(params, scores, num=num)
    for path in protect:
        node = pruned
        for k in path:
            node = node[k]
        node["mask"] = np.ones_like(np.asarray(node["mask"]))
    return pruned


def test_prune_export_reload_exact(model_params, tmp_path):
    """prune -> export -> reload -> bit-identical forward at reduced param
    count. The bottleneck gate (h_a/gate_2) is protected: it is the one
    approximately-foldable gate (quantization reinserts medians between
    producer and consumer); every other fold must be exact."""
    from stf_tpu.training.train_gd import load_pruned_checkpoint

    model, params = model_params
    pruned_params = _prune_some(
        model, params, num=40, protect=[("h_a", "gate_2")]
    )

    exported, deps = prune_export(
        pruned_params, str(tmp_path), model_kwargs=dict(SMALL)
    )
    assert not any(
        k.startswith("gate_") for sub in exported.values()
        if isinstance(sub, dict) for k in sub
    )
    assert len(deps) == len(list(iter_gate_paths(params)))

    reloaded_model, reloaded_params = load_pruned_checkpoint(
        str(tmp_path / "pruned_model.msgpack")
    )
    n_before = sum(p.size for p in jax.tree_util.tree_leaves(params))
    n_after = sum(
        p.size for p in jax.tree_util.tree_leaves(reloaded_params)
    )
    assert n_after < n_before

    x = jax.random.uniform(jax.random.key(8), (1, 64, 64, 3))
    out_gated = model.apply({"params": pruned_params}, x, training=False)
    out_pruned = reloaded_model.apply(
        {"params": reloaded_params}, x, training=False
    )
    np.testing.assert_allclose(
        np.asarray(out_pruned["x_hat"]),
        np.asarray(out_gated["x_hat"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_pruned["likelihoods"]["y"]),
        np.asarray(out_gated["likelihoods"]["y"]),
        rtol=1e-4,
    )


def test_prune_export_bottleneck_slicing(model_params, tmp_path):
    """Pruning the bottleneck gate slices the entropy-bottleneck params and
    the hyper-synthesis inputs; the reloaded model runs end to end (the
    fold is approximate there by design — see prune_export docstring)."""
    from stf_tpu.training.train_gd import load_pruned_checkpoint

    model, params = model_params
    pruned_params = _prune_some(model, params, num=60)
    kept_z = int(
        (np.asarray(pruned_params["h_a"]["gate_2"]["mask"]) > 0).sum()
    )

    exported, deps = prune_export(
        pruned_params, str(tmp_path), model_kwargs=dict(SMALL)
    )
    assert deps["h_a/gate_2"] == kept_z
    assert exported["entropy_bottleneck"]["quantiles"].shape[0] == kept_z
    for name in ("h_mean_s", "h_scale_s"):
        inner = next(iter(exported[name]["deconv_0"]))
        assert exported[name]["deconv_0"][inner]["kernel"].shape[2] == kept_z

    reloaded_model, reloaded_params = load_pruned_checkpoint(
        str(tmp_path / "pruned_model.msgpack")
    )
    x = jax.random.uniform(jax.random.key(9), (1, 64, 64, 3))
    out = reloaded_model.apply({"params": reloaded_params}, x, training=False)
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["z"].shape[-1] == kept_z


def test_pruned_model_codec_roundtrip(model_params, tmp_path):
    """The pruned/reloaded model must CODE, not just forward: real
    compress -> decompress through the Codec (the reference's production
    path for a pruned checkpoint is eval_model over pruned_model.pth,
    train_gd.py:507-565). Host backend exact vs the gated original's
    decode; lane fused decode agrees within transform float noise."""
    from stf_tpu.models import Codec
    from stf_tpu.training.train_gd import load_pruned_checkpoint

    model, params = model_params
    pruned_params = _prune_some(
        model, params, num=40, protect=[("h_a", "gate_2")]
    )
    prune_export(pruned_params, str(tmp_path), model_kwargs=dict(SMALL))
    reloaded_model, reloaded_params = load_pruned_checkpoint(
        str(tmp_path / "pruned_model.msgpack")
    )

    x = np.asarray(jax.random.uniform(jax.random.key(10), (1, 64, 64, 3)))
    codec = Codec(reloaded_model, reloaded_params)
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    assert np.asarray(dec["x_hat"]).shape == x.shape

    # decode must be deterministic and must match the gated (unpruned
    # layout) model's codec output: the fold is exact away from the
    # protected bottleneck gate
    gated = Codec(model, pruned_params)
    enc_g = gated.compress(x)
    dec_g = gated.decompress(enc_g["strings"], enc_g["shape"])
    np.testing.assert_allclose(
        np.asarray(dec["x_hat"]), np.asarray(dec_g["x_hat"]), atol=1e-4
    )

    lane = Codec(reloaded_model, reloaded_params, coder="lane")
    enc_l = lane.compress(x)
    dec_l = lane.decompress(enc_l["strings"], enc_l["shape"])  # fused
    np.testing.assert_allclose(
        np.asarray(dec_l["x_hat"]), np.asarray(dec["x_hat"]),
        atol=1e-5, rtol=2e-2,
    )


def test_eval_cli_loads_pruned_export(model_params, tmp_path, capsys):
    """`eval_model -p pruned_model.msgpack` must reconstruct the pruned-
    width CC_GD from the .deps.json sidecar and produce metrics — the
    reference's production path for a pruned checkpoint (eval over
    pruned_model.pth)."""
    from PIL import Image

    from stf_tpu.cli.eval_model import main as eval_main

    model, params = model_params
    pruned_params = _prune_some(
        model, params, num=40, protect=[("h_a", "gate_2")]
    )
    prune_export(pruned_params, str(tmp_path), model_kwargs=dict(SMALL))

    ds = tmp_path / "ds"
    ds.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(ds / f"{i}.png")

    import json

    eval_main(
        [
            "-d", str(ds),
            "-a", "cc_gd",
            "-p", str(tmp_path / "pruned_model.msgpack"),
            "-r", str(tmp_path / "recon_pruned"),
        ]
    )
    r = json.loads(capsys.readouterr().out)["results"]
    assert r["bpp"][0] > 0 and np.isfinite(r["psnr"][0])


def test_init_from_cc_matches_cc_forward():
    """CC_GD seeded from a CC checkpoint (gates/masks at ones) must compute
    exactly what the CC computes — the reference's KEY_TABLE bootstrap."""
    from stf_tpu.models.cc import CC
    from stf_tpu.models.cc_gd import init_cc_gd_from_cc

    cc = CC(**SMALL)
    cc_vars = cc.init(
        {"params": jax.random.key(1), "noise": jax.random.key(2)},
        jnp.zeros((1, 64, 64, 3)),
        training=False,
    )
    gd = CC_GD(**SMALL)
    gd_vars = gd.init(
        {"params": jax.random.key(3), "noise": jax.random.key(4)},
        jnp.zeros((1, 64, 64, 3)),
        training=False,
    )
    gd_params = init_cc_gd_from_cc(cc_vars["params"], gd_vars["params"])

    x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))
    out_cc = cc.apply({"params": cc_vars["params"]}, x, training=False)
    out_gd = gd.apply({"params": gd_params}, x, training=False)
    np.testing.assert_allclose(
        np.asarray(out_gd["x_hat"]), np.asarray(out_cc["x_hat"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_gd["likelihoods"]["y"]),
        np.asarray(out_cc["likelihoods"]["y"]),
        rtol=1e-4,
    )
