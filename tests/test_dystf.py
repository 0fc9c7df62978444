"""DYSTF dynamic token pruning tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_tpu.models import Codec
from stf_tpu.models.dystf import DYSTF, gumbel_softmax_hard

TINY = dict(
    embed_dim=8,
    depths=(1, 1, 2, 1),
    num_heads=(1, 2, 4, 4),
    num_slices=4,
    # global block indexes: stage2 holds blocks 2,3 -> prune before block 3
    pruning_locs=(3, 4),
    sparse_ratio=(0.75, 0.5),
)


@pytest.fixture(scope="module")
def model_params():
    model = DYSTF(**TINY)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(
        {
            "params": jax.random.key(0),
            "noise": jax.random.key(1),
            "gumbel": jax.random.key(2),
        },
        x,
        training=True,
    )
    return model, variables["params"]


def test_gumbel_softmax_hard_is_onehot_with_st_grad():
    logits = jnp.array([[1.0, 2.0], [5.0, -1.0]])
    y = gumbel_softmax_hard(jax.random.key(0), logits)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, atol=1e-6)
    assert set(np.unique(np.asarray(y))).issubset({0.0, 1.0})
    g = jax.grad(
        lambda l: gumbel_softmax_hard(jax.random.key(0), l).sum()
    )(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_training_forward_returns_decisions_and_y(model_params):
    model, params = model_params
    x = jax.random.uniform(jax.random.key(3), (2, 64, 64, 3))
    out = model.apply(
        {"params": params}, x, training=True,
        rngs={"noise": jax.random.key(4), "gumbel": jax.random.key(5)},
    )
    assert out["x_hat"].shape == x.shape
    assert out["y"].shape == (2, 4, 4, 64)
    assert len(out["decisions"]) >= 1
    for mask in out["decisions"]:
        vals = np.unique(np.asarray(mask))
        assert set(vals).issubset({0.0, 1.0})


def test_eval_forward_topk_routing(model_params):
    model, params = model_params
    x = jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))
    out = model.apply({"params": params}, x, training=False)
    assert out["x_hat"].shape == x.shape
    # eval decisions are (keep, drop) index pairs with fixed sizes
    for keep, drop in out["decisions"]:
        n = keep.shape[1] + drop.shape[1]
        assert sorted(
            np.concatenate([np.asarray(keep)[0], np.asarray(drop)[0]])
        ) == list(range(n))


def test_eval_deterministic(model_params):
    model, params = model_params
    x = jax.random.uniform(jax.random.key(7), (1, 64, 64, 3))
    o1 = model.apply({"params": params}, x, training=False)
    o2 = model.apply({"params": params}, x, training=False)
    np.testing.assert_array_equal(np.asarray(o1["x_hat"]), np.asarray(o2["x_hat"]))


def test_codec_roundtrip(model_params):
    """Unlike the reference (whose dystf compress() is broken, SURVEY.md
    §2.5), the codec path works: analysis runs in eval mode with top-k
    routing."""
    model, params = model_params
    codec = Codec(model, params)
    x = np.asarray(jax.random.uniform(jax.random.key(8), (1, 64, 64, 3)))
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    assert np.asarray(dec["x_hat"]).shape == x.shape


def test_distill_loss():
    from stf_tpu.models import SymmetricalTransFormer
    from stf_tpu.training.dytrain import distill_pruning_loss

    student = DYSTF(**TINY)
    teacher = SymmetricalTransFormer(
        embed_dim=8, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 4),
        num_slices=4, is_teacher=True,
    )
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    sv = student.init(
        {"params": jax.random.key(1), "noise": jax.random.key(2),
         "gumbel": jax.random.key(3)},
        x, training=True,
    )
    tv = teacher.init(
        {"params": jax.random.key(4), "noise": jax.random.key(5)},
        x, training=False,
    )
    s_out = student.apply(
        sv, x, training=True,
        rngs={"noise": jax.random.key(6), "gumbel": jax.random.key(7)},
    )
    t_out = teacher.apply(tv, x, training=False)
    loss, parts = distill_pruning_loss(
        s_out, t_out, x, lmbda=0.01, keep_ratio=[0.75, 0.5]
    )
    assert np.isfinite(float(loss))
    for k in ("rd_loss", "pred_loss", "cls_kl", "token_kl"):
        assert np.isfinite(float(parts[k]))


def test_codec_lane_roundtrip(model_params):
    """Lane backend through the dynamic-pruning family: the decode walk's
    top-k routing must reproduce the host backend's reconstruction
    bit-exactly on the shared-executable per-slice walk."""
    model, params = model_params
    host = Codec(model, params, coder="host")
    lane = Codec(model, params, coder="lane")
    x = np.asarray(jax.random.uniform(jax.random.key(12), (1, 64, 64, 3)))
    enc_h = host.compress(x)
    enc_l = lane.compress(x)
    dec_f = lane.decompress(enc_l["strings"], enc_l["shape"])  # fused
    lane.fused = False
    dec_w = lane.decompress(enc_l["strings"], enc_l["shape"])
    dec_h = host.decompress(enc_h["strings"], enc_h["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec_w["x_hat"]), np.asarray(dec_h["x_hat"])
    )
    np.testing.assert_allclose(
        np.asarray(dec_f["x_hat"]), np.asarray(dec_h["x_hat"]),
        atol=1e-5, rtol=2e-2,
    )
