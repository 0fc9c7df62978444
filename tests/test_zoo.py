"""Zoo: registry, checkpoint save/load, torch-importer error handling, and
the bf16 (--half) eval path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_tpu.models import WACNN
from stf_tpu.training import create_train_state
from stf_tpu.zoo import load_checkpoint, models, save_checkpoint


SMALL = dict(N=16, M=24, num_slices=2, max_support_slices=1)


def test_registry_has_all_families():
    for name in ("cnn", "stf", "tbc", "cc", "cc_gd", "dystf"):
        assert name in models, name


def test_registry_unknown_lists_available():
    with pytest.raises(KeyError, match="cnn"):
        models["bogus"]


def test_checkpoint_roundtrip(tmp_path):
    model = WACNN(**SMALL)
    state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3))
    path = str(tmp_path / "m.msgpack")

    models["_test_small"] = lambda **kw: WACNN(**SMALL, **kw)
    try:
        save_checkpoint(path, "_test_small", state.params)
        model2, params2 = load_checkpoint(path)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(params2),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
        o1 = model.apply({"params": state.params}, x, training=False)
        o2 = model2.apply({"params": params2}, x, training=False)
        np.testing.assert_array_equal(
            np.asarray(o1["x_hat"]), np.asarray(o2["x_hat"])
        )
    finally:
        models.pop("_test_small", None)


def test_torch_import_missing_key_raises():
    from stf_tpu.zoo.torch_import import import_state_dict

    model = WACNN()
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)),
        training=False,
    )
    with pytest.raises(KeyError, match="missing torch key"):
        import_state_dict("cnn", variables["params"], {})


def test_strip_prefixes():
    from stf_tpu.zoo.torch_import import strip_prefixes

    sd = {"module.g_a.0.weight": 1, "h_s.old": 2, "g_s.0.weight": 3}
    out = strip_prefixes(sd)
    assert out == {"g_a.0.weight": 1, "g_s.0.weight": 3}


def test_bf16_codec_roundtrip():
    from stf_tpu.models import Codec

    model = WACNN(**SMALL)
    state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3))
    params16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        state.params,
    )
    codec = Codec(model, params16)
    x = np.asarray(jax.random.uniform(jax.random.key(2), (1, 64, 64, 3)))
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    x_hat = np.asarray(dec["x_hat"], np.float32)
    assert x_hat.shape == x.shape
    assert np.all(np.isfinite(x_hat))
    # deterministic bf16 round trip
    dec2 = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(x_hat, np.asarray(dec2["x_hat"], np.float32))


def test_flops_counter():
    from stf_tpu.utils.flops import model_flops

    model = WACNN(**SMALL)
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)),
        training=False,
    )
    stats = model_flops(model, variables["params"], (1, 64, 64, 3))
    assert stats["flops"] > 0
    assert stats["params"] == sum(
        p.size for p in jax.tree_util.tree_leaves(variables["params"])
    )


def test_strip_prefixes_legacy_parameterlist():
    from stf_tpu.zoo.torch_import import strip_prefixes

    sd = {
        "module.entropy_bottleneck._biases.0": 1,
        "entropy_bottleneck._matrices.3": 2,
        "entropy_bottleneck._factors.2": 3,
        "h_s.conv.weight": 5,
    }
    assert strip_prefixes(sd) == {
        "entropy_bottleneck._bias0": 1,
        "entropy_bottleneck._matrix3": 2,
        "entropy_bottleneck._factor2": 3,
    }
