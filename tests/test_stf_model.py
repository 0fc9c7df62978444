"""STF (Swin codec) tests with a scaled-down config; protocol tests mirror
the WACNN suite, plus Swin-specific shape checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_tpu.layers.swin import (
    BasicLayer,
    PatchEmbed,
    PatchMerging,
    PatchSplit,
    SwinTransformerBlock,
)
from stf_tpu.models import Codec, SymmetricalTransFormer

TINY = dict(
    embed_dim=8,
    depths=(1, 1, 2, 1),
    num_heads=(1, 2, 4, 4),
    num_slices=4,
    drop_path_rate=0.1,
)
# latent C = 8 * 8 = 64, slice width 16, hyper N = 32


def init_tiny(seed=0):
    model = SymmetricalTransFormer(**TINY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.key(seed), "noise": jax.random.key(1)},
        x,
        training=False,
    )
    return model, variables["params"]


class TestSwinLayers:
    def test_block_shape_and_padding(self):
        m = SwinTransformerBlock(dim=16, num_heads=2, window_size=4, shift_size=2)
        x = jax.random.normal(jax.random.key(0), (2, 6, 10, 16))  # not /4
        v = m.init(jax.random.key(1), x)
        y = m.apply(v, x)
        assert y.shape == x.shape

    def test_patch_merging_halves(self):
        m = PatchMerging(dim=8)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 8))
        v = m.init(jax.random.key(1), x)
        y = m.apply(v, x)
        assert y.shape == (1, 4, 4, 16)

    def test_patch_split_doubles(self):
        m = PatchSplit(dim=16)
        x = jax.random.normal(jax.random.key(0), (1, 4, 4, 16))
        v = m.init(jax.random.key(1), x)
        y = m.apply(v, x)
        assert y.shape == (1, 8, 8, 8)

    def test_merge_then_split_restores_shape(self):
        mm = PatchMerging(dim=8)
        ms = PatchSplit(dim=16)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 8))
        vm = mm.init(jax.random.key(1), x)
        mid = mm.apply(vm, x)
        vs = ms.init(jax.random.key(2), mid)
        y = ms.apply(vs, mid)
        assert y.shape == x.shape

    def test_patch_embed(self):
        m = PatchEmbed(patch_size=2, embed_dim=12)
        x = jax.random.normal(jax.random.key(0), (1, 10, 10, 3))
        v = m.init(jax.random.key(1), x)
        y = m.apply(v, x)
        assert y.shape == (1, 5, 5, 12)

    def test_drop_path_eval_is_identity_train_is_random(self):
        m = SwinTransformerBlock(
            dim=16, num_heads=2, window_size=4, drop_path=0.5
        )
        x = jax.random.normal(jax.random.key(0), (4, 8, 8, 16))
        v = m.init(jax.random.key(1), x)
        y1 = m.apply(v, x, True)  # deterministic
        y2 = m.apply(v, x, True)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        y3 = m.apply(
            v, x, False, rngs={"droppath": jax.random.key(2)}
        )
        assert not np.array_equal(np.asarray(y1), np.asarray(y3))


class TestSTF:
    @pytest.fixture(scope="class")
    def model_params(self):
        return init_tiny()

    def test_forward_shapes(self, model_params):
        model, params = model_params
        x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
        out = model.apply(
            {"params": params},
            x,
            training=True,
            rngs={"noise": jax.random.key(3), "droppath": jax.random.key(4)},
        )
        assert out["x_hat"].shape == x.shape
        # y: 64/16 = 4 spatial, C = 64
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 64)
        assert out["likelihoods"]["z"].shape == (1, 1, 1, 32)

    def test_teacher_returns_y(self):
        model = SymmetricalTransFormer(is_teacher=True, **TINY)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            x,
            training=False,
        )
        out = model.apply(variables, x, training=False)
        assert out["y"].shape == (1, 4, 4, 64)

    def test_compress_decompress_roundtrip(self, model_params):
        model, params = model_params
        codec = Codec(model, params)
        x = np.asarray(jax.random.uniform(jax.random.key(5), (1, 64, 64, 3)))
        out_enc = codec.compress(x)
        out_dec = codec.decompress(out_enc["strings"], out_enc["shape"])
        x_hat = np.asarray(out_dec["x_hat"])
        assert x_hat.shape == x.shape
        # deterministic round trip
        out_dec2 = codec.decompress(out_enc["strings"], out_enc["shape"])
        np.testing.assert_array_equal(x_hat, np.asarray(out_dec2["x_hat"]))
        # eval-forward consistency (different fused program -> small drift)
        fwd = model.apply({"params": params}, jnp.asarray(x), training=False)
        np.testing.assert_allclose(
            x_hat, np.clip(np.asarray(fwd["x_hat"]), 0, 1), atol=2e-2
        )

    def test_grad_flows_everywhere(self, model_params):
        from stf_tpu.training.losses import rate_distortion_loss

        model, params = model_params
        x = jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))

        def loss_fn(p):
            out = model.apply(
                {"params": p}, x, training=True,
                rngs={"noise": jax.random.key(7)},
            )
            return rate_distortion_loss(out, x, 0.01).loss

        grads = jax.grad(loss_fn)(params)
        # analysis, synthesis, hyper, and slice transforms all get gradients
        for top in ["layer_0", "syn_layer_0", "h_a", "cc_mean_0", "patch_embed"]:
            leaves = jax.tree_util.tree_leaves(grads[top])
            assert any(np.any(np.asarray(g) != 0) for g in leaves), top
