"""End-to-end tests for the WACNN codec: training forward, gradient split,
train step, and the real compress/decompress round trip.

Uses a scaled-down model (fewer channels/slices) so CPU CI stays fast; the
protocol (slice loop, lrp, hyper path) is identical to the full model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_tpu.models import Codec, WACNN
from stf_tpu.training import create_train_state, make_train_step
from stf_tpu.training.state import make_eval_step

SMALL = dict(N=32, M=40, num_slices=4, max_support_slices=2)


@pytest.fixture(scope="module")
def small_model_state():
    model = WACNN(**SMALL)
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    return model, state


class TestForward:
    def test_output_shapes(self, small_model_state):
        model, state = small_model_state
        x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
        out = model.apply(
            {"params": state.params}, x, training=True,
            rngs={"noise": jax.random.key(2)},
        )
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (2, 4, 4, SMALL["M"])
        assert out["likelihoods"]["z"].shape == (2, 1, 1, SMALL["N"])
        for lik in out["likelihoods"].values():
            assert np.all(np.asarray(lik) > 0)

    def test_eval_mode_deterministic(self, small_model_state):
        model, state = small_model_state
        x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
        out1 = model.apply({"params": state.params}, x, training=False)
        out2 = model.apply({"params": state.params}, x, training=False)
        np.testing.assert_array_equal(
            np.asarray(out1["x_hat"]), np.asarray(out2["x_hat"])
        )


class TestGradientSplit:
    def test_rd_loss_does_not_touch_quantiles(self, small_model_state):
        from stf_tpu.training.losses import rate_distortion_loss

        model, state = small_model_state
        x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))

        def rd_only(params):
            out = model.apply(
                {"params": params}, x, training=True,
                rngs={"noise": jax.random.key(2)},
            )
            return rate_distortion_loss(out, x, 0.01).loss

        grads = jax.grad(rd_only)(state.params)
        q_grad = grads["entropy_bottleneck"]["quantiles"]
        np.testing.assert_allclose(np.asarray(q_grad), 0.0)
        # but the transform stack does receive gradients
        g_a_grad = jax.tree_util.tree_leaves(grads["g_a"])
        assert any(np.any(np.asarray(g) != 0) for g in g_a_grad)

    def test_aux_loss_touches_only_quantiles(self, small_model_state):
        model, state = small_model_state

        def aux_only(params):
            return model.apply({"params": params}, method="aux_loss")

        grads = jax.grad(aux_only)(state.params)
        flat = jax.tree_util.tree_leaves_with_path(grads)
        for path, g in flat:
            path_str = jax.tree_util.keystr(path)
            if "quantiles" in path_str:
                assert np.any(np.asarray(g) != 0)
            else:
                np.testing.assert_allclose(
                    np.asarray(g), 0.0, err_msg=path_str
                )


class TestTrainStep:
    def test_loss_decreases_on_tiny_overfit(self, small_model_state):
        model, state = small_model_state
        step = jax.jit(make_train_step(model, lmbda=0.01))
        x = jax.random.uniform(jax.random.key(3), (1, 64, 64, 3))
        rng = jax.random.key(4)
        first = None
        for i in range(8):
            state, metrics = step(state, x, rng)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first
        assert np.isfinite(float(metrics["aux_loss"]))

    def test_eval_step(self, small_model_state):
        model, state = small_model_state
        ev = jax.jit(make_eval_step(model, lmbda=0.01))
        x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))
        metrics = ev(state.params, x)
        assert np.isfinite(float(metrics["loss"]))


class TestCompressDecompress:
    def test_roundtrip_consistency(self, small_model_state):
        """compress -> decompress must reproduce the encoder-side y_hat path
        exactly (same symbols), so x_hat must match the encoder's simulated
        reconstruction bit-for-bit."""
        model, state = small_model_state
        codec = Codec(model, state.params)
        x = np.asarray(
            jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))
        )

        out_enc = codec.compress(x)
        assert out_enc["shape"] == (1, 1)
        assert len(out_enc["strings"]) == 2
        assert all(len(s) > 0 for s in out_enc["strings"][0])

        out_dec = codec.decompress(out_enc["strings"], out_enc["shape"])
        x_hat = np.asarray(out_dec["x_hat"])
        assert x_hat.shape == x.shape
        assert np.all(x_hat >= 0) and np.all(x_hat <= 1)

        # decoded latent must equal encoder's: verify by re-encoding
        out_enc2 = codec.compress(x)
        assert out_enc["strings"][0][0] == out_enc2["strings"][0][0]
        assert out_enc["strings"][1][0] == out_enc2["strings"][1][0]

    def test_per_image_streams_match_batch1(self, small_model_state):
        """Host y-streams are per image: a batched encode must emit, for
        each image, a y-stream over that image's symbols alone — so
        batched eval reports exact per-image bpp (the reference CLI's
        batch-1 output contract, `eval_model/__main__.py:117-125`). With
        identical per-image symbols/indexes the bytes match batch-1
        encodes exactly."""
        model, state = small_model_state
        codec = Codec(model, state.params)
        x = np.asarray(
            jax.random.uniform(jax.random.key(17), (3, 64, 64, 3))
        )
        enc_b = codec.compress(x)
        assert len(enc_b["strings"][0]) == 3  # one y-stream per image
        assert len(enc_b["strings"][1]) == 3
        for i in range(3):
            enc_1 = codec.compress(x[i : i + 1])
            assert enc_1["strings"][0][0] == enc_b["strings"][0][i]
            assert enc_1["strings"][1][0] == enc_b["strings"][1][i]
        # and the batched streams decode to the batched walk's exact y_hat
        dec = codec.decompress(enc_b["strings"], enc_b["shape"])
        assert np.asarray(dec["x_hat"]).shape == x.shape

    def test_pipelined_codec_roundtrip(self, small_model_state):
        """pipeline=2 interleaves two sub-batch walks; the reconstruction
        must match the non-pipelined decode closely (different sub-batch
        program shapes -> small float drift) and be deterministic."""
        model, state = small_model_state
        codec1 = Codec(model, state.params, pipeline=1)
        codec2 = Codec(model, state.params, pipeline=2)
        x = np.asarray(jax.random.uniform(jax.random.key(11), (4, 64, 64, 3)))

        enc2 = codec2.compress(x)
        dec2 = codec2.decompress(enc2["strings"], enc2["shape"])
        dec2b = codec2.decompress(enc2["strings"], enc2["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec2["x_hat"]), np.asarray(dec2b["x_hat"])
        )

        enc1 = codec1.compress(x)
        dec1 = codec1.decompress(enc1["strings"], enc1["shape"])
        # different sub-batch program shapes can flip a handful of
        # quantization ties (each config is self-consistent); reconstructions
        # must agree except for a tiny fraction of pixels
        a, b = np.asarray(dec2["x_hat"]), np.asarray(dec1["x_hat"])
        frac_diff = np.mean(np.abs(a - b) > 2e-2)
        assert frac_diff < 5e-3, f"{frac_diff:.4%} of pixels differ"
        assert np.mean(np.abs(a - b)) < 1e-3

    def test_roundtrip_matches_eval_forward(self, small_model_state):
        """The real-bitstream round trip must reproduce the eval-mode
        forward pass exactly: same z_hat (round around medians), same
        quantized y (round around mu), same lrp corrections — so x_hat from
        decompress equals clip(forward(training=False).x_hat)."""
        model, state = small_model_state
        codec = Codec(model, state.params)
        x = np.asarray(jax.random.uniform(jax.random.key(7), (1, 64, 64, 3)))

        out_enc = codec.compress(x)
        out_dec = codec.decompress(out_enc["strings"], out_enc["shape"])

        # determinism: decoding the same stream twice is byte-identical
        out_dec2 = codec.decompress(out_enc["strings"], out_enc["shape"])
        np.testing.assert_array_equal(
            np.asarray(out_dec["x_hat"]), np.asarray(out_dec2["x_hat"])
        )

        # the eval-mode forward is a different fused program, so allow small
        # float drift — but the reconstruction must agree closely
        fwd = model.apply({"params": state.params}, jnp.asarray(x), training=False)
        expected = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
        np.testing.assert_allclose(
            np.asarray(out_dec["x_hat"]), expected, atol=2e-2
        )
        assert (
            np.abs(np.asarray(out_dec["x_hat"]) - expected).mean() < 2e-3
        )

        # and the real bitstream length should be close to the theoretical
        # rate from the likelihoods
        num_pixels = x.shape[1] * x.shape[2]
        theo_bits = sum(
            float(-np.log2(np.asarray(lik)).sum())
            for lik in fwd["likelihoods"].values()
        )
        real_bits = sum(
            len(s) * 8 for group in out_enc["strings"] for s in group
        )
        assert real_bits < theo_bits * 1.15 + 512


class TestMsSsimTraining:
    def test_ms_ssim_metric_trains(self):
        """RD training with the ms-ssim distortion (the reference's
        ms-ssim-optimized recipe) must be differentiable under jit."""
        import jax.numpy as jnp

        from stf_tpu.training import create_train_state, make_train_step

        model = WACNN(N=16, M=24, num_slices=2, max_support_slices=1)
        state = create_train_state(
            model, jax.random.key(0), input_shape=(1, 192, 192, 3)
        )
        step = jax.jit(make_train_step(model, lmbda=10.0, metric="ms-ssim"))
        x = jax.random.uniform(jax.random.key(1), (1, 192, 192, 3))
        state, metrics = step(state, x, jax.random.key(2))
        assert np.isfinite(float(metrics["loss"]))
        assert 0 <= float(metrics["distortion"]) <= 1.5
