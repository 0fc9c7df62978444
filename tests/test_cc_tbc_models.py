"""CC and TBC codec tests (scaled-down configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_tpu.models import Codec
from stf_tpu.models.cc import CC
from stf_tpu.models.tbc import TransformerBasedCoding

CC_SMALL = dict(N=32, M=40, num_slices=4, max_support_slices=2)
TBC_TINY = dict(
    channels=(8, 12, 16, 20, 8, 8),
    depths=(1, 1, 1, 1),
    h_depths=(1, 1),
    num_heads=4,
    h_num_heads=4,
    window_size=4,
    h_window_size=4,
    num_slices=3,  # 20 channels -> widths 7,7,6 (exercises the remainder)
)


class TestCC:
    @pytest.fixture(scope="class")
    def model_params(self):
        model = CC(**CC_SMALL)
        variables = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)),
            training=False,
        )
        return model, variables["params"]

    def test_forward_shapes(self, model_params):
        model, params = model_params
        x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
        out = model.apply(
            {"params": params}, x, training=True,
            rngs={"noise": jax.random.key(3)},
        )
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 40)
        assert out["likelihoods"]["z"].shape == (1, 1, 1, 32)

    def test_roundtrip(self, model_params):
        model, params = model_params
        codec = Codec(model, params)
        x = np.asarray(jax.random.uniform(jax.random.key(4), (1, 64, 64, 3)))
        enc = codec.compress(x)
        dec = codec.decompress(enc["strings"], enc["shape"])
        assert np.asarray(dec["x_hat"]).shape == x.shape
        fwd = model.apply({"params": params}, jnp.asarray(x), training=False)
        np.testing.assert_allclose(
            np.asarray(dec["x_hat"]),
            np.clip(np.asarray(fwd["x_hat"]), 0, 1),
            atol=2e-2,
        )


class TestTBC:
    @pytest.fixture(scope="class")
    def model_params(self):
        model = TransformerBasedCoding(**TBC_TINY)
        variables = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)),
            training=False,
        )
        return model, variables["params"]

    def test_uneven_slice_boundaries(self, model_params):
        model, _ = model_params
        assert model.slice_boundaries(20) == [7, 14]

    def test_forward_shapes(self, model_params):
        model, params = model_params
        x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
        out = model.apply(
            {"params": params}, x, training=True,
            rngs={"noise": jax.random.key(3), "droppath": jax.random.key(4)},
        )
        assert out["x_hat"].shape == x.shape
        # y at /16 with 20 channels, z at /64 with 8 channels
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 20)
        assert out["likelihoods"]["z"].shape == (1, 1, 1, 8)

    def test_roundtrip(self, model_params):
        model, params = model_params
        codec = Codec(model, params)
        x = np.asarray(jax.random.uniform(jax.random.key(5), (1, 64, 64, 3)))
        enc = codec.compress(x)
        dec = codec.decompress(enc["strings"], enc["shape"])
        assert np.asarray(dec["x_hat"]).shape == x.shape
        dec2 = codec.decompress(enc["strings"], enc["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["x_hat"]), np.asarray(dec2["x_hat"])
        )


def test_tbc_lane_backend_matches_host():
    """Lane backend on the TBC family: the uneven last slice (widths
    7,7,6) is the interesting edge for the per-slice lane framing — the
    per-slice walk must stay bit-exact vs host and the fused decode
    hash-guard must hold across slices of different widths."""
    model = TransformerBasedCoding(**TBC_TINY)
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)),
        training=False,
    )
    params = variables["params"]
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


def test_cc_lane_backend_matches_host():
    """Lane backend on the CC family: per-slice walk bit-exact vs host,
    fused one-dispatch decode hash-guarded (backend is model-agnostic —
    this pins it for the non-attention family too)."""
    from stf_tpu.models.cc import CC

    model = CC(**CC_SMALL)
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)),
        training=False,
    )
    params = variables["params"]
    host = Codec(model, params, coder="host")
    lane = Codec(model, params, coder="lane")
    x = np.asarray(jax.random.uniform(jax.random.key(11), (1, 64, 64, 3)))
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
