"""Swin-family golden RD regression (twin of test_golden_rd.py):
deterministic tiny SymmetricalTransFormer training must reproduce its
frozen real-codec RD point, and the bench configuration (bf16 transforms,
lane backend) must stay inside a tight RD corridor of the f32/host
reference on the SAME trained model — LayerNorm/attention stacks have
different bf16 sensitivity than conv/GDN stacks, so the WACNN guard in
test_golden_rd.py does not cover this family.

Artifact generator: tests/data/make_golden_rd_stf.py. Reference curve
being stood in for: results/stf_mse_Kodak.json:2-17.
"""

import json
import os
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data", "golden_rd")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "golden_stf.json")),
    reason="golden stf artifact not generated",
)


@pytest.fixture(scope="module")
def golden():
    with open(os.path.join(DATA, "golden_stf.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def trained(golden):
    """Re-run the generator's deterministic training (same seeds/data)."""
    import jax
    import jax.numpy as jnp

    from make_golden_rd import train_batches

    from stf_tpu.models import SymmetricalTransFormer
    from stf_tpu.training import create_train_state, make_train_step

    kwargs = dict(golden["model_kwargs"])
    for key in ("depths", "num_heads"):
        kwargs[key] = tuple(kwargs[key])
    model = SymmetricalTransFormer(**kwargs)
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    step = jax.jit(make_train_step(model, lmbda=golden["lmbda"]))
    rng = jax.random.key(1)
    for batch in train_batches(8, 64, golden["steps"]):
        state, _ = step(state, jnp.asarray(batch), rng)
    return model, state.params


def _rd(codec, x):
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    x_hat = np.clip(np.asarray(dec["x_hat"], np.float32), 0, 1)
    n = sum(len(s) for s in enc["strings"][0]) + sum(
        len(s) for s in enc["strings"][1]
    )
    bpp = n * 8 / (x.shape[0] * x.shape[1] * x.shape[2])
    return bpp, -10 * np.log10(float(np.mean((x - x_hat) ** 2)))


def test_golden_rd_point_stf(golden, trained):
    from make_golden_rd import synth_image

    from stf_tpu.models import Codec

    model, params = trained
    codec = Codec(model, params)
    x = np.stack([synth_image(10_000 + i, 128) for i in range(2)])
    bpp, psnr = _rd(codec, x)
    np.testing.assert_allclose(bpp, golden["bpp"], rtol=5e-3)
    np.testing.assert_allclose(psnr, golden["psnr"], atol=0.05)


def test_lane_backend_matches_host_stf(trained):
    """The stf bench ships the LANE backend (fused decode, and optionally
    the fused encode walk): on a trained tiny Swin, the lane codec must
    reproduce the host codec's reconstruction exactly — Swin's
    LayerNorm/attention walk goes through different fused executables
    than WACNN's conv/GDN walk, so test_lane_codec's WACNN coverage does
    not transfer."""
    import warnings

    from make_golden_rd import synth_image

    from stf_tpu.models import Codec

    model, params = trained
    x = np.stack([synth_image(10_000 + i, 128) for i in range(2)])
    host = Codec(model, params)
    lane = Codec(model, params, coder="lane", fused_encode=True)
    enc_h = host.compress(x)
    enc_l = lane.compress(x)
    assert enc_h["strings"][1] == enc_l["strings"][1]  # same z stream
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a fused-decode fallback = failure
        dec_l = lane.decompress(enc_l["strings"], enc_l["shape"])
    dec_h = host.decompress(enc_h["strings"], enc_h["shape"])
    # identical symbols by the hash guard (no-fallback enforced above);
    # x_hat differs only by fusion-level float noise, like the WACNN twin
    # test_lane_codec.py::test_fused_decompress_matches_walk
    np.testing.assert_allclose(
        np.asarray(dec_h["x_hat"], np.float32),
        np.asarray(dec_l["x_hat"], np.float32),
        atol=1e-5, rtol=1e-5,
    )


def test_bf16_codec_rd_guard_stf(golden, trained):
    """The shipped stf bench config is bf16 transforms: the real-codec RD
    point with Codec(dtype=bfloat16) must stay within tight bounds of f32
    on the trained tiny Swin model."""
    import jax.numpy as jnp

    from make_golden_rd import synth_image

    from stf_tpu.models import Codec

    model, params = trained
    x = np.stack([synth_image(10_000 + i, 128) for i in range(2)])
    bpp32, psnr32 = _rd(Codec(model, params), x)
    bpp16, psnr16 = _rd(Codec(model, params, dtype=jnp.bfloat16), x)
    assert abs(bpp16 - bpp32) / bpp32 < 0.02
    assert psnr16 > psnr32 - 0.1
