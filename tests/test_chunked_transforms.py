"""Chunked analyze/synthesis (`Codec(analyze_chunks=, synth_chunks=)`):
lax.map sub-batching inside one jitted transform program, used to fit the
Swin flagship's batch-24 eval under HBM without splitting the codec walk.

Lockstep safety: chunking only touches analysis (encoder-only) and
synthesis (decoder-only); the walk programs (`decode_slice_*`) are shared
and unchanged, so streams still round-trip exactly.
"""

import jax
import numpy as np
import pytest

from stf_tpu.models import Codec, WACNN
from stf_tpu.training import create_train_state

SMALL = dict(N=32, M=40, num_slices=4, max_support_slices=2)


@pytest.fixture(scope="module")
def small_model_state():
    model = WACNN(**SMALL)
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    return model, state


@pytest.mark.parametrize("coder", ["host", "lane"])
def test_chunked_roundtrip(small_model_state, coder):
    model, state = small_model_state
    plain = Codec(model, state.params, coder=coder)
    chunked = Codec(
        model, state.params, coder=coder, analyze_chunks=2, synth_chunks=2
    )
    x = np.asarray(jax.random.uniform(jax.random.key(3), (4, 64, 64, 3)))

    # Chunked analysis/synthesis re-fuse differently than the flat batch,
    # so floats may differ at the noise level (the random-init model's
    # synthesis amplifies ~1000x, so clip-boundary pixels can flip — a
    # trained model's RD under chunking is guarded by the golden tests).
    # The hard invariant: the decoded SYMBOLS (y_hat before synthesis)
    # must be bit-identical across decoders — the walk programs are
    # shared and untouched by chunking.
    for enc in (chunked.compress(x), plain.compress(x)):
        y_hats = []
        for c in (chunked, plain):
            synth, c._synth = c._synth, jax.jit(lambda p, y: y)
            fused, c.fused = getattr(c, "fused", True), False
            y_hats.append(
                np.asarray(
                    c.decompress(enc["strings"], enc["shape"])["x_hat"],
                    np.float32,
                )
            )
            c._synth, c.fused = synth, fused
        np.testing.assert_array_equal(y_hats[0], y_hats[1])

        # reconstructions agree except where clip-boundary pixels flip
        dec_c = np.asarray(
            chunked.decompress(enc["strings"], enc["shape"])["x_hat"],
            np.float32,
        )
        dec_p = np.asarray(
            plain.decompress(enc["strings"], enc["shape"])["x_hat"],
            np.float32,
        )
        assert (np.abs(dec_c - dec_p) > 1e-3).mean() < 0.01


def test_indivisible_batch_falls_back(small_model_state):
    """A batch not divisible by chunks runs unchunked (same program
    contract, no crash)."""
    model, state = small_model_state
    chunked = Codec(model, state.params, analyze_chunks=2, synth_chunks=2)
    x = np.asarray(jax.random.uniform(jax.random.key(4), (3, 64, 64, 3)))
    enc = chunked.compress(x)
    dec = chunked.decompress(enc["strings"], enc["shape"])
    assert np.asarray(dec["x_hat"]).shape == x.shape


def test_probe_phases(small_model_state):
    """The compress/decompress probe hook fires in phase order."""
    model, state = small_model_state
    codec = Codec(model, state.params)
    x = np.asarray(jax.random.uniform(jax.random.key(5), (1, 64, 64, 3)))

    marks = []

    def probe(name, arr):
        if arr is not None:
            np.asarray(jax.numpy.asarray(arr)[(0,) * jax.numpy.asarray(arr).ndim])
        marks.append(name)

    enc = codec.compress(x, probe=probe)
    assert marks == ["upload", "analyze", "hyper", "walk", "drain", "rans",
                     "z_rans"]
    marks.clear()
    codec.decompress(enc["strings"], enc["shape"], probe=probe)
    # host-side z rANS decode marks first (no round trip), then the
    # z_hat dequantization round trip
    assert marks[0] == "z_host_rans"
    assert "z_decode" in marks
