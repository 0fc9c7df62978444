"""The "rangecoder" host entropy backend: a native carry-propagating range
coder with the same symbol protocol as the rANS backend (the reference's
optional `range_coder` pip backend, `compressai/__init__.py:22-62`).

Decisive properties: lossless round trips (incl. bypass escapes), stream
size within a hair of rANS (both code the same 16-bit CDFs), and — through
the registry — bit-identical reconstructions to the rANS backend (the
entropy coder changes the bytes, never the symbols)."""

import jax
import numpy as np
import pytest

import stf_tpu
from stf_tpu.ans import (
    BufferedRangeEncoder,
    RangeDecoder,
    RangeEncoder,
    RansEncoder,
    host_coder_classes,
    pmf_to_quantized_cdf,
)
from stf_tpu.models import Codec, WACNN
from stf_tpu.training import create_train_state


@pytest.fixture()
def random_tables():
    rng = np.random.default_rng(0)
    rows, lengths, offsets = [], [], []
    for _ in range(8):
        n = int(rng.integers(3, 40))
        pmf = rng.dirichlet(np.ones(n)).astype(np.float32)
        cdf = pmf_to_quantized_cdf(pmf, 16)
        rows.append(cdf)
        lengths.append(len(cdf))
        offsets.append(int(rng.integers(-20, 5)))
    table = np.zeros((len(rows), max(lengths)), np.int32)
    for i, c in enumerate(rows):
        table[i, : len(c)] = c
    return table, np.asarray(lengths, np.int32), np.asarray(offsets, np.int32)


def _random_symbols(rng, table, lengths, offsets, n):
    idx = rng.integers(0, table.shape[0], n).astype(np.int32)
    sym = np.array(
        [
            rng.integers(offsets[i] - 6, offsets[i] + lengths[i] + 6)
            for i in idx
        ],
        np.int32,
    )
    # extreme escapes exercise the multi-chunk bypass path
    sym[:50] = rng.integers(3000, 100000, 50)
    sym[50:100] = -rng.integers(3000, 100000, 50)
    return sym, idx


def test_roundtrip_with_escapes(random_tables):
    table, lengths, offsets = random_tables
    rng = np.random.default_rng(1)
    sym, idx = _random_symbols(rng, table, lengths, offsets, 20000)

    enc = RangeEncoder().encode_with_indexes(sym, idx, table, lengths, offsets)
    dec = RangeDecoder().decode_with_indexes(enc, idx, table, lengths, offsets)
    np.testing.assert_array_equal(dec, sym)

    # same CDFs, near-identical rate as the rANS backend (within 1%)
    rans = RansEncoder().encode_with_indexes(sym, idx, table, lengths, offsets)
    assert abs(len(enc) - len(rans)) <= 0.01 * len(rans)


def test_streaming_matches_one_shot(random_tables):
    """Chunked buffered encode + streaming decode — the AR-walk protocol —
    must produce and consume the identical stream as one-shot coding."""
    table, lengths, offsets = random_tables
    rng = np.random.default_rng(2)
    sym, idx = _random_symbols(rng, table, lengths, offsets, 12000)

    be = BufferedRangeEncoder()
    chunks = np.array_split(np.arange(sym.size), 5)
    for c in chunks:
        be.encode_with_indexes(sym[c], idx[c], table, lengths, offsets)
    stream = be.flush()
    assert stream == RangeEncoder().encode_with_indexes(
        sym, idx, table, lengths, offsets
    )

    dec = RangeDecoder()
    dec.set_stream(stream)
    out = np.concatenate(
        [dec.decode_stream(idx[c], table, lengths, offsets) for c in chunks]
    )
    np.testing.assert_array_equal(out, sym)


def test_registry():
    assert stf_tpu.available_entropy_coders() == ["rans", "rangecoder"]
    assert host_coder_classes("rangecoder")[1] is RangeEncoder
    with pytest.raises(ValueError):
        host_coder_classes("nope")
    with pytest.raises(ValueError):
        stf_tpu.set_entropy_coder("nope")


def test_codec_backend_selection():
    """A codec built with the registry at "rangecoder" must produce
    bit-identical reconstructions to the rANS backend (the walk and
    symbols are backend-independent), from different stream bytes.

    The backend is snapshotted at Codec CONSTRUCTION (reference
    semantics: `EntropyModel.__init__` pins its coder,
    `compressai/entropy_models/entropy_models.py:80-90`): the two
    backends' bit layers are not interoperable, so a later registry flip
    must never change what a live codec decodes with (see
    test_codec_pins_backend_at_construction)."""
    model = WACNN(N=32, M=40, num_slices=4, max_support_slices=2)
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    x = np.asarray(jax.random.uniform(jax.random.key(41), (2, 64, 64, 3)))

    codec = Codec(model, state.params, coder="host")
    assert codec.host_backend == "rans"
    enc_rans = codec.compress(x)
    dec_rans = codec.decompress(enc_rans["strings"], enc_rans["shape"])

    stf_tpu.set_entropy_coder("rangecoder")
    try:
        codec_rc = Codec(model, state.params, coder="host")
        assert codec_rc.host_backend == "rangecoder"
        enc_rc = codec_rc.compress(x)
        dec_rc = codec_rc.decompress(enc_rc["strings"], enc_rc["shape"])
    finally:
        stf_tpu.set_entropy_coder("rans")

    assert enc_rc["strings"][0][0] != enc_rans["strings"][0][0]
    np.testing.assert_array_equal(
        np.asarray(dec_rc["x_hat"]), np.asarray(dec_rans["x_hat"])
    )
    # z-streams (EntropyBottleneckCoder) follow the snapshot too
    assert enc_rc["strings"][1][0] != enc_rans["strings"][1][0]

    # pinning regression: flipping the registry between compress and
    # decompress must NOT change the bit layer a live codec uses —
    # decoding rans bytes with the range coder would return garbage
    # symbols silently
    stf_tpu.set_entropy_coder("rangecoder")
    try:
        dec_pinned = codec.decompress(enc_rans["strings"], enc_rans["shape"])
        enc_pinned = codec.compress(x)
    finally:
        stf_tpu.set_entropy_coder("rans")
    np.testing.assert_array_equal(
        np.asarray(dec_pinned["x_hat"]), np.asarray(dec_rans["x_hat"])
    )
    assert enc_pinned["strings"][0][0] == enc_rans["strings"][0][0]
    assert enc_pinned["strings"][1][0] == enc_rans["strings"][1][0]

    # ... and update() (the reference's table-sweep protocol) must also
    # reuse the pinned backend, not re-read the flipped registry
    stf_tpu.set_entropy_coder("rangecoder")
    try:
        codec.update(scale_table=codec.scale_table)
        assert codec.host_backend == "rans"
        dec_upd = codec.decompress(enc_rans["strings"], enc_rans["shape"])
    finally:
        stf_tpu.set_entropy_coder("rans")
    np.testing.assert_array_equal(
        np.asarray(dec_upd["x_hat"]), np.asarray(dec_rans["x_hat"])
    )
