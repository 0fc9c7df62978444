"""Lane-rANS codec backend (`Codec(coder="lane")`): the device entropy
decoder wired into the real compress/decompress walk.

The decisive property: the lane backend must reproduce the host backend's
reconstruction BIT-FOR-BIT. Both backends drive the same compiled
`decode_slice_*` programs and code the same symbols losslessly, so any
x_hat mismatch means a stream desync. (Host-backend correctness against
the reference is pinned by tests/test_reference_parity.py.)
"""

import jax
import numpy as np
import pytest

from stf_tpu.ans.lane_coder import (
    lane_decode,
    lane_decode_reference,
    lane_encode,
    pack_lane_stream,
    truncate_tables,
    unpack_lane_stream,
)
from stf_tpu.entropy import build_gc_tables
from stf_tpu.models import Codec, WACNN
from stf_tpu.models.tbc import TransformerBasedCoding
from stf_tpu.training import create_train_state

SMALL = dict(N=32, M=40, num_slices=4, max_support_slices=2)


@pytest.fixture(scope="module")
def small_model_state():
    model = WACNN(**SMALL)
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    return model, state


def test_truncated_gc_tables_roundtrip():
    """Wide Gaussian-conditional rows clamp to ±127 symbol windows; symbols
    beyond the window (and beyond the original row) escape to the side
    channel and still round-trip exactly."""
    scales = np.exp(
        np.linspace(np.log(0.11), np.log(64.0), 12)
    ).astype(np.float32)
    full = build_gc_tables(scales)
    tables = truncate_tables(*full.astuple())
    assert tables.cdf.shape[1] <= 2 * 127 + 3
    # wide rows got clamped, small rows kept verbatim
    assert tables.lengths.max() == 2 * 127 + 3
    assert tables.lengths.min() == np.asarray(full.cdf_length).min()

    rng = np.random.default_rng(0)
    n = 3000
    idx = rng.integers(0, scales.size, n).astype(np.int32)
    sym = rng.normal(0, scales[idx] * 0.7).round().astype(np.int32)
    # force out-of-window and extreme outliers
    sym[:50] = rng.integers(128, 4000, 50)
    sym[50:100] = -rng.integers(128, 4000, 50)

    stream = lane_encode(sym, idx, tables)
    assert stream.side.size >= 100  # the forced outliers escaped
    dec = lane_decode_reference(stream, idx, tables)
    np.testing.assert_array_equal(dec, sym)
    dev = np.asarray(lane_decode(stream, idx, tables, interpret=True))
    np.testing.assert_array_equal(dev, sym)


def test_stream_framing_roundtrip():
    """pack/unpack is lossless, exercised through real encoded segments of
    varied sizes (odd word counts hit the 4-byte alignment padding)."""
    rng = np.random.default_rng(1)
    scales = np.exp(
        np.linspace(np.log(0.2), np.log(4.0), 6)
    ).astype(np.float32)
    tables = truncate_tables(*build_gc_tables(scales).astuple())
    segments = []
    originals = []
    for n in (17, 1290, 5000, 128):
        idx = rng.integers(0, scales.size, n).astype(np.int32)
        sym = rng.normal(0, 2.0, n).round().astype(np.int32)
        sym[: max(1, n // 50)] = 500  # a few escapes
        segments.append(lane_encode(sym, idx, tables))
        originals.append((sym, idx))
    blob = pack_lane_stream(segments)
    back = unpack_lane_stream(blob)
    assert len(back) == len(segments)
    for seg, seg2, (sym, idx) in zip(segments, back, originals):
        np.testing.assert_array_equal(seg.words, seg2.words)
        np.testing.assert_array_equal(seg.states, seg2.states)
        np.testing.assert_array_equal(seg.side, seg2.side)
        np.testing.assert_array_equal(seg.word_counts, seg2.word_counts)
        np.testing.assert_array_equal(seg.side_counts, seg2.side_counts)
        assert seg.n == seg2.n
        np.testing.assert_array_equal(
            lane_decode_reference(seg2, idx, tables), sym
        )


def test_layout_pin_is_bit_exact():
    """`layout_pin` is a layout fence, never a value change: every dtype
    the fused decode twin pins must round-trip bit-for-bit, including NaN
    payloads, negative zeros, and odd (non-128-multiple) sizes."""
    import jax.numpy as jnp

    from stf_tpu.ans.lane_coder import layout_pin

    rng = np.random.default_rng(3)
    cases = []
    f32 = rng.normal(size=(3, 7, 11, 5)).astype(np.float32)
    f32[0, 0, 0, :3] = [np.nan, np.inf, -0.0]
    cases.append(f32)
    cases.append(f32.astype(jnp.bfloat16))
    cases.append(rng.integers(-(2**31), 2**31, 999).astype(np.int32))
    cases.append(rng.integers(0, 256, (13, 129)).astype(np.uint8))
    cases.append(rng.integers(-128, 128, 1).astype(np.int8))
    for arr in cases:
        out = jax.jit(lambda a: layout_pin(a, interpret=True))(arr)
        assert out.dtype == arr.dtype and out.shape == arr.shape
        np.testing.assert_array_equal(
            np.asarray(out).view(np.uint8), np.asarray(arr).view(np.uint8)
        )


def test_device_encoder_matches_host_encoder():
    """The Pallas reverse-rANS encode kernel must produce byte-identical
    streams to the host lane encoder, including escapes and padding."""
    import jax.numpy as jnp

    from stf_tpu.ans.lane_coder import (
        assemble_device_stream,
        device_tables,
        lane_encode_device,
    )

    rng = np.random.default_rng(21)
    scales = np.exp(np.linspace(np.log(0.2), np.log(8.0), 9)).astype(
        np.float32
    )
    tables = truncate_tables(*build_gc_tables(scales).astuple(), max_half=62)
    dev = device_tables(tables)
    for n in (1, 130, 3 * 8 * 128 + 77):
        idx = rng.integers(0, scales.size, n).astype(np.int32)
        sym = rng.normal(0, 2.0, n).round().astype(np.int32)
        sym[: max(1, n // 40)] = rng.integers(100, 2000, max(1, n // 40))
        ref = lane_encode(sym, idx, tables)
        out = lane_encode_device(
            jnp.asarray(sym), jnp.asarray(idx), *dev,
            n=n, pad_sym=int(tables.offsets[0]), interpret=True,
        )
        words_np, side_np, states_np, counts_np = map(np.asarray, out)
        assert not counts_np[:, 2].any()
        got = assemble_device_stream(
            words_np, side_np, states_np, counts_np, n
        )
        np.testing.assert_array_equal(got.words, ref.words)
        np.testing.assert_array_equal(got.word_counts, ref.word_counts)
        np.testing.assert_array_equal(got.states, ref.states)
        np.testing.assert_array_equal(got.side, ref.side)
        np.testing.assert_array_equal(got.side_counts, ref.side_counts)


class TestLaneCodec:
    def test_device_encode_stream_identical(self, small_model_state):
        """Codec with device_encode=True must emit the exact bytes the
        host-encoder lane codec emits, and they must cross-decode."""
        model, state = small_model_state
        lane_h = Codec(
            model, state.params, coder="lane", device_encode=False
        )
        lane_d = Codec(
            model, state.params, coder="lane", device_encode=True
        )
        x = np.asarray(jax.random.uniform(jax.random.key(12), (2, 64, 64, 3)))
        enc_h = lane_h.compress(x)
        enc_d = lane_d.compress(x)
        assert enc_h["strings"][0][0] == enc_d["strings"][0][0]
        dec = lane_h.decompress(enc_d["strings"], enc_d["shape"])
        dec_d = lane_d.decompress(enc_h["strings"], enc_h["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["x_hat"]), np.asarray(dec_d["x_hat"])
        )

    def test_roundtrip_matches_host_backend(self, small_model_state):
        """Per-slice lane walk (fused off) shares every executable with the
        host backend's walk: x_hat must match BIT-FOR-BIT."""
        model, state = small_model_state
        host = Codec(model, state.params, coder="host")
        lane = Codec(model, state.params, coder="lane")
        lane.fused = False
        x = np.asarray(jax.random.uniform(jax.random.key(6), (2, 64, 64, 3)))

        enc_h = host.compress(x)
        enc_l = lane.compress(x)
        assert enc_h["strings"][1] == enc_l["strings"][1]  # same z stream

        dec_h = host.decompress(enc_h["strings"], enc_h["shape"])
        dec_l = lane.decompress(enc_l["strings"], enc_l["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec_h["x_hat"]), np.asarray(dec_l["x_hat"])
        )

    def test_fused_decompress_matches_walk(self, small_model_state):
        """The one-dispatch fused decoder must agree with the per-slice
        walk: identical symbols by the hash guard, and an x_hat that only
        differs by fusion-level float noise (if at all)."""
        import warnings

        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane")
        x = np.asarray(jax.random.uniform(jax.random.key(10), (2, 64, 64, 3)))
        enc = lane.compress(x)

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # a fallback warning = failure
            dec_fused = lane.decompress(enc["strings"], enc["shape"])
        lane.fused = False
        dec_walk = lane.decompress(enc["strings"], enc["shape"])
        np.testing.assert_allclose(
            np.asarray(dec_fused["x_hat"], np.float32),
            np.asarray(dec_walk["x_hat"], np.float32),
            atol=1e-5, rtol=1e-5,
        )

    def test_fused_hash_mismatch_falls_back(self, small_model_state):
        """Corrupting a stream hash must trigger the lockstep fallback (and
        produce the exact per-slice result), not a silent wrong decode."""
        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane")
        x = np.asarray(jax.random.uniform(jax.random.key(11), (1, 64, 64, 3)))
        enc = lane.compress(x)
        y = bytearray(enc["strings"][0][0])
        y[4] ^= 0xFF  # first segment's idx hash (after the header word)
        bad = [[bytes(y)], enc["strings"][1]]

        with pytest.warns(RuntimeWarning, match="falling back"):
            dec_fb = lane.decompress(bad, enc["shape"])
        lane.fused = False
        dec_walk = lane.decompress(enc["strings"], enc["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec_fb["x_hat"]), np.asarray(dec_walk["x_hat"])
        )

    def test_fused_encode_stream_identical(self, small_model_state):
        """fused_encode=True collapses the whole encode walk into one
        program. Its stream must be byte-identical to the per-slice lane
        encoder's (modulo the header's fused-enc flag bit), and both
        decoder paths must accept it (hash verification passes)."""
        import warnings

        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane")
        fused = Codec(model, state.params, coder="lane", fused_encode=True)
        x = np.asarray(jax.random.uniform(jax.random.key(21), (2, 64, 64, 3)))
        enc = lane.compress(x)
        enc_f = fused.compress(x)
        assert enc_f["shape"] == enc["shape"]
        assert enc_f["strings"][1] == enc["strings"][1]  # same z stream
        y, y_f = enc["strings"][0][0], enc_f["strings"][0][0]
        assert y_f[0] & 0x01  # _LANE_FLAG_FUSED_ENC set
        assert not (y[0] & 0x01)
        assert y_f[1:] == y[1:]  # identical hashes + segments

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # a fallback warning = failure
            dec_fused = fused.decompress(enc_f["strings"], enc_f["shape"])
        fused.fused = False  # per-slice decode path, verify-mode
        dec_walk = fused.decompress(enc_f["strings"], enc_f["shape"])
        np.testing.assert_allclose(
            np.asarray(dec_fused["x_hat"], np.float32),
            np.asarray(dec_walk["x_hat"], np.float32),
            atol=1e-5, rtol=1e-5,
        )

    def test_fused_encode_pipelined_stream_identical(self, small_model_state):
        """fused_encode with pipeline=2 keeps ONE whole-batch dispatch
        with analyze/hyper at full batch shape and the walk per sub —
        exactly the decoders' structure (an earlier per-sub-program
        design diverged in bf16 on TPU and tripped the hash guard). The
        stream must be byte-identical to the per-slice pipeline=2 lane
        encoder's (modulo the header flag bit) and round-trip through
        both decoder paths."""
        import warnings

        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane", pipeline=2)
        fused = Codec(
            model, state.params, coder="lane", pipeline=2, fused_encode=True
        )
        x = np.asarray(jax.random.uniform(jax.random.key(31), (4, 64, 64, 3)))
        enc = lane.compress(x)
        enc_f = fused.compress(x)
        assert enc_f["strings"][1] == enc["strings"][1]  # same z streams
        y, y_f = enc["strings"][0][0], enc_f["strings"][0][0]
        assert y_f[0] & 0x01 and not (y[0] & 0x01)
        assert y_f[1:] == y[1:]  # identical hashes + segments

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # a fallback warning = failure
            dec_fused = fused.decompress(enc_f["strings"], enc_f["shape"])
        fused.fused = False  # per-slice decode path, verify-mode
        dec_walk = fused.decompress(enc_f["strings"], enc_f["shape"])
        np.testing.assert_allclose(
            np.asarray(dec_fused["x_hat"], np.float32),
            np.asarray(dec_walk["x_hat"], np.float32),
            atol=1e-5, rtol=1e-5,
        )

    def test_split_fused_encode_stream_identical(self, small_model_state):
        """fused_encode="split" runs analyze/z/hyper as the standalone
        per-slice executables and only the walk+encode as one program
        (the tier a failed full-fusion self-check demotes to). Streams
        byte-identical to the per-slice encoder's (modulo header flag)
        and accepted by both decoder paths."""
        import warnings

        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane")
        split = Codec(
            model, state.params, coder="lane", fused_encode="split"
        )
        assert split.fused_encode and split._fused_mode == "split"
        x = np.asarray(jax.random.uniform(jax.random.key(51), (2, 64, 64, 3)))
        enc = lane.compress(x)
        enc_s = split.compress(x)
        assert split._fused_mode == "split"  # self-check passed, no demote
        assert enc_s["strings"][1] == enc["strings"][1]
        y, y_s = enc["strings"][0][0], enc_s["strings"][0][0]
        assert y_s[0] & 0x01 and not (y[0] & 0x01)
        assert y_s[1:] == y[1:]

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            dec_fused = split.decompress(enc_s["strings"], enc_s["shape"])
        split.fused = False
        dec_walk = split.decompress(enc_s["strings"], enc_s["shape"])
        np.testing.assert_allclose(
            np.asarray(dec_fused["x_hat"], np.float32),
            np.asarray(dec_walk["x_hat"], np.float32),
            atol=1e-5, rtol=1e-5,
        )

    def test_fused_verify_failure_demotes_full_to_split(
        self, small_model_state
    ):
        """A full-fusion self-check failure must demote to the SPLIT
        fused tier (not straight to per-slice) and re-encode; the split
        stream then passes its own self-check and ships."""
        model, state = small_model_state
        fused = Codec(model, state.params, coder="lane", fused_encode=True)
        x = np.asarray(jax.random.uniform(jax.random.key(52), (2, 64, 64, 3)))
        orig = fused.decompress
        state_holder = {"broken": True}

        def decompress_full_broken(strings, shape, **kw):
            # fail only while the codec is still in full mode — the
            # split retry's verify must succeed
            if state_holder["broken"] and fused._fused_mode == "full":
                raise ValueError("lockstep hash mismatch (simulated)")
            return orig(strings, shape, **kw)

        fused.decompress = decompress_full_broken
        with pytest.warns(RuntimeWarning, match="demoting to the split"):
            enc = fused.compress(x)
        fused.decompress = orig
        assert fused.fused_encode  # NOT disabled
        assert fused._fused_mode == "split"
        assert enc["strings"][0][0][0] & 0x01  # still fused-encoded
        # byte-identical to a from-scratch split codec's stream
        split = Codec(
            model, state.params, coder="lane", fused_encode="split"
        )
        assert enc["strings"][0][0] == split.compress(x)["strings"][0][0]
        dec = fused.decompress(enc["strings"], enc["shape"])
        assert np.all(np.isfinite(np.asarray(dec["x_hat"], np.float32)))

    def test_fused_encode_bad_hash_fails_loudly(self, small_model_state):
        """A fused-encoded stream whose hashes don't match what the
        per-slice decoder derives must raise, not desync silently."""
        model, state = small_model_state
        fused = Codec(model, state.params, coder="lane", fused_encode=True)
        x = np.asarray(jax.random.uniform(jax.random.key(22), (1, 64, 64, 3)))
        enc = fused.compress(x)
        y = bytearray(enc["strings"][0][0])
        y[4] ^= 0xFF  # first segment's idx hash
        bad = [[bytes(y)], enc["strings"][1]]
        fused.fused = False  # force the per-slice verify path
        with pytest.raises(ValueError, match="hash mismatch"):
            fused.decompress(bad, enc["shape"])

    def test_fused_verify_decode_checks_first_stream_only(
        self, small_model_state
    ):
        """fused_verify (default on) must decode-check the FIRST fused
        stream of each configuration inside compress() — and only the
        first: later same-config calls skip the extra decompress."""
        model, state = small_model_state
        fused = Codec(model, state.params, coder="lane", fused_encode=True)
        calls = []
        orig = fused.decompress
        fused.decompress = lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
        x = np.asarray(jax.random.uniform(jax.random.key(41), (2, 64, 64, 3)))
        fused.compress(x)
        assert len(calls) == 1  # verification decompress ran
        fused.compress(x)
        assert len(calls) == 1  # config already verified — no re-check
        assert fused.fused_encode

        unchecked = Codec(
            model, state.params, coder="lane", fused_encode=True,
            fused_verify=False,
        )
        calls2 = []
        orig2 = unchecked.decompress
        unchecked.decompress = (
            lambda *a, **kw: (calls2.append(1), orig2(*a, **kw))[1]
        )
        unchecked.compress(x)
        assert not calls2  # opt-out: no verification decompress

    def test_fused_verify_failure_disables_fused_encode(
        self, small_model_state
    ):
        """If the self-check decompress raises (stream no decoder can
        reproduce — the Swin-at-pipeline-2 failure mode), compress() must
        warn, permanently fall back to the per-slice encode anchor, and
        return a stream that decodes."""
        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane")
        fused = Codec(model, state.params, coder="lane", fused_encode=True)
        orig = fused.decompress

        def broken(*a, **kw):
            raise ValueError("lockstep hash mismatch (simulated)")

        fused.decompress = broken
        x = np.asarray(jax.random.uniform(jax.random.key(42), (2, 64, 64, 3)))
        with pytest.warns(RuntimeWarning, match="self-check FAILED"):
            enc = fused.compress(x)
        fused.decompress = orig
        assert not fused.fused_encode  # permanently dropped to per-slice
        assert not (enc["strings"][0][0][0] & 0x01)  # per-slice header flag
        # the emitted stream is the per-slice anchor's — byte-identical to
        # a never-fused codec's, and it round-trips
        assert enc["strings"][0][0] == lane.compress(x)["strings"][0][0]
        dec = fused.decompress(enc["strings"], enc["shape"])
        assert np.all(np.isfinite(np.asarray(dec["x_hat"], np.float32)))

    def test_per_slice_verify_retries_fused_decoder(self, small_model_state):
        """A fused-encoded stream whose per-slice verify fails must retry
        the fused DECODER (the executable the stream's hashes anchor to)
        before raising — with Codec.fused=False the fused program was
        never tried, and it may well decode the stream fine. Simulated by
        sabotaging the per-slice hash derivation only."""
        model, state = small_model_state
        fused = Codec(model, state.params, coder="lane", fused_encode=True)
        x = np.asarray(jax.random.uniform(jax.random.key(24), (1, 64, 64, 3)))
        enc = fused.compress(x)
        ref = fused.decompress(enc["strings"], enc["shape"])

        fused.fused = False  # user knob: per-slice walk only
        orig = fused._hash_fn
        fused._hash_fn = lambda idx: orig(idx) ^ np.uint32(1)
        dec = fused.decompress(enc["strings"], enc["shape"])
        fused._hash_fn = orig
        np.testing.assert_array_equal(
            np.asarray(ref["x_hat"]), np.asarray(dec["x_hat"])
        )

    def test_pack_drain_needs_narrow_scale_table(self, small_model_state):
        """pack_drain=True with a >64-level scale table would bleed idx
        bits into the q field and corrupt host streams — the constructor
        must refuse it (the default only enables packing when it fits)."""
        model, state = small_model_state
        wide = np.exp(
            np.linspace(np.log(0.11), np.log(256.0), 128)
        ).astype(np.float32)
        with pytest.raises(ValueError, match="pack_drain"):
            Codec(model, state.params, scale_table=wide, pack_drain=True)
        # the default auto-disables packing instead of raising
        codec = Codec(model, state.params, scale_table=wide)
        assert not codec._pack_drain

    def test_lane_header_magic_checked(self, small_model_state):
        """A stream without the codec header magic (e.g. from an older
        build) must be rejected up front."""
        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane")
        x = np.asarray(jax.random.uniform(jax.random.key(23), (1, 64, 64, 3)))
        enc = lane.compress(x)
        y = bytearray(enc["strings"][0][0])
        y[2] ^= 0x40  # clobber a magic byte
        with pytest.raises(ValueError, match="magic"):
            lane.decompress([[bytes(y)], enc["strings"][1]], enc["shape"])

    def test_bf16_lane_matches_bf16_host(self, small_model_state):
        """The bench's exact configuration (bf16 transforms + lane
        backend): streams and reconstructions must match the bf16 host
        backend bit-for-bit on the per-slice walk."""
        import jax.numpy as jnp

        model, state = small_model_state
        host = Codec(model, state.params, dtype=jnp.bfloat16, coder="host")
        lane = Codec(model, state.params, dtype=jnp.bfloat16, coder="lane")
        x = np.asarray(jax.random.uniform(jax.random.key(13), (1, 64, 64, 3)))
        enc_h = host.compress(x)
        enc_l = lane.compress(x)
        assert enc_h["strings"][1] == enc_l["strings"][1]
        dec_f = lane.decompress(enc_l["strings"], enc_l["shape"])  # fused
        lane.fused = False
        dec_w = lane.decompress(enc_l["strings"], enc_l["shape"])
        dec_h = host.decompress(enc_h["strings"], enc_h["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec_w["x_hat"], np.float32),
            np.asarray(dec_h["x_hat"], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(dec_f["x_hat"], np.float32),
            np.asarray(dec_h["x_hat"], np.float32),
            atol=1e-2, rtol=1e-2,  # bf16 fusion noise
        )

    def test_corrupt_stream_raises_not_garbage(self, small_model_state):
        """Structurally broken lane streams must raise, not decode junk."""
        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane")
        x = np.asarray(jax.random.uniform(jax.random.key(14), (1, 64, 64, 3)))
        enc = lane.compress(x)
        y = enc["strings"][0][0]
        with pytest.raises((ValueError, RuntimeError)):
            lane.decompress([[y[: len(y) // 3]], enc["strings"][1]],
                            enc["shape"])

    def test_lane_stream_is_deterministic(self, small_model_state):
        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane")
        x = np.asarray(jax.random.uniform(jax.random.key(7), (1, 64, 64, 3)))
        a = lane.compress(x)
        b = lane.compress(x)
        assert a["strings"][0][0] == b["strings"][0][0]

    def test_pipelined_lane_roundtrip(self, small_model_state):
        """pipeline=2: segments land in (slice, sub-batch) order and the
        decoder consumes them in the same order."""
        model, state = small_model_state
        lane1 = Codec(model, state.params, coder="lane", pipeline=1)
        lane2 = Codec(model, state.params, coder="lane", pipeline=2)
        x = np.asarray(jax.random.uniform(jax.random.key(8), (2, 64, 64, 3)))

        enc = lane2.compress(x)
        dec = lane2.decompress(enc["strings"], enc["shape"])
        dec_b = lane2.decompress(enc["strings"], enc["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["x_hat"]), np.asarray(dec_b["x_hat"])
        )
        # a pipeline=1 stream is NOT decodable by the pipeline=2 codec
        enc1 = lane1.compress(x)
        with pytest.raises(ValueError):
            lane2.decompress(enc1["strings"], enc1["shape"])

    def test_tbc_uneven_slices(self):
        """TBC's last slice is narrower: per-segment symbol counts differ
        and the kernel runs at two distinct shapes."""
        model = TransformerBasedCoding(
            channels=(8, 12, 16, 20, 8, 8),
            depths=(1, 1, 1, 1), h_depths=(1, 1),
            num_heads=4, h_num_heads=4,
            window_size=4, h_window_size=4,
            num_slices=3,  # 20 channels -> widths 7,7,6
        )
        variables = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            np.zeros((1, 64, 64, 3), np.float32),
            training=False,
        )
        params = variables["params"]
        host = Codec(model, params, coder="host")
        lane = Codec(model, params, coder="lane")
        x = np.asarray(jax.random.uniform(jax.random.key(9), (1, 64, 64, 3)))
        enc = lane.compress(x)
        dec_f = lane.decompress(enc["strings"], enc["shape"])  # fused
        lane.fused = False
        dec_l = lane.decompress(enc["strings"], enc["shape"])
        enc_h = host.compress(x)
        dec_h = host.decompress(enc_h["strings"], enc_h["shape"])
        # per-slice lane walk shares executables with host: bit-exact
        np.testing.assert_array_equal(
            np.asarray(dec_h["x_hat"]), np.asarray(dec_l["x_hat"])
        )
        # fused program: same symbols (hash-guarded), fusion-level floats
        np.testing.assert_allclose(
            np.asarray(dec_f["x_hat"], np.float32),
            np.asarray(dec_h["x_hat"], np.float32),
            atol=1e-5, rtol=2e-2,
        )


class TestCompressPrefetch:
    """`compress(prefetch=...)` — the batch-pipelining hook (bench.py /
    eval CLI issue the NEXT batch's device_put there while the walk
    runs). Contract: fires exactly once per compress() — including
    across a fused->per-slice fallback — and never changes the bytes."""

    def test_fires_once_and_streams_identical(self, small_model_state):
        model, state = small_model_state
        for fused in (False, True):
            codec = Codec(
                model, state.params, coder="lane", fused_encode=fused
            )
            x = np.asarray(
                jax.random.uniform(jax.random.key(3), (1, 64, 64, 3))
            )
            plain = codec.compress(x)
            calls = []
            enc = codec.compress(x, prefetch=lambda: calls.append(1))
            assert len(calls) == 1
            assert enc["strings"][0][0] == plain["strings"][0][0]

    def test_fires_once_across_fused_fallback(self, small_model_state):
        from stf_tpu.models.codec import (
            _LANE_FLAG_FUSED_ENC,
            _LaneSideOverflow,
        )

        model, state = small_model_state
        codec = Codec(model, state.params, coder="lane", fused_encode=True)
        x = np.asarray(
            jax.random.uniform(jax.random.key(4), (1, 64, 64, 3))
        )
        orig = codec._build_lane_stream

        def overflow_fused_only(pending, flags=0):
            if flags & _LANE_FLAG_FUSED_ENC:
                raise _LaneSideOverflow("simulated fused-side overflow")
            return orig(pending, flags=flags)

        codec._build_lane_stream = overflow_fused_only
        calls = []
        enc = codec.compress(x, prefetch=lambda: calls.append(1))
        codec._build_lane_stream = orig
        # the per-slice rerun must NOT re-trigger the upload hook
        assert len(calls) == 1
        assert not (enc["strings"][0][0][0] & 0x01)  # per-slice header
        dec = codec.decompress(enc["strings"], enc["shape"])
        assert np.all(np.isfinite(np.asarray(dec["x_hat"], np.float32)))


class TestUpdateScaleTable:
    """`Codec.update(scale_table=...)` — the reference's table-sweep
    protocol (`GaussianConditional.update_scale_table`,
    entropy_models.py:588) — must atomically swap ALL derived state: the
    per-slice walk programs capture the table as a device constant, so a
    stale capture would derive scale indexes from one table while coding
    against another's CDFs (silent stream divergence)."""

    def test_update_matches_fresh_codec(self, small_model_state):
        model, state = small_model_state
        coarse = np.exp(
            np.linspace(np.log(0.11), np.log(256.0), 24)
        ).astype(np.float32)
        x = np.asarray(jax.random.uniform(jax.random.key(31), (1, 64, 64, 3)))

        swapped = Codec(model, state.params, coder="host")
        enc_default = swapped.compress(x)
        swapped.update(scale_table=coarse)
        enc_swapped = swapped.compress(x)

        fresh = Codec(model, state.params, coder="host", scale_table=coarse)
        enc_fresh = fresh.compress(x)
        assert enc_swapped["strings"][0] == enc_fresh["strings"][0]
        assert enc_swapped["strings"][0] != enc_default["strings"][0]

        dec = fresh.decompress(enc_swapped["strings"], enc_swapped["shape"])
        dec_own = swapped.decompress(enc_swapped["strings"], enc_swapped["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["x_hat"]), np.asarray(dec_own["x_hat"])
        )

    def test_update_lane_backend(self, small_model_state):
        """Lane backend: update() must also rebuild the device tables and
        invalidate the fused-program caches."""
        model, state = small_model_state
        coarse = np.exp(
            np.linspace(np.log(0.11), np.log(256.0), 24)
        ).astype(np.float32)
        x = np.asarray(jax.random.uniform(jax.random.key(32), (1, 64, 64, 3)))
        swapped = Codec(model, state.params, coder="lane")
        swapped.compress(x)  # populate fused caches at the default table
        swapped.update(scale_table=coarse)
        fresh = Codec(model, state.params, coder="lane", scale_table=coarse)
        enc_swapped = swapped.compress(x)
        enc_fresh = fresh.compress(x)
        assert enc_swapped["strings"][0][0] == enc_fresh["strings"][0][0]
        dec = swapped.decompress(enc_swapped["strings"], enc_swapped["shape"])
        dec_f = fresh.decompress(enc_fresh["strings"], enc_fresh["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["x_hat"]), np.asarray(dec_f["x_hat"])
        )

    def test_update_reapplies_pack_drain_guard(self, small_model_state):
        model, state = small_model_state
        wide = np.exp(
            np.linspace(np.log(0.11), np.log(256.0), 128)
        ).astype(np.float32)
        # auto mode: packing follows the new table's eligibility
        codec = Codec(model, state.params, coder="host")
        assert codec._pack_drain
        codec.update(scale_table=wide)
        assert not codec._pack_drain
        # explicit pack_drain=True: a too-wide table must raise at update
        forced = Codec(model, state.params, coder="host", pack_drain=True)
        with pytest.raises(ValueError, match="pack_drain"):
            forced.update(scale_table=wide)

    def test_short_lane_stream_raises_value_error(self, small_model_state):
        """Truncation inside the codec header must hit the documented
        ValueError, not a cryptic numpy buffer-size error."""
        model, state = small_model_state
        lane = Codec(model, state.params, coder="lane")
        x = np.asarray(jax.random.uniform(jax.random.key(33), (1, 64, 64, 3)))
        enc = lane.compress(x)
        for blob in (b"", b"\x5a\x01", enc["strings"][0][0][:7]):
            with pytest.raises(ValueError, match="lane y-stream"):
                lane.decompress([[blob], enc["strings"][1]], enc["shape"])
