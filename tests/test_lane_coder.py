"""Interleaved lane-rANS round-trip tests (the device entropy decoder).

Random CDFs (built by the same native pmf_to_quantized_cdf used in
production), random symbols including out-of-range escapes; the host
encoder's grouped stream must decode exactly via both the NumPy reference
decoder and the Pallas kernel (interpreter mode on CPU CI; the real-TPU
path is exercised by tools/bench_device_decode.py)."""

import numpy as np
import pytest

from stf_tpu.ans import pmf_to_quantized_cdf_rows
from stf_tpu.ans.lane_coder import (
    GROUPS,
    K,
    LaneTables,
    lane_decode,
    lane_decode_reference,
    lane_encode,
    make_lane_tables,
    truncate_tables,
)


def random_tables(rng, rows=7, max_pmf=12) -> LaneTables:
    lengths = rng.integers(2, max_pmf + 1, rows).astype(np.int32)
    pmf = np.zeros((rows, max_pmf), np.float32)
    for r in range(rows):
        p = rng.random(lengths[r]).astype(np.float32) + 1e-3
        pmf[r, : lengths[r]] = p / p.sum() * 0.98
    tail = np.full(rows, 0.02, np.float32)
    cdf = pmf_to_quantized_cdf_rows(pmf, tail, lengths)
    offsets = rng.integers(-20, 20, rows).astype(np.int32)
    return make_lane_tables(cdf, lengths + 2, offsets)


def random_symbols(rng, tables: LaneTables, n, escape_frac=0.05):
    idx = rng.integers(0, tables.lengths.size, n).astype(np.int32)
    max_s = tables.lengths[idx] - 2
    sym = rng.integers(0, 1 << 30, n) % max_s + tables.offsets[idx]
    esc = rng.random(n) < escape_frac
    sym = np.where(esc, rng.integers(-(1 << 20), 1 << 20, n), sym)
    return sym.astype(np.int32), idx


@pytest.mark.parametrize(
    "n", [1, 7, K, K + 3, GROUPS * K, 5 * GROUPS * K + 13, 4096 + 17]
)
def test_reference_roundtrip(n):
    rng = np.random.default_rng(n)
    tables = random_tables(rng)
    sym, idx = random_symbols(rng, tables, n)
    stream = lane_encode(sym, idx, tables)
    assert stream.n == n
    dec = lane_decode_reference(stream, idx, tables)
    np.testing.assert_array_equal(dec, sym)


def test_reference_roundtrip_no_escapes():
    rng = np.random.default_rng(0)
    tables = random_tables(rng)
    sym, idx = random_symbols(rng, tables, 2000, escape_frac=0.0)
    stream = lane_encode(sym, idx, tables)
    assert stream.side.size == 0
    dec = lane_decode_reference(stream, idx, tables)
    np.testing.assert_array_equal(dec, sym)


def test_reference_roundtrip_skewed():
    """Highly skewed PMFs stress renormalization (freq near 2^16)."""
    rng = np.random.default_rng(1)
    lengths = np.array([3, 2], np.int32)
    pmf = np.array(
        [[0.97, 0.02, 0.005], [0.5, 0.49, 0.0]], np.float32
    )
    tail = np.array([0.005, 0.01], np.float32)
    cdf = pmf_to_quantized_cdf_rows(pmf, tail, lengths)
    tables = make_lane_tables(cdf, lengths + 2, np.array([0, -1], np.int32))
    sym, idx = random_symbols(rng, tables, 3000, escape_frac=0.02)
    stream = lane_encode(sym, idx, tables)
    dec = lane_decode_reference(stream, idx, tables)
    np.testing.assert_array_equal(dec, sym)


@pytest.mark.parametrize("n", [1, K + 3, 5 * GROUPS * K + 13])
def test_native_encoder_matches_numpy(n):
    """The C++ encoder (stf_lane_encode) must be bit-exact with the NumPy
    reference: identical words, states, side channel, and counts."""
    from stf_tpu.ans.lane_coder import lane_encode_numpy

    rng = np.random.default_rng(7000 + n)
    tables = random_tables(rng)
    sym, idx = random_symbols(rng, tables, n)
    native = lane_encode(sym, idx, tables)
    ref = lane_encode_numpy(sym, idx, tables)
    np.testing.assert_array_equal(native.words, ref.words)
    np.testing.assert_array_equal(native.word_counts, ref.word_counts)
    np.testing.assert_array_equal(native.states, ref.states)
    np.testing.assert_array_equal(native.side, ref.side)
    np.testing.assert_array_equal(native.side_counts, ref.side_counts)
    assert native.n == ref.n == n


@pytest.mark.parametrize("n", [K, GROUPS * K, 5 * K + 9, 3 * GROUPS * K + 77])
def test_pallas_kernel_matches(n):
    rng = np.random.default_rng(100 + n)
    tables = random_tables(rng)
    sym, idx = random_symbols(rng, tables, n)
    stream = lane_encode(sym, idx, tables)
    dec = np.asarray(lane_decode(stream, idx, tables, interpret=True))
    np.testing.assert_array_equal(dec, sym)


def test_pallas_kernel_compression_ratio():
    """Sanity: the stream is near the entropy bound, not an escape storm."""
    rng = np.random.default_rng(3)
    tables = random_tables(rng, rows=4, max_pmf=8)
    sym, idx = random_symbols(rng, tables, 50_000, escape_frac=0.0)
    stream = lane_encode(sym, idx, tables)
    bits = stream.words.size * 16 + stream.states.size * 32
    assert bits / stream.n < 4.0  # ~3 bits/sym alphabets
    dec = np.asarray(lane_decode(stream, idx, tables, interpret=True))
    np.testing.assert_array_equal(dec, sym)


def test_truncate_tables_off_center_wide_row():
    """A wide row whose center sits near an edge slides its kept window
    into the row instead of overflowing the clamped width, and symbols
    round-trip (in-window directly, out-of-window via the side channel)."""
    pmf_len = 200
    freqs = np.ones(pmf_len + 1, np.int64)  # + escape slot
    freqs[:60] = 100  # mass near the low edge
    cdf = np.concatenate([[0], np.cumsum(freqs * (1 << 16) // freqs.sum())])
    cdf[-1] = 1 << 16
    # repair potential zero bins
    for i in range(1, cdf.size):
        cdf[i] = max(cdf[i], cdf[i - 1] + 1)
    cdf[-1] = 1 << 16
    offsets = np.array([-10], np.int32)  # center 10 << max_half
    tables = truncate_tables(
        cdf[None], np.array([cdf.size], np.int32), offsets, max_half=62
    )
    assert tables.cdf.shape[1] <= 2 * 62 + 3
    # window slid to start at the row's low edge
    assert tables.offsets[0] == -10

    rng = np.random.default_rng(5)
    sym = rng.integers(-10, 190, 4000).astype(np.int32)
    idx = np.zeros(4000, np.int32)
    stream = lane_encode(sym, idx, tables)
    assert stream.side.size > 0  # beyond-window values escaped
    np.testing.assert_array_equal(
        lane_decode_reference(stream, idx, tables), sym
    )
