"""Round-trip and semantic tests for the native rANS coder.

The reference validates its coder only indirectly (round-trip PSNR); here the
coder is tested directly with random CDFs, bypass escapes, streaming decode,
and the CDF quantizer's invariants (SURVEY.md §4 test plan).
"""

import numpy as np
import pytest

from stf_tpu.ans import (
    BufferedRansEncoder,
    RansDecoder,
    RansEncoder,
    pmf_to_quantized_cdf,
    pmf_to_quantized_cdf_rows,
)


def random_cdf_table(rng, rows, max_len):
    """Build a valid random quantized CDF table + lengths + offsets."""
    lengths = rng.integers(3, max_len + 1, size=rows).astype(np.int32)
    cdfs = np.zeros((rows, max_len), dtype=np.int32)
    for r in range(rows):
        n_bins = lengths[r] - 1
        pmf = rng.random(n_bins).astype(np.float32) + 1e-3
        pmf /= pmf.sum()
        cdfs[r, : lengths[r]] = pmf_to_quantized_cdf(pmf, 16)
    offsets = rng.integers(-20, 20, size=rows).astype(np.int32)
    return cdfs, lengths, offsets


class TestPmfToQuantizedCdf:
    def test_invariants(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            n = int(rng.integers(2, 40))
            pmf = rng.random(n).astype(np.float32)
            pmf /= pmf.sum()
            cdf = pmf_to_quantized_cdf(pmf, 16)
            assert cdf[0] == 0
            assert cdf[-1] == 1 << 16
            assert np.all(np.diff(cdf) > 0), "zero-width bin survived"

    def test_tiny_probabilities_get_nonzero_bins(self):
        pmf = np.array([1e-12, 1.0 - 3e-12, 1e-12, 1e-12], dtype=np.float32)
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert np.all(np.diff(cdf) > 0)

    def test_rows_matches_single(self):
        rng = np.random.default_rng(1)
        rows, max_len = 7, 12
        lengths = rng.integers(2, max_len + 1, size=rows).astype(np.int32)
        pmf = np.zeros((rows, max_len), dtype=np.float32)
        tail = rng.random(rows).astype(np.float32) * 1e-4
        for r in range(rows):
            p = rng.random(lengths[r]).astype(np.float32)
            pmf[r, : lengths[r]] = p / p.sum() * (1 - tail[r])
        table = pmf_to_quantized_cdf_rows(pmf, tail, lengths, 16)
        assert table.shape == (rows, max_len + 2)
        for r in range(rows):
            row_pmf = np.concatenate([pmf[r, : lengths[r]], tail[r : r + 1]])
            expected = pmf_to_quantized_cdf(row_pmf, 16)
            np.testing.assert_array_equal(table[r, : lengths[r] + 2], expected)


class TestRansRoundTrip:
    def test_in_range_symbols(self):
        rng = np.random.default_rng(2)
        cdfs, lengths, offsets = random_cdf_table(rng, rows=5, max_len=20)
        n = 4096
        indexes = rng.integers(0, 5, size=n).astype(np.int32)
        # keep symbols strictly inside each row's CDF support (no bypass)
        symbols = np.array(
            [
                rng.integers(0, lengths[i] - 2) + offsets[i]
                for i in indexes
            ],
            dtype=np.int32,
        )
        stream = RansEncoder().encode_with_indexes(
            symbols, indexes, cdfs, lengths, offsets
        )
        out = RansDecoder().decode_with_indexes(
            stream, indexes, cdfs, lengths, offsets
        )
        np.testing.assert_array_equal(out, symbols)

    def test_bypass_escapes(self):
        rng = np.random.default_rng(3)
        cdfs, lengths, offsets = random_cdf_table(rng, rows=3, max_len=10)
        n = 512
        indexes = rng.integers(0, 3, size=n).astype(np.int32)
        # out-of-range values on both sides, incl. very large magnitudes that
        # need multiple 4-bit chunks and the saturating unary count
        symbols = rng.integers(-100000, 100000, size=n).astype(np.int32)
        stream = RansEncoder().encode_with_indexes(
            symbols, indexes, cdfs, lengths, offsets
        )
        out = RansDecoder().decode_with_indexes(
            stream, indexes, cdfs, lengths, offsets
        )
        np.testing.assert_array_equal(out, symbols)

    def test_streaming_decode_matches_oneshot(self):
        rng = np.random.default_rng(4)
        cdfs, lengths, offsets = random_cdf_table(rng, rows=4, max_len=16)
        chunks = [
            (
                rng.integers(-30, 30, size=200).astype(np.int32),
                rng.integers(0, 4, size=200).astype(np.int32),
            )
            for _ in range(5)
        ]
        enc = BufferedRansEncoder()
        for symbols, indexes in chunks:
            enc.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
        stream = enc.flush()

        dec = RansDecoder()
        dec.set_stream(stream)
        for symbols, indexes in chunks:
            out = dec.decode_stream(indexes, cdfs, lengths, offsets)
            np.testing.assert_array_equal(out, symbols)

    def test_corrupt_and_truncated_streams_decode_in_bounds(self):
        """The bitstream is the one untrusted input of the decode path:
        random garbage, truncated valid streams, and zero streams must
        decode to SOME n symbols deterministically (the renormalization
        word fetch zero-fills past the stream end instead of reading out
        of bounds). Catches memory-unsafety the reference never guards."""
        from stf_tpu.ans import RangeDecoder

        rng = np.random.default_rng(6)
        cdfs, lengths, offsets = random_cdf_table(rng, rows=4, max_len=16)
        n = 257
        indexes = rng.integers(0, 4, size=n).astype(np.int32)
        symbols = rng.integers(-1000, 1000, size=n).astype(np.int32)
        valid = RansEncoder().encode_with_indexes(
            symbols, indexes, cdfs, lengths, offsets
        )

        streams = [bytes(rng.integers(0, 256, size=m, dtype=np.uint8))
                   for m in (8, 12, 64, 4096)]
        streams += [valid[: max(8, (len(valid) // 2) // 4 * 4)],
                    b"\xff" * 64, b"\x00" * 64]
        for s in streams:
            out = RansDecoder().decode_with_indexes(
                s, indexes, cdfs, lengths, offsets
            )
            assert out.shape == (n,)
            out2 = RansDecoder().decode_with_indexes(
                s, indexes, cdfs, lengths, offsets
            )
            np.testing.assert_array_equal(out, out2)  # deterministic
            dec = RansDecoder()
            dec.set_stream(s)
            assert dec.decode_stream(
                indexes, cdfs, lengths, offsets
            ).shape == (n,)
            rd = RangeDecoder()
            rd.set_stream(s)
            assert rd.decode_stream(
                indexes, cdfs, lengths, offsets
            ).shape == (n,)

    def test_empty(self):
        cdfs = np.array([[0, 30000, 1 << 16]], dtype=np.int32)
        stream = RansEncoder().encode_with_indexes(
            [], [], cdfs, [3], [0]
        )
        out = RansDecoder().decode_with_indexes(stream, [], cdfs, [3], [0])
        assert out.size == 0

    def test_compression_near_entropy(self):
        # A skewed 2-symbol source should compress close to its entropy.
        rng = np.random.default_rng(5)
        p = 0.95
        # Last bin is the tail/escape symbol (as in real tables); data symbols
        # are 0/1 and never escape.
        pmf = np.array([p, 1 - p - 1e-4, 1e-4], dtype=np.float32)
        cdfs = np.zeros((1, 4), dtype=np.int32)
        cdfs[0] = pmf_to_quantized_cdf(pmf, 16)
        n = 100_000
        symbols = (rng.random(n) > p).astype(np.int32)
        indexes = np.zeros(n, dtype=np.int32)
        stream = RansEncoder().encode_with_indexes(
            symbols, indexes, cdfs, [4], [0]
        )
        entropy_bits = -(p * np.log2(p) + (1 - p) * np.log2(1 - p)) * n
        assert len(stream) * 8 < entropy_bits * 1.05 + 128

    def test_index_out_of_range_raises(self):
        cdfs = np.array([[0, 30000, 1 << 16]], dtype=np.int32)
        with pytest.raises(ValueError):
            RansEncoder().encode_with_indexes([0], [5], cdfs, [3], [0])
