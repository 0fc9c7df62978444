"""TPU-native interleaved rANS ("lane coder"): G x 128 parallel rANS32
lanes, decodable ON DEVICE as a single Pallas kernel.

Why: the host coder forces a device->host transfer of indexes and a
host->device transfer of decoded symbols for every channel-AR slice
(`models/codec.py`); through a tunneled link those transfers dominate
decode (PERF.md). A device decoder shrinks the traffic to the actual
bitstream bytes and removes the host from the loop.

Format (ours — the stream layout is framework-defined; reference parity is
at the symbol/CDF level, not the bitstream level):
  * the symbol sequence is row-blocked: rows of K=128 symbols, split into
    G=8 contiguous row groups; group g's rows decode independently, so one
    kernel step advances all G*K = 1024 lanes at once (the serial chain is
    the per-row dependency, cut G-fold — Giesen's interleaved-rANS
    discipline, applied twice).
  * each lane is a 16-bit-renormalizing rANS32 (state in [2^16, 2^32),
    <=1 word in/out per symbol step — the same arithmetic family as the
    vendored core the reference builds on, `third_party/ryg_rans/
    rans64.h:14-60`).
  * each group has its own uint16 word stream: the encoder runs in reverse
    and emits so the forward decoder consumes words in (row, lane) order.
  * out-of-range values escape to a raw int32 side channel per group (the
    reference escapes into in-stream 4-bit bypass chunks,
    `rans_interface.cpp:137-162`; a side channel keeps the device decode
    loop branch-free).

The Pallas kernel is gather-free: the only data-dependent reads are
scalar-base dynamic slices (per-group word/side windows); per-lane word
selection is a rank/one-hot contraction, and per-lane CDF rows come from a
one-hot matmul against the table (rows, width) — all VPU/MXU ops.

Kernel memory layout (VMEM is ~16 MB/core): word streams ride packed
two-uint16-per-int32 in per-group banks and stay resident; the per-symbol
index/output tensors are chunked over a sequential grid so VMEM holds only
one chunk at a time. Decoder state (G x K lane states + 2G stream cursors)
persists across grid steps in scratch.
"""

import functools
from typing import NamedTuple, Tuple

import numpy as np

K = 128          # lanes per group (one TPU vector register row)
# Independent row groups advanced per kernel step (part of the stream
# format). The kernel is bound by the per-row serial state dependency, not
# compute, so more groups buy ILP — but only standalone: G=16 measured
# 0.165 -> 0.112 s per 1.18M-symbol slice in isolation yet NO gain inside
# the fused decompress (decode there is dominated by the transforms and
# synthesis), and G=32 exceeds the 16 MB VMEM scoped limit. Keep 8.
GROUPS = 8
RANS_L = 1 << 16  # renormalization lower bound = 2^precision
PRECISION = 16
SENTINEL = 1 << 20  # table padding: never <= a 16-bit slot
CHUNK_T = 256    # decode-kernel grid chunk: CHUNK_T rows per grid step


class LaneTables(NamedTuple):
    """Device-layout CDF tables: rows padded with SENTINEL to equal width."""

    cdf: np.ndarray      # (R, W) int32, row r valid through lengths[r]
    lengths: np.ndarray  # (R,) int32 (== pmf_len + 2, escape slot included)
    offsets: np.ndarray  # (R,) int32


class LaneStream(NamedTuple):
    """One encoded segment: per-group word/side streams + lane states."""

    words: np.ndarray        # uint16, groups concatenated
    word_counts: np.ndarray  # (G,) int64
    states: np.ndarray       # (G, K) uint32 decoder init states
    side: np.ndarray         # int32 escape values, groups concatenated
    side_counts: np.ndarray  # (G,) int64
    n: int                   # real symbol count


def make_lane_tables(cdf, cdf_lengths, offsets) -> LaneTables:
    cdf = np.asarray(cdf, np.int64)
    lengths = np.asarray(cdf_lengths, np.int32).reshape(-1)
    offsets = np.asarray(offsets, np.int32).reshape(-1)
    out = np.full(cdf.shape, SENTINEL, np.int32)
    for r in range(cdf.shape[0]):
        out[r, : lengths[r]] = cdf[r, : lengths[r]]
    return LaneTables(out, lengths, offsets)


def truncate_tables(cdf, cdf_lengths, offsets, max_half: int = 127) -> LaneTables:
    """Lane tables with every row's symbol window clamped to ±max_half
    around its center; clipped tail mass is folded into the escape slot.

    The Gaussian-conditional rows (entropy_models.build_gc_tables) span
    ±ceil(scale*6.1) slots — up to ~±1565 at the largest table scale —
    which would make the kernel's (K, W) table scan enormous for mass that
    is almost never visited. Symbols beyond the window ride the raw side
    channel instead (they are exactly the ones the codec's int8 transfer
    path already treats as overflow, `models/codec.py` quantize). Bounded
    W keeps the device table scan at MXU-friendly width; the host backend
    keeps the reference-exact full-width tables.
    """
    cdf = np.asarray(cdf, np.int64)
    lengths = np.asarray(cdf_lengths, np.int32).reshape(-1)
    offsets = np.asarray(offsets, np.int32).reshape(-1)
    wmax = 2 * max_half + 1 + 2
    R = cdf.shape[0]
    out_cdf = np.zeros((R, min(cdf.shape[1], wmax)), np.int64)
    out_len = np.empty(R, np.int32)
    out_off = np.empty(R, np.int32)
    for r in range(R):
        L = int(lengths[r])  # cdf entries; pmf_len = L - 2 symbols + escape
        pmf_len = L - 2
        freqs = np.diff(cdf[r, :L])  # pmf_len + 1 freqs (escape last)
        center = -int(offsets[r])
        if pmf_len <= 2 * max_half + 1:
            # small row fits as-is
            out_cdf[r, :L] = cdf[r, :L]
            out_len[r] = L
            out_off[r] = offsets[r]
            continue
        # wide row: keep a (2*max_half+1)-slot window around its center,
        # clipped into the row (off-center rows, e.g. asymmetric entropy-
        # bottleneck supports, slide the window instead of overflowing the
        # output width)
        lo = min(max(center - max_half, 0), pmf_len - (2 * max_half + 1))
        hi = lo + 2 * max_half + 1
        kept = freqs[lo:hi]
        esc = freqs[pmf_len] + freqs[:lo].sum() + freqs[hi:pmf_len].sum()
        new = np.concatenate([[0], np.cumsum(np.concatenate([kept, [esc]]))])
        out_cdf[r, : new.size] = new
        out_len[r] = new.size
        out_off[r] = offsets[r] + lo  # == -max_half for centered rows
    return make_lane_tables(out_cdf, out_len, out_off)


def _sym_cum_freq(symbols, indexes, tables: LaneTables):
    """Per-symbol (slot index, cum, freq, escaped) under the tables."""
    idx = np.asarray(indexes, np.int64)
    lens = tables.lengths[idx].astype(np.int64)
    max_s = lens - 2  # escape slot index
    s = np.asarray(symbols, np.int64) - tables.offsets[idx]
    esc = (s < 0) | (s >= max_s)
    s_eff = np.where(esc, max_s, s)
    cum = tables.cdf[idx, s_eff].astype(np.int64)
    nxt = tables.cdf[idx, s_eff + 1].astype(np.int64)
    return s_eff, cum, nxt - cum, esc


def _pad_to_rows(symbols, indexes, tables: LaneTables):
    """Pad (symbols, indexes) to G*Tg full K-rows. Padding symbols encode
    as row 0, slot 0 (always in range); the decoder pads indexes with the
    same zeros, so padded tails round-trip and are sliced off."""
    n = symbols.size
    rows = (n + K - 1) // K
    tg = (rows + GROUPS - 1) // GROUPS
    total = GROUPS * tg * K
    symbols = np.concatenate(
        [symbols, np.full(total - n, tables.offsets[0], np.int32)]
    )
    indexes = np.concatenate(
        [indexes, np.zeros(total - n, np.int32)]
    )
    return symbols, indexes, tg


def _encode_group(symbols, indexes, tables: LaneTables):
    """Encode exactly Tg*K symbols with K interleaved lanes. Returns
    (words uint16, init_states (K,) uint32, side int32)."""
    T = symbols.size // K
    _, cum, freq, esc = _sym_cum_freq(symbols, indexes, tables)
    side = symbols[esc].astype(np.int32)
    cum2 = cum.reshape(T, K)
    freq2 = freq.reshape(T, K)

    state = np.full(K, RANS_L, np.uint64)
    chunks = []
    for t in range(T - 1, -1, -1):
        f = freq2[t].astype(np.uint64)
        c = cum2[t].astype(np.uint64)
        m = state >= (f << PRECISION)
        # emit in lane-DESC order; the final reversal restores lane-ASC
        chunks.append((state[m] & 0xFFFF).astype(np.uint16)[::-1])
        state = np.where(m, state >> PRECISION, state)
        state = ((state // f) << PRECISION) + c + (state % f)
    words = (
        np.concatenate(chunks)[::-1] if chunks else np.empty(0, np.uint16)
    )
    return words, state.astype(np.uint32), side


def lane_encode_numpy(symbols, indexes, tables: LaneTables) -> LaneStream:
    """Pure-NumPy encoder — the native encoder's oracle (and fallback)."""
    symbols = np.asarray(symbols, np.int32).reshape(-1)
    indexes = np.asarray(indexes, np.int32).reshape(-1)
    n = symbols.size
    symbols, indexes, tg = _pad_to_rows(symbols, indexes, tables)
    gsz = tg * K
    words, states, side = [], [], []
    for g in range(GROUPS):
        w, st, sd = _encode_group(
            symbols[g * gsz : (g + 1) * gsz],
            indexes[g * gsz : (g + 1) * gsz],
            tables,
        )
        words.append(w)
        states.append(st)
        side.append(sd)
    return LaneStream(
        np.concatenate(words) if words else np.empty(0, np.uint16),
        np.asarray([w.size for w in words], np.int64),
        np.stack(states),
        np.concatenate(side) if side else np.empty(0, np.int32),
        np.asarray([s.size for s in side], np.int64),
        n,
    )


def lane_encode(symbols, indexes, tables: LaneTables) -> LaneStream:
    """Host-side encoder: split into G row groups, encode each
    independently (the decoder advances all groups in lockstep). Runs in
    the native extension (`csrc/rans_coder.cpp` stf_lane_encode) — the
    NumPy row loop is ~50x slower and kept as `lane_encode_numpy`."""
    from ._binding import lane_encode_groups

    symbols = np.asarray(symbols, np.int32).reshape(-1)
    indexes = np.asarray(indexes, np.int32).reshape(-1)
    n = symbols.size
    symbols, indexes, tg = _pad_to_rows(symbols, indexes, tables)
    words, word_counts, states, side, side_counts = lane_encode_groups(
        symbols, indexes, tg, GROUPS, K,
        tables.cdf, tables.lengths, tables.offsets,
    )
    return LaneStream(words, word_counts, states, side, side_counts, n)


def _decode_group_reference(words, init_states, side, indexes, tables, T):
    """Pure-NumPy forward decoder for one group — the kernel's oracle."""
    idx2 = np.asarray(indexes, np.int64).reshape(T, K)
    words = np.asarray(words, np.uint64)
    state = np.asarray(init_states, np.uint64).copy()
    out = np.empty((T, K), np.int32)
    base = 0
    sbase = 0
    for t in range(T):
        idx = idx2[t]
        row = tables.cdf[idx].astype(np.int64)  # (K, W)
        lens = tables.lengths[idx].astype(np.int64)
        slot = (state & 0xFFFF).astype(np.int64)
        le = row <= slot[:, None]
        s = le[:, 1:].sum(1)  # count of cdf[j] <= slot for j >= 1
        cum = np.max(np.where(le, row, -1), axis=1)
        nxt = np.min(np.where(le, SENTINEL, row), axis=1)
        nxt = np.minimum(nxt, RANS_L)
        freq = (nxt - cum).astype(np.uint64)
        state = freq * (state >> PRECISION) + (slot - cum).astype(np.uint64)
        m = state < RANS_L
        nren = int(m.sum())
        w = np.zeros(K, np.uint64)
        w[m] = words[base : base + nren]
        state = np.where(m, (state << PRECISION) | w, state)
        base += nren
        esc = s == lens - 2
        vals = (s + tables.offsets[idx]).astype(np.int32)
        nesc = int(esc.sum())
        if nesc:
            vals[esc] = side[sbase : sbase + nesc]
            sbase += nesc
        out[t] = vals
    return out.reshape(-1)


def lane_decode_reference(
    stream: LaneStream, indexes, tables: LaneTables
) -> np.ndarray:
    indexes = np.asarray(indexes, np.int32).reshape(-1)
    _, indexes, tg = _pad_to_rows(
        np.zeros(stream.n, np.int32), indexes, tables
    )
    wb = np.concatenate([[0], np.cumsum(stream.word_counts)])
    sb = np.concatenate([[0], np.cumsum(stream.side_counts)])
    out = []
    gsz = tg * K
    for g in range(GROUPS):
        out.append(
            _decode_group_reference(
                stream.words[wb[g] : wb[g + 1]],
                stream.states[g],
                stream.side[sb[g] : sb[g + 1]],
                indexes[g * gsz : (g + 1) * gsz],
                tables,
                tg,
            )
        )
    return np.concatenate(out)[: stream.n]


# -- stream framing -----------------------------------------------------------


# Format word leading every packed stream: magic byte, layout version, and
# the two constants the layout depends on (GROUPS, K). A future GROUPS/K
# change (or a stream from a different build) fails loudly at unpack
# instead of silently misparsing (CLAUDE.md stream-layout invariant).
_STREAM_MAGIC = 0x5A
_STREAM_VERSION = 1


def _format_word() -> int:
    return (
        (_STREAM_MAGIC << 24)
        | (_STREAM_VERSION << 16)
        | (GROUPS << 8)
        | (K & 0xFF)
    )


def pack_lane_stream(segments) -> bytes:
    """Serialize a list of LaneStream segments into one byte string.

    Layout (little-endian): u32 format word (magic/version/GROUPS/K, see
    `_format_word`); u32 segment count; per segment u32 n_symbols,
    G u32 word counts, G u32 side counts; then per segment, in order:
    G*K u32 init states, words u16 (padded to 4-byte alignment), side i32.
    """
    head = [
        np.asarray([_format_word(), len(segments)], "<u4").tobytes()
    ]
    body = []
    for seg in segments:
        head.append(np.asarray([seg.n], "<u4").tobytes())
        head.append(np.asarray(seg.word_counts, "<u4").tobytes())
        head.append(np.asarray(seg.side_counts, "<u4").tobytes())
        chunk = (
            np.asarray(seg.states, "<u4").tobytes()
            + np.asarray(seg.words, "<u2").tobytes()
        )
        if len(chunk) % 4:
            chunk += b"\x00\x00"
        body.append(chunk + np.asarray(seg.side, "<i4").tobytes())
    return b"".join(head + body)


def fixed_overhead_bytes(n_segments: int) -> int:
    """Bytes of fixed per-segment framing in a packed lane stream — the
    format word, per-segment metadata, and the G*K lane init states — the
    part that doesn't scale with content entropy. The lane format trades
    this constant (~4.2 KB/segment) for one-dispatch device decode;
    subtract it from the stream length for a host-equivalent rate
    estimate (RD curves should use the host backend directly)."""
    return 8 + n_segments * (4 * (1 + 2 * GROUPS) + 4 * GROUPS * K)


def unpack_lane_stream(buf: bytes):
    """Inverse of pack_lane_stream: a list of LaneStream segments.

    Validates the format word and every section's byte extent against the
    remaining buffer, so truncation or a layout mismatch raises ValueError
    instead of yielding silently-short arrays and a garbage decode.
    """
    buf = memoryview(buf)

    def take(pos: int, nbytes: int, what: str):
        if pos + nbytes > len(buf):
            raise ValueError(
                f"truncated lane stream: {what} needs {nbytes} bytes at "
                f"offset {pos}, have {len(buf) - pos}"
            )
        return buf[pos : pos + nbytes], pos + nbytes

    head, pos = take(0, 8, "header")
    fmt, count = (int(v) for v in np.frombuffer(head, "<u4"))
    if fmt != _format_word():
        raise ValueError(
            f"lane stream format word 0x{fmt:08x} does not match this "
            f"build's 0x{_format_word():08x} (magic/version/GROUPS/K)"
        )
    meta_w = 1 + 2 * GROUPS
    raw, pos = take(pos, 4 * meta_w * count, "segment metadata")
    meta = np.frombuffer(raw, "<u4").reshape(count, meta_w)
    segments = []
    for row in meta:
        n = int(row[0])
        wc = row[1 : 1 + GROUPS].astype(np.int64)
        sc = row[1 + GROUPS :].astype(np.int64)
        nw, ns = int(wc.sum()), int(sc.sum())
        raw, pos = take(pos, 4 * GROUPS * K, "init states")
        states = np.frombuffer(raw, "<u4").reshape(GROUPS, K)
        raw, pos = take(pos, 2 * nw, "word stream")
        words = np.frombuffer(raw, "<u2")
        _, pos = take(pos, (2 * nw) % 4, "alignment padding")
        raw, pos = take(pos, 4 * ns, "side channel")
        side = np.frombuffer(raw, "<i4")
        segments.append(LaneStream(words, wc, states, side, sc, n))
    if pos != len(buf):
        raise ValueError(
            f"lane stream has {len(buf) - pos} trailing bytes after the "
            "last segment"
        )
    return segments


# -- device decoder -----------------------------------------------------------


def pack_word_banks(stream: LaneStream, rows: int) -> np.ndarray:
    """Per-group uint16 word streams -> (G*rows, K) int32 banks, two words
    per element (little-endian halves), zero-padded. `rows` must cover
    every group: words_rows_for(max(word_counts))."""
    out = np.zeros((GROUPS, rows * K * 2), np.uint16)
    wb = np.concatenate([[0], np.cumsum(stream.word_counts)])
    for g in range(GROUPS):
        w = stream.words[wb[g] : wb[g + 1]]
        out[g, : w.size] = w
    return (
        out.reshape(-1)
        .view("<u4")
        .astype(np.int64)
        .astype(np.int32)
        .reshape(GROUPS * rows, K)
    )


def flat_banks(segments, wr: int, sr: int):
    """Compact H2D form of every segment's decoder inputs: ONE flat int32
    buffer holding, per segment, each group's word pairs (two LE uint16
    words per int32 — `pack_word_banks`'s element layout), side values,
    and init states back to back, plus an (n_seg, 3, GROUPS) int32 offset
    table (word / side / state start, in int32 elements). The fused
    decode program rebuilds the kernel's padded (G*rows, K) banks on
    device with `lax.dynamic_slice`, so H2D traffic is ~stream bytes
    instead of bucket-padded banks (which inflate ~8x at trained
    operating points). The buffer ends with max(wr, sr)*K zeros so every
    fixed-size slice stays in bounds; slice tails read the next group's
    data, which the kernel's positional one-hot masks never select
    (consumption stops at each group's written count).
    """
    chunks = []
    offs = np.zeros((len(segments), 3, GROUPS), np.int64)
    pos = 0
    for j, seg in enumerate(segments):
        wb = np.concatenate([[0], np.cumsum(seg.word_counts)])
        sb = np.concatenate([[0], np.cumsum(seg.side_counts)])
        for g in range(GROUPS):
            w = np.asarray(seg.words[wb[g] : wb[g + 1]], "<u2")
            pad = np.zeros((w.size + 1) // 2 * 2, "<u2")
            pad[: w.size] = w
            wi = pad.view("<u4").astype(np.int64).astype(np.int32)
            chunks.append(wi)
            offs[j, 0, g] = pos
            pos += wi.size
        for g in range(GROUPS):
            sd = np.asarray(seg.side[sb[g] : sb[g + 1]], np.int32)
            chunks.append(sd)
            offs[j, 1, g] = pos
            pos += sd.size
        st = np.ascontiguousarray(seg.states, "<u4").view(np.int32)
        for g in range(GROUPS):
            offs[j, 2, g] = pos + g * K
        chunks.append(st.reshape(-1))
        pos += st.size
    chunks.append(np.zeros(max(wr, sr) * K, np.int32))
    return np.concatenate(chunks), offs.astype(np.int32)


def pad_side_banks(stream: LaneStream, rows: int) -> np.ndarray:
    """Per-group int32 side channels -> (G*rows, K) int32 banks."""
    out = np.zeros((GROUPS, rows * K), np.int32)
    sb = np.concatenate([[0], np.cumsum(stream.side_counts)])
    for g in range(GROUPS):
        s = stream.side[sb[g] : sb[g + 1]]
        out[g, : s.size] = s
    return out.reshape(GROUPS * rows, K)


def words_rows_for(n_words: int) -> int:
    return (int(n_words) + 2 * K - 1) // (2 * K) + 2


def side_rows_for(n_side: int) -> int:
    return (int(n_side) + K - 1) // K + 2


def device_tables(tables: LaneTables):
    """LaneTables -> device arrays in the kernel's layout (cdf as f32:
    values < 2^20 are f32-exact)."""
    import jax.numpy as jnp

    return (
        jnp.asarray(tables.cdf.astype(np.float32)),
        jnp.asarray(tables.lengths.astype(np.float32).reshape(-1, 1)),
        jnp.asarray(tables.offsets.astype(np.float32).reshape(-1, 1)),
    )


@functools.lru_cache(maxsize=None)
def _decode_kernel(tg: int, words_rows: int, side_rows: int,
                   R: int, W: int, interpret: bool):
    """Compiled grouped decoder: (Tg_pad*G, K) group-interleaved index
    rows + resident stream banks -> symbols in the same layout. Sequential
    grid over row chunks; lane states + per-group stream cursors persist
    in scratch."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = GROUPS
    n_chunks = (tg + CHUNK_T - 1) // CHUNK_T

    def kernel(idx_ref, words_ref, side_ref, states_ref,
               cdf_ref, lens_ref, offs_ref, out_ref,
               base_ref, sbase_ref, st_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            st_ref[:] = states_ref[:]
            for g in range(G):
                base_ref[g] = 0
                sbase_ref[g] = 0

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)
        # exclusive-prefix-sum matrix: rank = m @ tri (gather-free cumsum)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        ).astype(jnp.float32)
        hp = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        def pick(stream_ref, g_row0, base, rank, mask_k1, packed):
            """Group-local stream read at uint16/int32 positions base+rank
            (rank < K) without gathers: load the 2 aligned rows covering
            the window, one-hot select each lane's element by in-window
            position (integer select-sum: packed values exceed f32's
            exact-int range), then for packed streams pick the uint16 half
            by position parity."""
            pos = base + rank  # (K, 1) int32 stream positions
            if packed:
                arow = base >> 8  # int32 row = 256 uint16 slots
                o = (pos >> 1) - ((base >> 8) << 7)
            else:
                arow = base >> 7
                o = pos - ((base >> 7) << 7)
            win = stream_ref[pl.ds(g_row0 + arow, 2), :]  # (2, K) int32
            p0 = (o == lane_i) & mask_k1
            p1 = (o - K == lane_i) & mask_k1
            w = jnp.sum(
                jnp.where(p0, win[0:1, :], 0)
                + jnp.where(p1, win[1:2, :], 0),
                axis=1,
            )  # (K,) int32
            if packed:
                w = jnp.where(
                    (pos.reshape(K) & 1) == 1, (w >> 16) & 0xFFFF,
                    w & 0xFFFF,
                )
            return w

        t0 = pl.program_id(0) * CHUNK_T

        def group_step(g, t):
            """One group's decode step: identical math to the single-group
            kernel, on (K, *) shapes Mosaic lowers cleanly (a fused
            (G*K, W) layout hits unsupported (G, K)->(G*K, 1) shape
            casts). The G copies are data-independent, so the VLIW
            scheduler can overlap their serial chains."""
            state = st_ref[g : g + 1, :]  # (1, K) uint32
            # group-interleaved row layout: row t*G+g is group g's row t
            # (full-width loads at a dynamic row index; Mosaic rejects
            # column-offset slices at dynamic rows)
            idx = idx_ref[t * G + g, :].reshape(K, 1)

            onehot = (idx == row_i).astype(jnp.float32)  # (K, R)
            rows = jnp.dot(onehot, cdf_ref[:], **hp)  # (K, W)
            rlen = jnp.dot(onehot, lens_ref[:], **hp)  # (K, 1)
            roff = jnp.dot(onehot, offs_ref[:], **hp)  # (K, 1)

            slot_u = state & 0xFFFF  # (1, K)
            slot = (
                slot_u.astype(jnp.int32).astype(jnp.float32)
            ).reshape(K, 1)  # two-step cast: Mosaic lacks uint32<->f32
            le = rows <= slot  # (K, W); SENTINEL pads are never <=
            s = jnp.sum(
                le[:, 1:].astype(jnp.float32), axis=1, keepdims=True
            )  # (K, 1): count of cdf[j] <= slot, j >= 1
            cum = jnp.max(jnp.where(le, rows, -1.0), axis=1, keepdims=True)
            nxt = jnp.min(
                jnp.where(le, float(SENTINEL), rows), axis=1, keepdims=True
            )
            freq = (
                (nxt - cum).astype(jnp.int32).astype(jnp.uint32)
            ).reshape(1, K)
            cum_u = cum.astype(jnp.int32).astype(jnp.uint32).reshape(1, K)

            state = freq * (state >> PRECISION) + (slot_u - cum_u)

            # renormalize: lanes below L consume one word each, lane order
            m = state < RANS_L  # (1, K)
            mf = m.astype(jnp.float32)
            rank = jnp.dot(mf, tri, **hp).astype(jnp.int32)
            w = pick(
                words_ref, g * words_rows, base_ref[g],
                rank.reshape(K, 1), m.reshape(K, 1), True,
            ).reshape(1, K).astype(jnp.uint32)
            state = jnp.where(m, (state << PRECISION) | w, state)
            st_ref[g : g + 1, :] = state
            base_ref[g] = base_ref[g] + jnp.sum(mf).astype(jnp.int32)

            # escapes take raw values from the side channel, in lane order
            # (escape slot index is len-2; s never exceeds it)
            esc = s.reshape(1, K) >= rlen.reshape(1, K) - 2.5
            ef = esc.astype(jnp.float32)
            erank = jnp.dot(ef, tri, **hp).astype(jnp.int32)
            sval = pick(
                side_ref, g * side_rows, sbase_ref[g],
                erank.reshape(K, 1), esc.reshape(K, 1), False,
            ).reshape(1, K)
            sbase_ref[g] = sbase_ref[g] + jnp.sum(ef).astype(jnp.int32)

            vals = (s + roff).reshape(1, K)
            vals = jnp.where(esc, sval, vals).astype(jnp.int32)
            out_ref[t * G + g, :] = vals.reshape(K)

        def step(t, _):
            @pl.when(t0 + t < tg)
            def _body():
                for g in range(G):
                    group_step(g, t)

            return 0

        jax.lax.fori_loop(0, CHUNK_T, step, 0)

    fn = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK_T * G, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # idx chunk
            pl.BlockSpec((G * words_rows, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),           # word banks
            pl.BlockSpec((G * side_rows, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),           # side banks
            pl.BlockSpec((G, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),           # init states
            pl.BlockSpec((R, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),           # cdf
            pl.BlockSpec((R, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),           # lengths
            pl.BlockSpec((R, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),           # offsets
        ],
        out_specs=pl.BlockSpec((CHUNK_T * G, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks * CHUNK_T * G, K), jnp.int32
        ),
        scratch_shapes=[
            pltpu.SMEM((GROUPS,), jnp.int32),    # word cursors (u16 units)
            pltpu.SMEM((GROUPS,), jnp.int32),    # side cursors
            pltpu.VMEM((GROUPS, K), jnp.uint32),  # lane states
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def lane_decode_device(idx_dev, words_dev, side_dev, states_dev,
                       cdf_dev, lens_dev, offs_dev, n: int,
                       interpret: bool = False):
    """Decode a segment with DEVICE-resident inputs (jit-friendly: no host
    data needed). idx_dev: any-shape integer array, flattened in C order;
    words_dev/side_dev: packed/padded resident banks (pack_word_banks /
    pad_side_banks); states_dev: (G, K) uint32. Returns (n,) int32."""
    import jax.numpy as jnp

    rows = (n + K - 1) // K
    tg = (rows + GROUPS - 1) // GROUPS
    idx = idx_dev.reshape(-1).astype(jnp.int32)
    idx = jnp.pad(idx, (0, GROUPS * tg * K - n))
    # (G, Tg, K) -> (Tg*G, K) group-interleaved rows: step t decodes rows
    # [t*G, (t+1)*G) — row t of every group
    idx = jnp.transpose(
        idx.reshape(GROUPS, tg, K), (1, 0, 2)
    ).reshape(tg * GROUPS, K)
    n_chunks = (tg + CHUNK_T - 1) // CHUNK_T
    idx = jnp.pad(idx, ((0, (n_chunks * CHUNK_T - tg) * GROUPS), (0, 0)))

    fn = _decode_kernel(
        tg, words_dev.shape[0] // GROUPS, side_dev.shape[0] // GROUPS,
        cdf_dev.shape[0], cdf_dev.shape[1], interpret,
    )
    out = fn(idx, words_dev, side_dev, states_dev,
             cdf_dev, lens_dev, offs_dev)  # (Tg_pad*G, K)
    out = jnp.transpose(
        out[: tg * GROUPS].reshape(tg, GROUPS, K), (1, 0, 2)
    ).reshape(-1)
    return out[:n]


# -- layout pin ----------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pin_kernel(blk_rows: int, n_blocks: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((blk_rows, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk_rows, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * blk_rows, K), jnp.int32),
        interpret=interpret,
    )


def layout_pin(x, interpret: bool = False):
    """Bit-exact identity copy of `x` through a trivial Pallas kernel.

    Why this exists: a value produced INSIDE a jitted program carries
    whatever buffer layout XLA's global layout assignment picked for it —
    and the layout of an operand changes how the bf16 matmuls consuming it
    tile, which changes their accumulation order, which can flip a derived
    scale-table index between two executables that trace the very same
    Python (`models/codec._traced_walk`). Values that cross a *program
    boundary* are immune: program inputs/outputs get canonical layouts.
    This kernel gives an in-program value the same property — a custom
    call is an optimization fence XLA cannot fuse through, and its output
    buffer layout is fixed by the BlockSpec, not by the surrounding
    program. `lax.optimization_barrier` alone does NOT do this: barriers
    are layout-transparent, so a consumer's layout preference reaches
    through them into the producing island (measured on TPU: the fused
    lane decode twin derived different indexes than the fused encoder at
    pipeline=2 bench shapes until its island operands were pinned).

    Works for any 1/2/4-byte dtype: bits ride int32 words through the
    kernel (f32/bf16 bitcasts are exact, NaNs included).
    """
    import jax
    import jax.numpy as jnp

    dt = x.dtype
    flat = x.reshape(-1)
    n = flat.shape[0]
    per = 4 // np.dtype(dt).itemsize  # sub-word dtypes pack `per` per word
    if per > 1:
        m = -(-n // per) * per
        flat = jnp.pad(flat, (0, m - n))
        words = jax.lax.bitcast_convert_type(
            flat.reshape(-1, per), jnp.int32
        )
    else:
        words = jax.lax.bitcast_convert_type(flat, jnp.int32)
    wn = words.shape[0]
    rows = -(-wn // K)
    blk = min(rows, 512)
    n_blocks = -(-rows // blk)
    words = jnp.pad(words, (0, n_blocks * blk * K - wn))
    out = _pin_kernel(blk, n_blocks, interpret)(words.reshape(-1, K))
    out = out.reshape(-1)[:wn]
    back = jax.lax.bitcast_convert_type(out, dt)
    return back.reshape(-1)[:n].reshape(x.shape)


# -- device encoder -----------------------------------------------------------
#
# Mirror of the decode kernel: symbols and indexes STAY ON DEVICE (they are
# produced there by the codec walk) and only the compressed stream crosses
# device->host — the (q8, idx) drain (~2 B/symbol) becomes ~bpp/8 B/symbol.
#
# Grid = 2 passes over the row chunks:
#   * phase A (forward): escape compaction — out-of-window symbols are
#     scattered to the per-group side channel at an ascending cursor, in
#     exactly the (row, lane-asc) order the host encoder and the decoder
#     use.
#   * phase B (backward): the interleaved rANS emission. Rows run in
#     reverse; each row's renormalization words land at a descending
#     per-group cursor, lane-ascending within the row, which reproduces
#     the host encoder's stream byte-for-byte.
# Scatter writes use the same gather-free discipline as the decoder's
# `pick`: a 2-row window at a scalar-dynamic row offset, one-hot position
# matmuls, read-modify-write.
#
# rANS state update needs an integer division the decode path avoids:
# q = state // freq with state < freq * 2^16 (the renorm invariant), so
# q < 2^16 and a float32 quotient is within +/-1 of exact — one exact
# uint32 fix-up step recovers it (all candidate products stay below 2^32).


@functools.lru_cache(maxsize=None)
def _encode_kernel(tg: int, wcap_rows: int, scap_rows: int,
                   R: int, W: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = GROUPS
    n_chunks = (tg + CHUNK_T - 1) // CHUNK_T
    wcap = tg * K  # emissions per group can't exceed one word per symbol

    def kernel(sym_ref, idx_ref, cdf_ref, lens_ref, offs_ref,
               words_ref, side_ref, states_ref, counts_ref,
               wcur_ref, scur_ref, ovf_ref, st_ref):
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (K, W), 1)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        ).astype(jnp.float32)
        hp = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        col128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init_a():
            for g in range(G):
                scur_ref[g] = 0
                ovf_ref[g] = 0

        @pl.when(pid == n_chunks)
        def _init_b():
            st_ref[:] = jnp.full((G, K), RANS_L, jnp.uint32)
            for g in range(G):
                wcur_ref[g] = wcap

        c = jnp.minimum(pid, 2 * n_chunks - 1 - pid)
        t0 = c * CHUNK_T

        def put(stream_ref, g_row0, pos, mask_k1, vals_k1, arow):
            """Scatter vals at positions `pos` (all within [arow*128,
            arow*128 + 256) for masked lanes) into a 2-row window.
            mask_k1: (K, 1) int32 0/1 (Mosaic can't reshape i1 vectors)."""
            o = pos - (arow << 7)  # (K, 1)
            win = stream_ref[pl.ds(g_row0 + arow, 2), :]  # (2, K) i32
            mk = mask_k1 != 0
            p0 = ((o == lane_i) & mk).astype(jnp.float32)
            p1 = ((o - K == lane_i) & mk).astype(jnp.float32)
            vf = vals_k1.astype(jnp.float32).reshape(1, K)
            mf = mask_k1.astype(jnp.float32).reshape(1, K)
            c0 = jnp.dot(vf, p0, **hp)
            t0_ = jnp.dot(mf, p0, **hp)
            c1 = jnp.dot(vf, p1, **hp)
            t1_ = jnp.dot(mf, p1, **hp)
            new0 = jnp.where(t0_ > 0.5, c0.astype(jnp.int32), win[0:1, :])
            new1 = jnp.where(t1_ > 0.5, c1.astype(jnp.int32), win[1:2, :])
            stream_ref[pl.ds(g_row0 + arow, 2), :] = jnp.concatenate(
                [new0, new1], 0
            )

        def row_meta(g, t):
            idx = idx_ref[t * G + g, :].reshape(K, 1)
            sym = sym_ref[t * G + g, :].reshape(K, 1)
            onehot = (idx == row_i).astype(jnp.float32)  # (K, R)
            rlen = jnp.dot(onehot, lens_ref[:], **hp)  # (K, 1)
            roff = jnp.dot(onehot, offs_ref[:], **hp)  # (K, 1)
            s = sym.astype(jnp.float32) - roff  # exact: |sym| < 2^24
            esc = (s < 0.0) | (s >= rlen - 2.0)
            return idx, sym, onehot, rlen, roff, s, esc

        def row_side(g, t):
            """Phase A: forward escape compaction into the side channel."""
            _, sym, _, _, _, _, esc = row_meta(g, t)
            ef = esc.astype(jnp.float32).reshape(1, K)
            n_esc = jnp.sum(ef).astype(jnp.int32)
            rank = jnp.dot(ef, tri, **hp).astype(jnp.int32).reshape(K, 1)
            base = scur_ref[g]

            @pl.when(base <= (scap_rows - 2) * K)
            def _write():
                put(side_ref, g * scap_rows, base + rank,
                    esc.astype(jnp.int32), sym, base >> 7)

            @pl.when(base + n_esc > (scap_rows - 2) * K)
            def _flag():
                ovf_ref[g] = 1

            # escape values ride an f32 one-hot scatter, exact only below
            # 2^24 — flag larger magnitudes so the segment re-encodes on
            # the host (which stores them exactly)
            big = jnp.sum(
                (esc & (jnp.abs(sym) >= (1 << 24))).astype(jnp.float32)
            )
            @pl.when(big > 0.0)
            def _flag_big():
                ovf_ref[g] = 1

            scur_ref[g] = base + n_esc

        def row_words(g, t):
            """Phase B: one reverse rANS step for all K lanes."""
            _, sym, onehot, rlen, roff, s, esc = row_meta(g, t)
            rows = jnp.dot(onehot, cdf_ref[:], **hp)  # (K, W)
            s_eff = jnp.where(esc, rlen - 2.0, s).astype(jnp.int32)
            cum = jnp.sum(
                jnp.where(col_i == s_eff, rows, 0.0), axis=1, keepdims=True
            )
            nxt = jnp.sum(
                jnp.where(col_i == s_eff + 1, rows, 0.0),
                axis=1, keepdims=True,
            )
            freq = (
                (nxt - cum).astype(jnp.int32).astype(jnp.uint32)
            ).reshape(1, K)
            cum_u = cum.astype(jnp.int32).astype(jnp.uint32).reshape(1, K)

            state = st_ref[g : g + 1, :]  # (1, K) uint32
            m = state >= (freq << PRECISION)
            mf = m.astype(jnp.float32)
            n_emit = jnp.sum(mf).astype(jnp.int32)
            rank = jnp.dot(mf, tri, **hp).astype(jnp.int32).reshape(K, 1)
            low16 = (state & 0xFFFF).astype(jnp.int32).reshape(K, 1)
            base = wcur_ref[g]
            pos = (base - n_emit) + rank  # lane-asc within the row
            arow = jnp.maximum(base - K, 0) >> 7
            mi = m.astype(jnp.int32).reshape(K, 1)
            put(words_ref, g * wcap_rows, pos, mi, low16, arow)
            wcur_ref[g] = base - n_emit
            state = jnp.where(m, state >> PRECISION, state)

            # q = state // freq: f32 quotient +/-1, exact uint32 fix-up
            sf = (
                (state >> 16).astype(jnp.int32).astype(jnp.float32) * 65536.0
                + (state & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
            )
            ff = freq.astype(jnp.int32).astype(jnp.float32)
            q = jnp.floor(sf / ff).astype(jnp.int32).astype(jnp.uint32)
            prod = q * freq
            q = jnp.where(prod > state, q - 1, q)
            prod = q * freq
            q = jnp.where(prod + freq <= state, q + 1, q)
            r = state - q * freq
            st_ref[g : g + 1, :] = (q << PRECISION) + cum_u + r

        def step(j, _):
            # row fns index the CHUNK-LOCAL block row; guards use the
            # global row t0 + local
            @pl.when((pid < n_chunks) & (t0 + j < tg))
            def _fwd():
                for g in range(G):
                    row_side(g, j)

            jb = CHUNK_T - 1 - j

            @pl.when((pid >= n_chunks) & (t0 + jb < tg))
            def _bwd():
                for g in range(G):
                    row_words(g, jb)

            return 0

        jax.lax.fori_loop(0, CHUNK_T, step, 0)

        @pl.when(pid == 2 * n_chunks - 1)
        def _fin():
            states_ref[:] = st_ref[:]
            for g in range(G):
                wc = wcap - wcur_ref[g]
                row = jnp.where(
                    col128 == 0, wc,
                    jnp.where(col128 == 1, scur_ref[g],
                              jnp.where(col128 == 2, ovf_ref[g], 0)),
                )
                counts_ref[g, :] = row.reshape(128).astype(jnp.int32)

    blk = lambda i: (jnp.minimum(i, 2 * n_chunks - 1 - i), 0)  # noqa: E731
    fn = pl.pallas_call(
        kernel,
        grid=(2 * n_chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK_T * G, K), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_T * G, K), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G * wcap_rows, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * scap_rows, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * wcap_rows, K), jnp.int32),
            jax.ShapeDtypeStruct((G * scap_rows, K), jnp.int32),
            jax.ShapeDtypeStruct((G, K), jnp.uint32),
            jax.ShapeDtypeStruct((G, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((GROUPS,), jnp.int32),     # word cursors
            pltpu.SMEM((GROUPS,), jnp.int32),     # side cursors
            pltpu.SMEM((GROUPS,), jnp.int32),     # side overflow flags
            pltpu.VMEM((GROUPS, K), jnp.uint32),  # lane states
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def encode_caps(n: int):
    """(tg, wcap_rows, scap_rows) for an n-symbol segment. wcap_rows has
    one pad row so the 2-row scatter window at a full cursor stays inside
    the group's region; scap_rows bounds the side channel at ~1/8 escape
    rate (overflow -> counts flag -> caller falls back to the host
    encoder)."""
    rows = (n + K - 1) // K
    tg = max((rows + GROUPS - 1) // GROUPS, 1)
    return tg, tg + 1, max(tg // 8, 2) + 4


def lane_encode_device(sym_dev, idx_dev, cdf_dev, lens_dev, offs_dev,
                       n: int, pad_sym: int, interpret: bool = False):
    """Encode an n-symbol segment ON DEVICE (jit-friendly). sym/idx: any
    shape, flattened C-order. Returns (words (G*wcap_rows, K) i32 — one
    uint16 word per cell, each group's words backward-filled so its last
    `word_counts[g]` cells are the stream; side (G*scap_rows, K) i32,
    forward-filled; states (G, K) u32; counts (G, 128) i32 with per-group
    [word_count, side_count, side_overflow] in columns 0..2). `pad_sym`
    must be the host tables' offsets[0] so padding encodes exactly like
    the host encoder's."""
    import jax.numpy as jnp

    tg, wcap_rows, scap_rows = encode_caps(n)
    total = GROUPS * tg * K

    def prep(a, fill):
        a = a.reshape(-1).astype(jnp.int32)
        a = jnp.pad(a, (0, total - n), constant_values=fill)
        a = jnp.transpose(
            a.reshape(GROUPS, tg, K), (1, 0, 2)
        ).reshape(tg * GROUPS, K)
        n_chunks = (tg + CHUNK_T - 1) // CHUNK_T
        return jnp.pad(
            a, ((0, (n_chunks * CHUNK_T - tg) * GROUPS), (0, 0))
        )

    fn = _encode_kernel(
        tg, wcap_rows, scap_rows,
        cdf_dev.shape[0], cdf_dev.shape[1], interpret,
    )
    return fn(prep(sym_dev, pad_sym), prep(idx_dev, 0),
              cdf_dev, lens_dev, offs_dev)


def assemble_device_stream(words_np, side_np, states_np, counts_np,
                           n: int) -> LaneStream:
    """Host-side: kernel outputs (as numpy) -> a LaneStream identical to
    lane_encode's."""
    tg, wcap_rows, scap_rows = encode_caps(n)
    words, side = [], []
    for g in range(GROUPS):
        wc = int(counts_np[g, 0])
        sc = int(counts_np[g, 1])
        wflat = words_np[g * wcap_rows: g * wcap_rows + tg].reshape(-1)
        words.append(wflat[tg * K - wc:].astype(np.uint16))
        sflat = side_np[g * scap_rows: (g + 1) * scap_rows].reshape(-1)
        side.append(sflat[:sc].astype(np.int32))
    return LaneStream(
        np.concatenate(words),
        np.asarray([w.size for w in words], np.int64),
        np.ascontiguousarray(states_np.astype(np.uint32)),
        np.concatenate(side) if side else np.empty(0, np.int32),
        np.asarray([s.size for s in side], np.int64),
        n,
    )


def assemble_from_tails(words_tail, side_tail, states_np, counts_np,
                        n: int) -> LaneStream:
    """Like assemble_device_stream but from BUCKETED tail slices: the
    caller transferred only the last `wb` word rows (per group, ending at
    row tg) and the first `sb` side rows. words_tail: (G, wb, K) i32;
    side_tail: (G, sb, K) i32."""
    words, side = [], []
    wb = words_tail.shape[1]
    for g in range(GROUPS):
        wc = int(counts_np[g, 0])
        sc = int(counts_np[g, 1])
        wflat = words_tail[g].reshape(-1)
        words.append(wflat[wb * K - wc:].astype(np.uint16))
        side.append(side_tail[g].reshape(-1)[:sc].astype(np.int32))
    return LaneStream(
        np.concatenate(words),
        np.asarray([w.size for w in words], np.int64),
        np.ascontiguousarray(states_np.astype(np.uint32)),
        np.concatenate(side) if side else np.empty(0, np.int32),
        np.asarray([s.size for s in side], np.int64),
        n,
    )


def lane_decode(stream: LaneStream, indexes, tables: LaneTables,
                interpret: bool = False):
    """Device decoder from a host-side LaneStream (uploads the banks, then
    runs the chunked kernel). `interpret=True` uses the Pallas
    interpreter (CPU CI)."""
    import jax.numpy as jnp

    wr = words_rows_for(stream.word_counts.max() if len(stream.word_counts) else 0)
    sr = side_rows_for(stream.side_counts.max() if len(stream.side_counts) else 0)
    words_dev = jnp.asarray(pack_word_banks(stream, wr))
    side_dev = jnp.asarray(pad_side_banks(stream, sr))
    states_dev = jnp.asarray(stream.states)
    cdf_dev, lens_dev, offs_dev = device_tables(tables)
    idx_dev = jnp.asarray(np.asarray(indexes, np.int32).reshape(-1))
    return lane_decode_device(
        idx_dev, words_dev, side_dev, states_dev,
        cdf_dev, lens_dev, offs_dev, stream.n, interpret=interpret,
    )
