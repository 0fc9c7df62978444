"""TPU-native interleaved rANS ("lane coder"): 128 parallel rANS32 lanes
sharing one word stream, decodable ON DEVICE as a single Pallas kernel.

Why: the host coder forces a device->host transfer of indexes and a
host->device transfer of decoded symbols for every channel-AR slice
(`models/codec.py`); through a tunneled link those transfers dominate
decode (PERF.md). A device decoder shrinks the traffic to the actual
bitstream bytes and removes the host from the loop.

Format (ours — the stream layout is framework-defined; reference parity is
at the symbol/CDF level, not the bitstream level):
  * K=128 lanes, each a 16-bit-renormalizing rANS32 (state in [2^16,2^32),
    <=1 word in/out per symbol step — same arithmetic family as the vendored
    core the reference builds on, `third_party/ryg_rans/rans64.h:14-60`).
  * symbol i belongs to lane i%K; step t decodes symbols [tK, tK+K).
  * one shared uint16 word stream: the encoder runs in reverse and emits so
    the forward decoder consumes words in (step, lane) order — Giesen's
    interleaved-rANS discipline.
  * out-of-range values escape to a raw int32 side channel (the reference
    escapes into in-stream 4-bit bypass chunks, `rans_interface.cpp:137-162`;
    a side channel keeps the device decode loop branch-free).

The Pallas kernel is gather-free: the only data-dependent reads are
scalar-base dynamic slices (word/side windows); per-lane word selection is
a rank/one-hot contraction, and per-lane CDF rows come from a one-hot
matmul against the table (rows, width) — all VPU/MXU ops.
"""

from typing import NamedTuple, Tuple

import numpy as np

K = 128  # lanes
RANS_L = 1 << 16  # renormalization lower bound = 2^precision
PRECISION = 16
SENTINEL = 1 << 20  # table padding: never <= a 16-bit slot


class LaneTables(NamedTuple):
    """Device-layout CDF tables: rows padded with SENTINEL to equal width."""

    cdf: np.ndarray      # (R, W) int32, row r valid through lengths[r]
    lengths: np.ndarray  # (R,) int32 (== pmf_len + 2, escape slot included)
    offsets: np.ndarray  # (R,) int32


def make_lane_tables(cdf, cdf_lengths, offsets) -> LaneTables:
    cdf = np.asarray(cdf, np.int64)
    lengths = np.asarray(cdf_lengths, np.int32).reshape(-1)
    offsets = np.asarray(offsets, np.int32).reshape(-1)
    out = np.full(cdf.shape, SENTINEL, np.int32)
    for r in range(cdf.shape[0]):
        out[r, : lengths[r]] = cdf[r, : lengths[r]]
    return LaneTables(out, lengths, offsets)


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


def lane_encode(
    symbols, indexes, tables: LaneTables
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Host-side encoder. Returns (words uint16, init_states uint32,
    side int32, n) where `init_states` are the decoder's starting states
    and `side` holds escaped raw values in forward stream order."""
    symbols = np.asarray(symbols, np.int32).reshape(-1)
    indexes = np.asarray(indexes, np.int32).reshape(-1)
    n = symbols.size
    pad = (-n) % K
    if pad:
        symbols = np.concatenate(
            [symbols, np.full(pad, tables.offsets[0], np.int32)]
        )
        indexes = np.concatenate([indexes, np.zeros(pad, np.int32)])
    T = symbols.size // K

    _, cum, freq, esc = _sym_cum_freq(symbols, indexes, tables)
    side = symbols[esc & (np.arange(symbols.size) < n)].astype(np.int32)
    # padding symbols use row 0 slot 0 which is always in range
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
    return words, state.astype(np.uint32), side, n


def lane_decode_reference(
    words, init_states, side, indexes, tables: LaneTables, n: int
) -> np.ndarray:
    """Pure-NumPy forward decoder — the oracle the Pallas kernel must match."""
    indexes = np.asarray(indexes, np.int64).reshape(-1)
    pad = (-n) % K
    if pad:
        indexes = np.concatenate([indexes, np.zeros(pad, np.int64)])
    T = indexes.size // K
    idx2 = indexes.reshape(T, K)
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
    return out.reshape(-1)[:n]


def lane_decode(
    words, init_states, side, indexes, tables: LaneTables, n: int,
    interpret: bool = False,
):
    """Device decoder: one Pallas program decodes the whole stream.

    All inputs are host arrays or device arrays; returns a device (n,)
    int32 array of symbol values. `interpret=True` runs the kernel in the
    Pallas interpreter (CPU CI).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pad = (-n) % K
    N = n + pad
    T = N // K
    indexes = np.asarray(indexes, np.int32).reshape(-1)
    if pad:
        indexes = np.concatenate([indexes, np.zeros(pad, np.int32)])
    idx2 = jnp.asarray(indexes.reshape(T, K))

    def rows_of(arr):
        """1-D stream -> (rows, 128) int32, padded with 2 extra rows so the
        2-row window at the final (row-aligned) base stays in bounds.
        Row-aligned 2-row windows avoid dynamic lane-dim slicing (a Mosaic
        weak spot); the in-window pick is a one-hot contraction."""
        arr = np.asarray(arr, np.int64).astype(np.int32)
        rows = (arr.size + K - 1) // K + 2
        out = np.zeros(rows * K, np.int32)
        out[: arr.size] = arr
        return jnp.asarray(out.reshape(rows, K))

    words2 = rows_of(np.asarray(words, np.uint16))
    side2 = rows_of(side)
    states0 = jnp.asarray(np.asarray(init_states, np.uint32))

    cdf = jnp.asarray(tables.cdf.astype(np.float32))  # values < 2^20: exact
    lens = jnp.asarray(tables.lengths.astype(np.float32).reshape(-1, 1))
    offs = jnp.asarray(tables.offsets.astype(np.float32).reshape(-1, 1))
    R = cdf.shape[0]

    def kernel(idx_ref, words_ref, side_ref, states_ref, cdf_ref, lens_ref,
               offs_ref, out_ref, base_ref, sbase_ref, st_ref):
        st_ref[:] = states_ref[:]
        base_ref[0] = 0
        sbase_ref[0] = 0

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)
        # exclusive-prefix-sum matrix: rank = m @ tri (gather-free cumsum)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        ).astype(jnp.float32)

        def pick_window(stream_ref, base, rank_f, mask_k1):
            """Lanes read stream[base + rank] (rank < K) without gathers:
            load the 2 aligned rows covering [base, base+2K), then one-hot
            select by in-window position."""
            arow = base >> 7
            off = (base & (K - 1)).astype(jnp.float32)
            win = stream_ref[pl.ds(arow, 2), :].astype(jnp.float32)  # (2,K)
            pos = off + rank_f  # (K,1) in [0, 2K)
            lane_f = lane_i[:1, :].astype(jnp.float32)  # (1,K)
            p0 = (pos == lane_f) & mask_k1
            p1 = (pos - K == lane_f) & mask_k1
            return jnp.sum(
                jnp.where(p0, win[0:1, :], 0.0)
                + jnp.where(p1, win[1:2, :], 0.0),
                axis=1,
            )  # (K,)

        def step(t, _):
            state = st_ref[:]  # (1, K) uint32
            idx = idx_ref[t, :].reshape(K, 1)  # (K, 1) int32

            onehot = (idx == row_i).astype(jnp.float32)  # (K, R)
            rows = jnp.dot(
                onehot, cdf_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            )  # (K, W)
            rlen = jnp.dot(
                onehot, lens_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            )  # (K, 1)
            roff = jnp.dot(
                onehot, offs_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            )  # (K, 1)

            slot = (
                (state & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
            ).reshape(K, 1)  # two-step cast: Mosaic lacks uint32<->f32
            le = rows <= slot  # (K, W); SENTINEL pads are never <=
            s = jnp.sum(
                le[:, 1:].astype(jnp.float32), axis=1, keepdims=True
            )  # (K, 1): count of cdf[j] <= slot, j >= 1
            cum = jnp.max(jnp.where(le, rows, -1.0), axis=1, keepdims=True)
            nxt = jnp.min(
                jnp.where(le, float(SENTINEL), rows), axis=1, keepdims=True
            )
            freq = (nxt - cum).astype(jnp.int32).astype(jnp.uint32).reshape(1, K)
            cum_u = cum.astype(jnp.int32).astype(jnp.uint32).reshape(1, K)
            slot_u = state & 0xFFFF

            state = freq * (state >> PRECISION) + (slot_u - cum_u)

            # renormalize: lanes below L consume one word each, in lane order
            m = state < RANS_L  # (1, K)
            mf = m.astype(jnp.float32)
            rank = jnp.dot(mf, tri, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            w = pick_window(
                words_ref, base_ref[0], rank.reshape(K, 1), m.reshape(K, 1)
            ).reshape(1, K).astype(jnp.int32).astype(jnp.uint32)
            state = jnp.where(m, (state << PRECISION) | w, state)
            st_ref[:] = state
            base_ref[0] = base_ref[0] + jnp.sum(mf).astype(jnp.int32)

            # escapes take raw values from the side channel, in lane order
            # (escape slot index is len-2; s never exceeds it)
            esc = s.reshape(1, K) >= rlen.reshape(1, K) - 2.5
            ef = esc.astype(jnp.float32)
            erank = jnp.dot(ef, tri, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            sval = pick_window(
                side_ref, sbase_ref[0], erank.reshape(K, 1),
                esc.reshape(K, 1),
            ).reshape(1, K)
            sbase_ref[0] = sbase_ref[0] + jnp.sum(ef).astype(jnp.int32)

            vals = (s + roff).reshape(1, K)
            vals = jnp.where(esc, sval, vals).astype(jnp.int32)
            out_ref[t, :] = vals.reshape(K)
            return 0

        jax.lax.fori_loop(0, T, step, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, K), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # idx (T, K)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # words (rows, K)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # side (rows, K)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # init states (1, K)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cdf (R, W)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lengths (R, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # offsets (R, 1)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, K), jnp.uint32),
        ],
        interpret=interpret,
    )(idx2, words2, side2, states0.reshape(1, K), cdf, lens, offs)
    return out.reshape(-1)[:n]
