"""Host-side codec runner: real bitstream compress/decompress.

Splits the work the TPU-native way:
  * device (jit): transforms, context models, quantization, scale-table
    indexes
  * host: rANS entropy coding (inherently sequential/branchy — wrong for the
    MXU, cheap on CPU), overlapped with device compute across images by the
    batched eval driver.

Correctness invariant — lockstep coding: the encoder drives the *same*
compiled per-slice programs the decoder will run (`decode_slice_indexes` /
`decode_slice_apply`), so every mu/scale/index is bit-identical on both
sides. This is required, not an optimization: the channel-AR design feeds
decoded slices back into the context transforms, and any float divergence
between encoder and decoder programs could flip a scale-table index and
desynchronize the rANS stream. (The reference gets this implicitly by
running the identical torch modules in compress() and decompress(),
`compressai/models/cnn.py:210-332`.)

Equivalent surface to the reference's `model.update()` / `model.compress()`
/ `model.decompress()` protocol.
"""

import functools
import struct
import warnings
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ans import host_coder_classes
from ..entropy import (
    EntropyBottleneckCoder,
    GaussianConditionalCoder,
    build_eb_tables,
    build_gc_tables,
    get_scale_table,
)


def _bucket(rows: int, minimum: int = 8) -> int:
    """Round a row count up to a power of two: quantizes the lane-decoder
    stream-buffer shapes so content-length jitter doesn't recompile."""
    b = minimum
    while b < rows:
        b <<= 1
    return b


_HASH_MUL = np.uint64(2654435761)
_HASH_ADD = np.uint64(97531)

# Lane y-stream codec header (u32, ahead of the per-segment idx hashes):
# upper 24 bits magic, low byte flags. Bit 0 marks a stream whose scale
# indexes were derived by the FUSED encode program (the lockstep anchor is
# that executable, not the per-slice walk) — decoders must verify their
# own derived indexes against the stream hashes before trusting a decode.
_LANE_HEADER_MAGIC = 0x4C414E00
_LANE_FLAG_FUSED_ENC = 0x01


class _LaneSideOverflow(Exception):
    """A fused-encode segment overflowed its escape side channel (or hit a
    >=2^24 escape value); the caller retries with the per-slice walk."""


def _idx_hash_host(idx_np: np.ndarray) -> int:
    """Position-weighted hash of a scale-index array, mod 2^32. The device
    twin (`_idx_hash_dev`) computes the identical value: uint32 products
    and sums wrap mod 2^32 on both sides, and addition mod 2^32 is
    associative so the reduction order doesn't matter."""
    flat = np.ascontiguousarray(idx_np).reshape(-1).astype(np.uint64)
    i = np.arange(flat.size, dtype=np.uint64)
    w = (i * _HASH_MUL + _HASH_ADD) & np.uint64(0xFFFFFFFF)
    return int(np.sum(flat * w, dtype=np.uint64) & np.uint64(0xFFFFFFFF))


def _idx_hash_dev(idx):
    flat = idx.reshape(-1).astype(jnp.uint32)
    i = jax.lax.iota(jnp.uint32, flat.size)
    w = i * jnp.uint32(2654435761) + jnp.uint32(97531)
    return jnp.sum(flat * w, dtype=jnp.uint32)


def _unpack12(packed_np: np.ndarray, n: int):
    """Host inverse of the codec's 12-bit (q, idx) drain packing: a
    (1.5*ceil2(n),) uint8 buffer -> (symbols int32, indexes uint8).

    Layout (built in `quantize_packed` on device): v = (q+32)<<6 | idx as
    12-bit values; low bytes for all ceil2(n) padded symbols first, then
    the 4-bit high parts packed two per byte (even symbol in the low
    nibble)."""
    m = n + (n & 1)
    lo = packed_np[:m].astype(np.uint16)
    hib = packed_np[m : m + m // 2]
    hi = np.empty(m, np.uint16)
    hi[0::2] = hib & 0xF
    hi[1::2] = hib >> 4
    v = lo | (hi << 8)
    v = v[:n]
    sym = (v >> 6).astype(np.int32) - 32
    idx = (v & 63).astype(np.uint8)
    return sym, idx


def _z_quantize_math(z, medians):
    """Traced z quantization, shared by the per-slice path
    (`Codec._z_quantize`) and the fused encode program. Bit-exact with the
    host path: bf16 z casts to f32 first (exact), round is half-to-even
    like np.rint, and z_hat = symbols + medians in f32 — the same ops the
    decoder performs on the same values."""
    z32 = z.astype(jnp.float32)
    sym32 = jnp.round(z32 - medians).astype(jnp.int32)
    sym8 = jnp.clip(sym32, -128, 127).astype(jnp.int8)
    overflow = jnp.any(sym32 != sym8.astype(jnp.int32))
    z_hat = sym32.astype(jnp.float32) + medians
    return sym32, sym8, overflow, z_hat


def _traced_walk(model, params, lm, ls, table, idx_dtype, get_symbols,
                 need_y_hat=True, pin=None):
    """The channel-AR chain traced into BOTH fused executables: the fused
    DECODE program and the fused ENCODE program call this one function, so
    their derived mu/scale/idx math cannot drift apart (CLAUDE.md lockstep
    invariant — the per-slice walk is the other, deliberately separate,
    executable pair). `get_symbols(i, mu, idx_q)` supplies slice i's int32
    symbols: the decode side runs the lane kernel on the stream banks, the
    encode side quantizes y and records the kernel's output banks. Returns
    (y_hat_slices, per-slice idx hashes); `need_y_hat=False` skips the
    final slice's dequantize+lrp apply (the encoder never consumes it).

    Every slice-boundary value is pinned with `lax.optimization_barrier`:
    sharing the trace is NOT enough for cross-program bit-exactness —
    XLA fuses each executable globally, and the different surroundings
    (encode kernels + quantize vs decode kernels + synthesis) change how
    the shared chain's bf16 matmuls tile/fuse, which was measured to flip
    scale-table indexes from the first multi-slice-support slice onward
    (TPU, bf16, WACNN slice 3+). The barriers carve the float chain into
    identical isolated islands — same HLO subgraph, barriered inputs and
    outputs — so the two programs compile the walk identically. Integer
    values (symbols, hashes) are exact regardless and need no pinning,
    but `rv` is barriered anyway to keep each island's *producers* from
    fusing into it asymmetrically.

    `pin` (optional; used by the fused DECODE twin and the SPLIT fused
    encode tier) additionally routes every island operand through
    `lane_coder.layout_pin` — a bit-exact Pallas identity copy that
    forces the operand into a canonical buffer layout. Barriers alone
    are layout-transparent: XLA's layout assignment reaches through
    them, and the decode twin's different surroundings (its `rv` is an
    in-program kernel output, its y_hats are program outputs) gave its
    islands differently-laid-out operands, which re-tiled the bf16
    matmuls and flipped scale indexes at pipeline>1 bench shapes.

    The FULL-fusion encode twin takes NO pin — this is measured, not
    principled (r3+r4, TPU): unpinned it is bit-aligned with the
    per-slice anchor for the WACNN family at every pipeline; adding the
    decode twin's pins FLIPPED its slice-5 indexes, and pins did not
    rescue the Swin family either (its fully-fused walk diverges either
    way; Swin ships the "split" tier, whose walk program takes lm/ls/y
    as real program inputs and matches with pins, like the decode
    twin). Island alignment across differently-surrounded executables
    is config-dependent — which is why every first stream is
    self-checked and demoted full -> split -> per-slice on mismatch."""
    ob = jax.lax.optimization_barrier
    p = pin if pin is not None else (lambda a: a)
    S = model.num_slices
    k_supp = model.max_support_slices
    y_hat_slices: List = []
    hashes: List = []

    def support():
        return tuple(y_hat_slices if k_supp < 0 else y_hat_slices[:k_supp])

    lm, ls = ob((lm, ls))
    lm, ls = p(lm), p(ls)
    mu, idx = ob(model.apply(
        {"params": params}, 0, lm, ls, (), table,
        method="decode_slice_indexes",
    ))
    mu = p(mu)
    for i in range(S):
        idx_q = idx.astype(idx_dtype)
        hashes.append(_idx_hash_dev(idx_q))
        rv = p(ob(get_symbols(i, mu, idx_q)))
        if i < S - 1:
            y_prev, mu, idx = ob(model.apply(
                {"params": params}, i + 1, lm, ls, support(), mu, rv,
                table, method="decode_slice_fused",
            ))
            mu = p(mu)
            y_hat_slices.append(p(y_prev))
        elif need_y_hat:
            y_hat_slices.append(
                model.apply(
                    {"params": params}, S - 1, lm, support(), mu, rv,
                    method="decode_slice_apply",
                )
            )
    return y_hat_slices, hashes


class Codec:
    """Wraps (model, params) with CDF tables and jitted coding-path fns.

    `pipeline` > 1 splits a multi-image batch into that many sub-batches
    whose channel-AR walks interleave: while one sub-batch's decoded
    symbols cross the host boundary and run through rANS, the others'
    device programs and transfers are in flight. Host-coder y-streams are
    PER IMAGE (each image's slices in 0..S-1 order), so the host stream
    layout is independent of `pipeline` and of the batch it was encoded
    in. The LANE stream keeps (slice, sub-batch) segments — decoding it
    requires the same `pipeline` value (part of the stream layout, like
    `num_slices`).
    """

    def __init__(
        self,
        model,
        params,
        scale_table: Optional[np.ndarray] = None,
        pipeline: int = 1,
        dtype=None,
        coder: str = "host",
        device_encode: bool = False,
        fused_encode: bool = False,
        fused_verify: bool = True,
        pack_drain: Optional[bool] = None,
        analyze_chunks: int = 1,
        synth_chunks: int = 1,
    ):
        """`coder` picks the y-latent entropy backend:
          * "host" — reference-contract rANS on the CPU (default); indexes
            cross device->host and symbols host->device every slice.
          * "lane" — TPU-resident interleaved lane-rANS (`ans/lane_coder`):
            the bitstream uploads once and a Pallas kernel decodes each
            slice on device, so the decode walk never touches the host.
            Its stream layout is framework-defined (not interoperable with
            "host" streams); lockstep safety is unchanged because both
            sides still run the same compiled `decode_slice_*` programs —
            only the source of the symbol tensor differs.
        The z-latent always uses the host factorized coder (one small
        stream, no AR dependency).

        `fused_encode` accepts False / True / "split": True fuses the
        entire encode (analyze -> hyper -> walk -> encode kernels) into
        ONE program; "split" keeps analyze/z/hyper as the standalone
        per-slice executables and fuses only the walk+encode (the tier a
        failed full-fusion self-check automatically demotes to — the
        Swin family's fully-fused walk diverges from the decoders on
        TPU, PERF.md round 4, so its bench config starts there).
        """
        if coder not in ("host", "lane"):
            raise ValueError(f"unknown entropy coder {coder!r}")
        self.coder = coder
        # device_encode=True runs the per-slice ENCODER on device too
        # (Pallas reverse-rANS kernel fused into the quantize program):
        # symbols and indexes never cross to the host, only the compressed
        # stream does (~bpp/8 bytes/symbol instead of the 2 B/symbol
        # q8+idx drain). Bit-exact with the host lane encoder (tests);
        # per-segment side-channel overflow falls back to the host encoder
        # transparently. DEFAULT OFF: the drain is async DMA that overlaps
        # the walk, while the kernel adds ~0.05 s/slice of *serial* device
        # compute — measured 2.61 s vs 1.90 s encode on the bench batch
        # (PERF.md). Turn on to offload entropy coding from host CPUs
        # (serving farms) or when the host link is the bottleneck.
        self.device_encode = bool(device_encode)
        # fused_encode=True (lane only) runs the ENTIRE encode walk —
        # hyper-conditioned slice transforms, quantization, and the
        # reverse-rANS encode kernels — as ONE jitted program: ~2 program
        # dispatches per slice collapse into 1 total, and only
        # stream-sized bytes cross device->host (the walk is
        # dispatch-latency-bound through a tunneled link, PERF.md). The
        # lockstep anchor moves to the fused executable: streams carry the
        # _LANE_FLAG_FUSED_ENC header bit and every decoder path verifies
        # its derived scale indexes against the stream's hashes (the fused
        # decoder already did; the per-slice fallback then does too) and
        # fails loudly on mismatch instead of desyncing. Escape-channel
        # overflow (or a huge batch) transparently retries with the
        # per-slice anchor.
        self.fused_encode = bool(fused_encode) and coder == "lane"
        # "full" = whole encode in one program; "split" = canonical
        # standalone analyze/hyper + one walk+encode program (the tier a
        # failed full-fusion self-check demotes to; constructor-selectable
        # so a family known to need it — Swin, PERF.md r4 — skips the
        # first-stream detour)
        self._fused_mode = (
            "split" if str(fused_encode) == "split" else "full"
        )
        # fused_verify=True (default) decode-checks the FIRST fused-encoded
        # stream of each compiled configuration before compress() returns
        # it: the fused encode twin is a different XLA executable than both
        # decoders, and a layout/tiling divergence can make it emit streams
        # NO decoder reproduces (observed: the Swin flagship at pipeline=2,
        # PERF.md round 3) — without this check that is only discovered at
        # decompress time, when the original image may be gone. On
        # mismatch compress() warns, permanently drops to the per-slice
        # encode anchor, and re-encodes. One extra decompress per
        # (shape, sub-batching) config; later calls skip it. The decode-
        # side hash guard stays on regardless (this check is a strong
        # canary, not a proof — index flips are data-dependent).
        self.fused_verify = bool(fused_verify)
        # lane decompress runs the ENTIRE walk (hyper -> S slices x decode
        # kernel -> synthesis) as ONE jitted program — one dispatch instead
        # of ~2 per slice. Correctness: the fused program is a different
        # XLA executable than the encoder's per-slice programs, so its
        # float-derived scale indexes are not a-priori bit-guaranteed; the
        # stream carries a hash of each slice's encoder-side indexes, the
        # fused program emits its own, and any mismatch falls back to the
        # per-slice walk that shares executables with the encoder
        # (lockstep-exact by construction). Set False to always use the
        # per-slice walk.
        self.fused = True
        self.model = model
        self.pipeline = max(int(pipeline), 1)
        self.scale_table = (
            np.asarray(scale_table, np.float32)
            if scale_table is not None
            else get_scale_table()
        )
        if dtype is not None and dtype != jnp.float32:
            # TPU-native half precision: transforms run in bf16 (MXU-native),
            # while the entropy bottleneck stays f32 so the z medians /
            # quantiles that parameterize the CDF tables are exact. RD guard:
            # tests/test_bf16_codec.py. Lockstep safety is structural —
            # encoder and decoder run the same compiled programs either way.
            def cast(path, a):
                if path[0].key == "entropy_bottleneck":
                    return a
                a = jnp.asarray(a)
                return (
                    a.astype(dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating)
                    else a
                )

            params = jax.tree_util.tree_map_with_path(cast, params)
        self.params = params
        self._pack_drain_arg = pack_drain
        # pin the HOST entropy backend (rans/rangecoder) for this codec's
        # lifetime — resolved ONCE here, never re-read from the global
        # registry: a registry flip between compress and decompress (or
        # across an update()) would decode one backend's bytes with the
        # other's bit layer and return garbage symbols silently
        from ..ans import resolve_host_backend

        self.host_backend = resolve_host_backend()
        self.update()

        # compute dtype follows the params (bf16 params -> bf16 transforms)
        self.dtype = (
            dtype
            if dtype is not None
            else jax.tree_util.tree_leaves(params)[0].dtype
        )

        # `analyze_chunks`/`synth_chunks` > 1 run the batch through the
        # transform in that many sequential sub-batches INSIDE one jitted
        # program (lax.map): peak activation memory shrinks ~chunks-fold
        # while the rest of the coding path (walk, entropy, dispatches)
        # stays a single full-batch program. This is how the Swin flagship
        # fits batch-24 Kodak eval in 16 GB HBM without splitting the whole
        # codec walk in two (the analyze alone needs 16.24 GB at batch 24,
        # PERF.md).
        self.analyze_chunks = max(int(analyze_chunks), 1)
        self.synth_chunks = max(int(synth_chunks), 1)

        def chunked_apply(p, arr, chunks, method):
            if chunks > 1 and arr.shape[0] % chunks == 0:
                parts = arr.reshape(
                    chunks, arr.shape[0] // chunks, *arr.shape[1:]
                )
                out = jax.lax.map(
                    lambda a: model.apply({"params": p}, a, method=method),
                    parts,
                )
                return jax.tree_util.tree_map(
                    lambda o: o.reshape(-1, *o.shape[2:]), out
                )
            return model.apply({"params": p}, arr, method=method)

        self._chunked_apply = chunked_apply

        def analyze(p, x):
            # accept native uint8 images: upload 1 byte/px and normalize on
            # device (4x less host->device traffic than f32)
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            return chunked_apply(
                p, x.astype(self.dtype), self.analyze_chunks, "analyze"
            )

        self._analyze = jax.jit(analyze)
        self._hyper = jax.jit(
            lambda p, z_hat, y_shape: model.apply(
                {"params": p}, z_hat, y_shape, method="hyper_synthesize"
            ),
            static_argnums=(2,),
        )
        self._slice_apply = jax.jit(
            lambda p, i, lm, support, mu, rv: model.apply(
                {"params": p}, i, lm, support, mu, rv,
                method="decode_slice_apply",
            ),
            static_argnums=(1,),
        )
        def quantize(y_slice, mu):
            # full-precision symbols feed the AR chain; an int8 copy rides
            # the (slow) device->host link for rANS, with an overflow flag
            # selecting the exact int32 copy in the rare out-of-range case
            q32 = jnp.round(y_slice - mu).astype(jnp.int32)
            q8 = jnp.clip(q32, -128, 127).astype(jnp.int8)
            overflow = jnp.any(q32 != q8.astype(jnp.int32))
            return q32, q8, overflow

        self._quantize = jax.jit(quantize)

        # Packed drain: the host entropy coder needs (q, idx) per symbol;
        # draining them as int8+uint8 costs 2 B/symbol *independent of the
        # operating point* (the drain carries symbol count, not stream
        # bytes — it dominated encode on link-bound setups, PERF.md). idx
        # needs 6 bits (64 scale levels) and trained q fits well inside
        # [-32, 31], so both pack into 12 bits = 1.5 B/symbol, built with
        # shift-ors in the quantize program and unpacked on the host
        # (`_unpack12`) before the byte-identical rANS encode. A slice
        # with any |q| > 31 falls back to the int8/int32 drain (flag
        # checked in one batched fetch after the walk). The flag itself is
        # derived in `_build_table_programs` (scale-table-dependent state,
        # re-derived by `update()`).

        def quantize_packed(y_slice, mu, idx):
            q32 = jnp.round(y_slice - mu).astype(jnp.int32)
            q8 = jnp.clip(q32, -128, 127).astype(jnp.int8)
            overflow = jnp.any(q32 != q8.astype(jnp.int32))
            qb = q32.reshape(-1) + 32
            fits = jnp.all((qb >= 0) & (qb < 64))
            v = (jnp.clip(qb, 0, 63) << 6) | idx.reshape(-1).astype(jnp.int32)
            n = v.shape[0]
            m = n + (n & 1)
            v = jnp.pad(v, (0, m - n))
            lo = (v & 0xFF).astype(jnp.uint8)
            hi = (v >> 8).reshape(-1, 2)
            hib = (hi[:, 0] | (hi[:, 1] << 4)).astype(jnp.uint8)
            packed = jnp.concatenate([lo, hib])
            return q32, packed, fits, q8, overflow

        self._quantize_packed = jax.jit(quantize_packed)
        # one fetch for a list of tiny device scalars: each bool(scalar)
        # is a blocking round trip (~30 ms through a tunneled link)
        self._stack_flags = jax.jit(lambda xs: jnp.stack(xs))

        # device-side z quantization: only ~1 byte/symbol crosses the
        # link for the factorized stream (vs the 4-byte float latent),
        # and z_hat never round-trips (math in `_z_quantize_math`, shared
        # with the fused encode program)
        self._z_quantize = jax.jit(_z_quantize_math)
        self._synth = jax.jit(
            lambda p, y_hat: chunked_apply(
                p, y_hat, self.synth_chunks, "synthesize"
            )
        )

    # -- table refresh (reference `update()`) --------------------------------

    def _build_table_programs(self):
        """(Re)build every piece of derived state that captures the scale
        table: the per-slice walk programs (which close over the table as
        a device constant), the index transfer dtype, and the packed-drain
        eligibility. Called from `update()` so `update(scale_table=...)` —
        the reference's table-sweep protocol — swaps the table atomically:
        a stale captured table would silently derive scale indexes from
        one table while coding against another's CDFs."""
        model = self.model
        # scale-table indexes fit in a byte (64 levels): cast before the
        # device->host transfer, which is the scarce resource in the walk
        idx_dtype = jnp.uint8 if len(self.scale_table) <= 255 else jnp.int32
        self._idx_dtype = idx_dtype
        table = jnp.asarray(self.scale_table)

        def slice_idx(p, i, lm, ls, support):
            mu, idx = model.apply(
                {"params": p}, i, lm, ls, support, table,
                method="decode_slice_indexes",
            )
            return mu, idx.astype(idx_dtype)

        def slice_fused(p, i, lm, ls, support, mu, rv):
            y_prev, mu, idx = model.apply(
                {"params": p}, i, lm, ls, support, mu, rv, table,
                method="decode_slice_fused",
            )
            return y_prev, mu, idx.astype(idx_dtype)

        self._slice_idx = jax.jit(slice_idx, static_argnums=(1,))
        self._slice_fused = jax.jit(slice_fused, static_argnums=(1,))

        self._pack_drain = (
            len(self.scale_table) <= 64
            if self._pack_drain_arg is None
            else bool(self._pack_drain_arg)
        )
        if self._pack_drain and len(self.scale_table) > 64:
            raise ValueError(
                "pack_drain=True requires a scale table of <= 64 levels "
                f"(idx must fit 6 bits; got {len(self.scale_table)}) — a "
                "wider table would bleed idx bits into the q field and "
                "silently corrupt host-coder streams"
            )

    def update(self, scale_table: Optional[np.ndarray] = None, force: bool = True):
        if scale_table is not None:
            self.scale_table = np.asarray(scale_table, np.float32)
        self._build_table_programs()
        # table rebuilds reuse the backend pinned in __init__ (see there)
        eb_params = self.params["entropy_bottleneck"]
        self.eb_coder = EntropyBottleneckCoder(
            build_eb_tables(eb_params),
            np.asarray(eb_params["quantiles"])[:, 0, 1],
            backend=self.host_backend,
        )
        self.gc_coder = GaussianConditionalCoder(
            build_gc_tables(self.scale_table), self.scale_table,
            backend=self.host_backend,
        )
        if self.coder == "lane":
            from ..ans import lane_coder as lc

            # device tables with each row's symbol window clamped to ±62:
            # W = 2*62+3 = 127 columns pads to exactly ONE 128-lane vector
            # register, so the kernel's per-row (K, W) table scans cost one
            # vreg op instead of three (±127 -> W=257 -> 3 vregs).
            # Out-of-window values ride the raw side channel; at trained
            # operating points |q| > 62 is rare enough that the side bytes
            # are noise next to the scan savings.
            self.lane_tables = lc.truncate_tables(
                *self.gc_coder.tables.astuple(), max_half=62
            )
            self._lane_dev_tables = lc.device_tables(self.lane_tables)
            self._lane_rv_cache: Dict = {}
            self._lane_fused_cache: Dict = {}

            self._dev_encode = self.device_encode
            pad_sym = int(self.lane_tables.offsets[0])
            interpret = jax.default_backend() != "tpu"

            def quantize_encode(y_slice, mu, idx, cdf, lens, offs):
                # identical quantization ops to self._quantize (the AR
                # chain consumes q32 either way)
                q32 = jnp.round(y_slice - mu).astype(jnp.int32)
                h = _idx_hash_dev(idx)
                n = int(np.prod(y_slice.shape))
                words, side, states, counts = lc.lane_encode_device(
                    q32, idx, cdf, lens, offs, n, pad_sym,
                    interpret=interpret,
                )
                return q32, words, side, states, counts, h

            self._quantize_encode = jax.jit(quantize_encode)
            self._stack_fn = jax.jit(
                lambda cs, hs: (jnp.stack(cs), jnp.stack(hs))
            )
            self._hash_fn = jax.jit(_idx_hash_dev)
            self._gather_cache: Dict = {}
        return True

    def _gather_fn(self, tg, wcap_rows, scap_rows, wb, sb, count):
        """Jitted bucketed tail-gather: `count` segments' resident kernel
        outputs -> stacked (count, G, wb/sb, K) arrays ready to transfer
        (only ~stream-sized bytes instead of the full capacity banks)."""
        from ..ans.lane_coder import GROUPS

        key = (tg, wcap_rows, scap_rows, wb, sb, count)
        fn = self._gather_cache.get(key)
        if fn is None:
            def gather(words_list, side_list, states_list):
                w = jnp.stack([
                    wr.reshape(GROUPS, wcap_rows, -1)[:, tg - wb: tg, :]
                    for wr in words_list
                ])
                s = jnp.stack([
                    sr.reshape(GROUPS, scap_rows, -1)[:, :sb, :]
                    for sr in side_list
                ])
                return w, s, jnp.stack(states_list)

            fn = jax.jit(gather)
            self._gather_cache[key] = fn
        return fn

    def _pending_symbols(self, pending) -> Dict:
        """Resolve host-coder (symbols, indexes) numpy arrays for the
        walk's "packed"/"host" pending entries. One batched fetch of all
        per-slice flags, then per-entry unpack — the bulk transfers were
        started asynchronously during the walk."""
        keys = [
            key for key in sorted(pending)
            if pending[key][0] in ("packed", "host")
        ]
        if not keys:
            return {}
        pairs: List = []
        for key in keys:
            ent = pending[key]
            if ent[0] == "packed":
                pairs += [ent[3], ent[5]]  # fits, overflow
            else:
                pairs += [False, ent[3]]   # overflow only
        flags = np.asarray(self._stack_flags(pairs))
        out: Dict = {}
        for j, key in enumerate(keys):
            ent = pending[key]
            fits, overflow = bool(flags[2 * j]), bool(flags[2 * j + 1])
            if ent[0] == "packed":
                _, q32, packed, _, q8, _, idx = ent
                if fits:
                    out[key] = _unpack12(
                        np.asarray(packed), int(np.prod(q32.shape))
                    )
                    continue
                q = q32 if overflow else q8
                out[key] = (
                    np.asarray(q).reshape(-1),
                    np.asarray(idx).reshape(-1),
                )
            else:
                _, q32, q8, _, idx = ent
                q = q32 if overflow else q8
                out[key] = (
                    np.asarray(q).reshape(-1),
                    np.asarray(idx).reshape(-1),
                )
        return out

    def _fused_decode_fn(self, subs, y_shape, wr, sr, ns, z_shape,
                         z_is_sym=False, split_synth=False):
        """Build (or fetch) the one-dispatch lane decompress program:
        ONE flat int32 buffer -> (x_hat, per-segment idx hashes). The
        buffer front carries the per-segment bank offset table and the z
        latent (int8 symbols or f32 z_hat, bitcast into int32 words) at
        static offsets, followed by the `lane_coder.flat_banks` payload —
        so the whole decode input crosses H2D as a single transfer (the
        tunneled link charges fixed latency per device_put). Per-segment
        kernel banks are rebuilt on device with dynamic_slice; the bank
        offsets are traced *values* read out of the buffer, so per-stream
        size variation never recompiles.

        `split_synth=True` ends the program at the walk — it returns the
        raw per-(slice, sub) y_hat tensors + hvec and the caller feeds
        them to `_fused_synth_fn` as a second dispatch. Used at
        pipeline>1: with the trailing concat+synthesis in the same
        executable, XLA's global layout assignment reaches back into the
        sub-batch walk islands and they no longer compile bit-identical
        to the encode twin's (measured on TPU: pipeline=2 fused decode
        derived different scale indexes than the whole-batch fused
        encoder, while the per-slice walk — whose programs end at the
        walk, like the encode twin — matched it exactly)."""
        from ..ans import lane_coder as lc

        key = (
            tuple(subs), y_shape, wr, sr, tuple(ns), self.synth_chunks,
            z_shape, z_is_sym, split_synth,
        )
        fn = self._lane_fused_cache.get(key)
        if fn is not None:
            return fn

        model = self.model
        S = model.num_slices
        K_subs = len(subs)
        table = jnp.asarray(self.scale_table)
        idx_dtype = self._idx_dtype
        interpret = jax.default_backend() != "tpu"
        medians = jnp.asarray(self.eb_coder.medians)
        G, KL = lc.GROUPS, lc.K
        n_boffs = len(ns) * 3 * G
        zn = int(np.prod(z_shape))
        z_words = (zn + 3) // 4 if z_is_sym else zn

        def fn(params, buf, cdf, lens, offs):
            boffs = buf[:n_boffs].reshape(len(ns), 3, G)
            zw = buf[n_boffs:n_boffs + z_words]
            if z_is_sym:
                z8 = jax.lax.bitcast_convert_type(zw, jnp.int8)
                z_hat = (
                    z8.reshape(-1)[:zn].reshape(z_shape)
                    .astype(jnp.float32) + medians
                )
            else:
                z_hat = jax.lax.bitcast_convert_type(
                    zw, jnp.float32
                ).reshape(z_shape)
            flat = buf

            def seg_banks(seg):
                w = jnp.concatenate([
                    jax.lax.dynamic_slice(
                        flat, (boffs[seg, 0, g],), (wr * KL,)
                    ).reshape(wr, KL)
                    for g in range(G)
                ])
                sd = jnp.concatenate([
                    jax.lax.dynamic_slice(
                        flat, (boffs[seg, 1, g],), (sr * KL,)
                    ).reshape(sr, KL)
                    for g in range(G)
                ])
                st = jnp.stack([
                    jax.lax.dynamic_slice(flat, (boffs[seg, 2, g],), (KL,))
                    for g in range(G)
                ])
                return w, sd, jax.lax.bitcast_convert_type(st, jnp.uint32)

            # hyper island: barriered input and output make this float
            # chain compile identically in the encode twin (see
            # _traced_walk's docstring for why the shared trace alone is
            # not enough). The input additionally rides a layout pin:
            # this z_hat is a bitcast of the uploaded buffer, whose layout
            # differs from the encode twin's conv-produced z_hat — the pin
            # hands the island a canonically-laid-out operand either way.
            pin = functools.partial(lc.layout_pin, interpret=interpret)
            lm_all, ls_all = jax.lax.optimization_barrier(model.apply(
                {"params": params},
                pin(jax.lax.optimization_barrier(z_hat)),
                y_shape, method="hyper_synthesize",
            ))
            hashes: Dict = {}
            y_hat_subs = []
            raw_slices = []
            for k, (lo, hi) in enumerate(subs):
                lm, ls = lm_all[lo:hi], ls_all[lo:hi]

                def get_symbols(i, mu, idx_q, _k=k):
                    seg = i * K_subs + _k
                    n = int(np.prod(idx_q.shape))
                    if n != ns[seg]:
                        raise ValueError(
                            "lane segment symbol count does not match the "
                            "slice shape"
                        )
                    w_b, s_b, st_b = seg_banks(seg)
                    return lc.lane_decode_device(
                        idx_q, w_b, s_b, st_b,
                        cdf, lens, offs, n, interpret=interpret,
                    ).reshape(idx_q.shape).astype(jnp.int32)

                y_hat_slices, h = _traced_walk(
                    model, params, lm, ls, table, idx_dtype, get_symbols,
                    pin=pin,
                )
                for i in range(S):
                    hashes[(i, k)] = h[i]
                if split_synth:
                    raw_slices.extend(y_hat_slices)
                else:
                    y_hat_subs.append(
                        jnp.concatenate(y_hat_slices, axis=-1)
                    )
            hvec = jnp.stack(
                [hashes[(i, k)] for i in range(S) for k in range(K_subs)]
            )
            if split_synth:
                # no concat/synthesis in this executable — the walk
                # islands keep the encode twin's program shape
                return tuple(raw_slices), hvec
            y_hat = jnp.concatenate(y_hat_subs, axis=0)
            x_hat = self._chunked_apply(
                params, y_hat, self.synth_chunks, "synthesize"
            )
            return x_hat, hvec

        fn = jax.jit(fn)
        self._lane_fused_cache[key] = fn
        return fn

    def _fused_synth_fn(self, n_subs):
        """Second dispatch of the split fused decode: per-(slice, sub)
        y_hat tensors -> concat -> synthesize -> x_hat."""
        key = ("synth", n_subs, self.synth_chunks)
        fn = self._lane_fused_cache.get(key)
        if fn is not None:
            return fn
        S = self.model.num_slices
        synth_chunks = self.synth_chunks
        chunked_apply = self._chunked_apply

        def fn(params, raw_slices):
            y_hat = jnp.concatenate([
                jnp.concatenate(raw_slices[k * S:(k + 1) * S], axis=-1)
                for k in range(n_subs)
            ], axis=0)
            return chunked_apply(params, y_hat, synth_chunks, "synthesize")

        fn = jax.jit(fn)
        self._lane_fused_cache[key] = fn
        return fn

    def _fused_decompress(
        self, z_sym, y_shape, subs, segments, enc_hashes, probe=None
    ):
        """One-dispatch lane decompress. Returns x_hat, or None if the
        fused program's idx hashes don't match the stream's (caller then
        falls back to the lockstep per-slice walk).

        H2D is ONE transfer of ~stream bytes: a single int32 buffer
        carries the offset table, the z latent (int8 symbols, with an f32
        fallback for out-of-range symbols, e.g. untrained weights), and
        the segments' banks back to back; the program rebuilds the
        kernel's padded layout on device (`lane_coder.flat_banks`)."""
        from ..ans import lane_coder as lc

        # common buckets across segments: the bucket only sizes the
        # on-device slices now (recompile granularity), not the transfer
        wr = _bucket(max(
            lc.words_rows_for(s.word_counts.max()) for s in segments
        ))
        sr = _bucket(max(
            lc.side_rows_for(s.side_counts.max()) for s in segments
        ))
        flat, boffs = lc.flat_banks(segments, wr, sr)
        z_is_sym = bool(z_sym.min() >= -128 and z_sym.max() <= 127)
        if z_is_sym:
            zb = z_sym.astype(np.int8).reshape(-1)
            pad = np.zeros((zb.size + 3) // 4 * 4, np.int8)
            pad[: zb.size] = zb
            z_i32 = pad.view("<i4")
        else:
            z_i32 = (
                z_sym.astype(np.float32) + self.eb_coder.medians
            ).reshape(-1).view(np.int32)
        hdr = boffs.size + z_i32.size
        buf = np.concatenate([
            (boffs.reshape(-1) + hdr).astype(np.int32), z_i32, flat
        ])
        if probe is not None:
            probe("banks_pack", None)  # host numpy time, no round trip
        buf_dev = jax.device_put(buf)
        if probe is not None:
            probe("banks_upload", buf_dev)
        split = len(subs) > 1
        fn = self._fused_decode_fn(
            subs, y_shape, wr, sr, tuple(s.n for s in segments),
            tuple(z_sym.shape), z_is_sym, split_synth=split,
        )
        out, hvec = fn(self.params, buf_dev, *self._lane_dev_tables)
        if split:
            # dispatch the synthesis before blocking on the hash fetch —
            # on a mismatch the second dispatch is wasted work, but the
            # match path never serializes on the D2H round trip
            x_hat = self._fused_synth_fn(len(subs))(self.params, out)
        else:
            x_hat = out
        hvec_np = np.asarray(hvec)
        if np.array_equal(hvec_np, enc_hashes):
            if probe is not None:
                probe("fused_walk_synth", x_hat)
            return x_hat
        K = len(subs)
        bad = [
            (j // K, j % K)
            for j in np.flatnonzero(hvec_np != enc_hashes)
        ]
        warnings.warn(
            "fused lane decode derived different scale indexes than the "
            f"encoder at (slice, sub) {bad}; falling back to the "
            "per-slice walk",
            RuntimeWarning,
        )
        return None

    def _fused_encode_build(self, subs, uint8_in, x_shape):
        """Build (or fetch) the one-dispatch lane ENCODE program: x ->
        (z symbol copies, per-segment encode-kernel banks, one packed i32
        meta vector holding every segment's counts + idx hashes + the z
        overflow flag). The entire encode walk — analyze, z quantization,
        hyper synthesis, the channel-AR chain, quantization, and the
        reverse-rANS encode kernels — traces into ONE XLA executable, so a
        dispatch-latency-bound link pays one round trip instead of ~2 per
        slice. Mirrors `_fused_decode_fn` (the decode twin)."""
        from ..ans import lane_coder as lc

        key = ("enc", tuple(subs), uint8_in, x_shape,
               self.analyze_chunks)
        fn = self._lane_fused_cache.get(key)
        if fn is not None:
            return fn

        model = self.model
        S = model.num_slices
        table = jnp.asarray(self.scale_table)
        idx_dtype = self._idx_dtype
        interpret = jax.default_backend() != "tpu"
        pad_sym = int(self.lane_tables.offsets[0])
        medians = jnp.asarray(self.eb_coder.medians)
        chunked_apply = self._chunked_apply
        analyze_chunks = self.analyze_chunks
        dtype = self.dtype

        def fn(params, x, cdf, lens, offs):
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            y, z = chunked_apply(
                params, x.astype(dtype), analyze_chunks, "analyze"
            )
            z_sym32, z_sym8, z_overflow, z_hat = _z_quantize_math(
                z, medians
            )
            y_shape = (y.shape[1], y.shape[2])
            # hyper island: mirrors the decode twin's barriers — but NOT
            # its layout pins. Measured (r4): this unpinned twin is
            # bit-aligned with the per-slice anchor for the WACNN family
            # at every pipeline; ADDING the decode twin's pins flipped
            # its slice-5 indexes, and did not fix the Swin family
            # either (Swin's fully-fused walk diverges pinned or not —
            # its bench config uses the "split" tier instead, which
            # keeps analyze/hyper at real program boundaries). Island
            # alignment is config-dependent, which is exactly why every
            # first stream is self-checked and demoted on mismatch.
            lm_all, ls_all = jax.lax.optimization_barrier(model.apply(
                {"params": params},
                jax.lax.optimization_barrier(z_hat),
                y_shape, method="hyper_synthesize",
            ))
            bounds = model.slice_boundaries(y.shape[-1])
            banks: Dict = {}
            hashes: Dict = {}
            for k, (lo, hi) in enumerate(subs):
                lm, ls = lm_all[lo:hi], ls_all[lo:hi]
                y_slices = jnp.split(y[lo:hi], bounds, axis=-1)

                def get_symbols(i, mu, idx_q, _k=k, _ys=y_slices):
                    q32 = jnp.round(_ys[i] - mu).astype(jnp.int32)
                    banks[(i, _k)] = lc.lane_encode_device(
                        q32, idx_q, cdf, lens, offs,
                        int(np.prod(_ys[i].shape)), pad_sym,
                        interpret=interpret,
                    )
                    return q32

                _, h = _traced_walk(
                    model, params, lm, ls, table, idx_dtype, get_symbols,
                    need_y_hat=False,
                )
                for i in range(S):
                    hashes[(i, k)] = h[i]
            keys = sorted(banks)
            # one i32 vector holding everything compress() must block on:
            # per-segment (G, 128) counts, per-segment idx hashes, and the
            # z overflow flag — fetched in a single device->host transfer
            meta = jnp.concatenate(
                [banks[key][3].reshape(-1) for key in keys]
                + [jax.lax.bitcast_convert_type(
                    jnp.stack([hashes[key] for key in keys]), jnp.int32
                )]
                + [z_overflow.astype(jnp.int32).reshape(1)]
            )
            out_banks = [banks[key][:3] for key in keys]
            return z_sym32, z_sym8, out_banks, meta

        fn = jax.jit(fn)
        self._lane_fused_cache[key] = fn
        return fn

    def _fused_encode_split_build(self, subs, y_shape):
        """Build (or fetch) the SPLIT-transform fused encode program:
        (y, lm, ls) -> (encode-kernel banks, packed meta). Unlike the
        full-fusion program (`_fused_encode_build`), analyze / z-quantize
        / hyper run as the SAME standalone executables the per-slice
        anchor uses — so lm/ls/y are bit-identical to the per-slice walk
        by construction, and this program's structure (program inputs ->
        pinned walk islands -> lane kernels) mirrors the fused DECODE
        twin, which is measured to match the per-slice anchor. Used as
        the automatic middle tier when full fusion's self-check fails
        (the Swin walk islands diverge inside the fully-fused module even
        with pinned operands — measured r4, every pipeline)."""
        from ..ans import lane_coder as lc

        key = ("enc_split", tuple(subs), tuple(y_shape))
        fn = self._lane_fused_cache.get(key)
        if fn is not None:
            return fn

        model = self.model
        S = model.num_slices
        table = jnp.asarray(self.scale_table)
        idx_dtype = self._idx_dtype
        interpret = jax.default_backend() != "tpu"
        pad_sym = int(self.lane_tables.offsets[0])

        def fn(params, y, lm_all, ls_all, z_overflow, cdf, lens, offs):
            pin = functools.partial(lc.layout_pin, interpret=interpret)
            bounds = model.slice_boundaries(y.shape[-1])
            banks: Dict = {}
            hashes: Dict = {}
            for k, (lo, hi) in enumerate(subs):
                lm, ls = lm_all[lo:hi], ls_all[lo:hi]
                y_slices = jnp.split(y[lo:hi], bounds, axis=-1)

                def get_symbols(i, mu, idx_q, _k=k, _ys=y_slices):
                    q32 = jnp.round(_ys[i] - mu).astype(jnp.int32)
                    banks[(i, _k)] = lc.lane_encode_device(
                        q32, idx_q, cdf, lens, offs,
                        int(np.prod(_ys[i].shape)), pad_sym,
                        interpret=interpret,
                    )
                    return q32

                _, h = _traced_walk(
                    model, params, lm, ls, table, idx_dtype, get_symbols,
                    need_y_hat=False, pin=pin,
                )
                for i in range(S):
                    hashes[(i, k)] = h[i]
            keys = sorted(banks)
            meta = jnp.concatenate(
                [banks[key][3].reshape(-1) for key in keys]
                + [jax.lax.bitcast_convert_type(
                    jnp.stack([hashes[key] for key in keys]), jnp.int32
                )]
                + [z_overflow.astype(jnp.int32).reshape(1)]
            )
            return [banks[key][:3] for key in keys], meta

        fn = jax.jit(fn)
        self._lane_fused_cache[key] = fn
        return fn

    def _compress_fused(self, x, probe=None,
                        prefetch=None) -> Optional[Dict[str, Any]]:
        """Fused encode walk (lane coder only). Returns the compressed
        dict, or None when this input can't ride the fused path
        (oversized slices for the resident encode kernel, or a rare
        side-channel/escape overflow — the caller then reruns the
        per-slice walk, whose host fallback handles anything).

        Two tiers, selected by `self._fused_mode`:
          * "full" — ONE dispatch for the entire encode (analyze ->
            hyper -> walk -> encode kernels, `_fused_encode_build`).
          * "split" — analyze / z-quantize / hyper as the standalone
            per-slice executables + ONE walk+encode dispatch
            (`_fused_encode_split_build`).
        A failed first-stream self-check demotes full -> split -> off,
        re-encoding each time, so a configuration whose fully-fused walk
        diverges (Swin, measured r4) still gets most of the dispatch
        savings instead of dropping to the per-slice walk."""
        from ..ans import lane_coder as lc

        # VMEM/HBM guard mirrors the per-slice device_encode path: the
        # encode kernel keeps word banks resident at ~4 B/symbol.
        # eval_shape gives the latent geometry without running anything.
        skey = ("shapes", x.shape[1:3])
        shapes = self._lane_fused_cache.get(skey)
        if shapes is None:
            y_sds, z_sds = jax.eval_shape(
                lambda p, xs: self.model.apply(
                    {"params": p}, xs, method="analyze"
                ),
                self.params,
                jax.ShapeDtypeStruct((1,) + tuple(x.shape[1:]), jnp.float32),
            )
            shapes = (y_sds.shape[1:], z_sds.shape[1:3])
            self._lane_fused_cache[skey] = shapes
        (yh, yw, ym), z_sd = shapes
        subs = self._sub_batches(x.shape[0])
        step = max(hi - lo for lo, hi in subs)
        bounds = self.model.slice_boundaries(ym)
        widths = np.diff([0] + list(bounds) + [ym])
        if int(step * yh * yw * widths.max()) > 2_000_000:
            return None

        S = self.model.num_slices
        G = lc.GROUPS

        # ONE whole-batch dispatch regardless of `pipeline`, structured
        # exactly like the fused decode twin: analyze + hyper at the FULL
        # batch shape, the channel-AR walk per sub-batch. Lockstep demands
        # this alignment — an earlier design ran analyze/hyper in per-sub
        # programs (batch shape = sub size), and the decoders (which keep
        # hyper at full batch, per the per-slice contract) derived
        # different bf16 scale values => flipped table indexes => hash
        # mismatch on every pipeline>1 stream.
        on_host = not isinstance(x, jax.Array)
        x_dev = jax.device_put(x) if on_host else x
        mode = self._fused_mode
        if mode == "full":
            fn = self._fused_encode_build(
                tuple(subs), x_dev.dtype == jnp.uint8, x_dev.shape
            )
            z_sym32, z_sym8, out_banks, meta = fn(
                self.params, x_dev, *self._lane_dev_tables
            )
        else:  # "split": canonical transform boundaries + one walk program
            y, z = self._analyze(self.params, x_dev)
            z_sym32, z_sym8, z_overflow_dev, z_hat = self._z_quantize(
                z, jnp.asarray(self.eb_coder.medians)
            )
            lm_all, ls_all = self._hyper(
                self.params, z_hat, (y.shape[1], y.shape[2])
            )
            fn = self._fused_encode_split_build(tuple(subs), tuple(y.shape))
            out_banks, meta = fn(
                self.params, y, lm_all, ls_all, z_overflow_dev,
                *self._lane_dev_tables,
            )
        self._start_transfer(z_sym8)
        self._start_transfer(meta)
        if prefetch is not None:
            # the entire encode is now in flight; the host is about to
            # block on the meta D2H for the walk's duration — let the
            # caller start the NEXT batch's H2D upload on the idle link
            prefetch()
        if probe is not None:
            probe("upload", x_dev)

        keys = sorted((i, k) for i in range(S) for k in range(len(subs)))
        meta_np = np.asarray(meta)
        counts_sz = len(keys) * G * 128
        counts_all = meta_np[:counts_sz].reshape(len(keys), G, 128)
        hash_all = meta_np[counts_sz: counts_sz + len(keys)].view(np.uint32)
        z_overflow = bool(meta_np[-1])
        pending = {}
        for j, (i, k) in enumerate(keys):
            lo, hi = subs[k]
            shape = (hi - lo, yh, yw, int(widths[i]))
            words, side, states = out_banks[j]
            pending[(i, k)] = (
                "dev", shape, None, None, words, side, states,
                counts_all[j], int(hash_all[j]),
            )
        if probe is not None:
            probe("fused_encode_walk", None)

        try:
            y_string = self._build_lane_stream(
                pending, flags=_LANE_FLAG_FUSED_ENC
            )
        except _LaneSideOverflow:
            return None
        if probe is not None:
            probe("entropy", None)

        z_sym = np.asarray(z_sym32 if z_overflow else z_sym8)
        z_strings = self.eb_coder.compress_symbols(z_sym)
        if probe is not None:
            probe("z_rans", None)
        out = {
            "strings": [[y_string], z_strings],
            "shape": (z_sd[0], z_sd[1]),
        }

        # First-stream-per-config self-check: prove the stream decodes
        # before handing it out (see fused_verify in __init__). Uses the
        # normal decompress path — fused decoder first, per-slice fallback
        # on hash mismatch — so "verified" means this codec configuration
        # can actually reconstruct what it just emitted.
        vkey = ("enc_ok", mode, tuple(subs), x_dev.shape,
                x_dev.dtype == jnp.uint8)
        if self.fused_verify and not self._lane_fused_cache.get(vkey):
            try:
                self.decompress(out["strings"], out["shape"])
            except (ValueError, IndexError, KeyError, struct.error):
                if mode == "full":
                    warnings.warn(
                        "fused encode self-check FAILED: neither decoder "
                        "derives the fully-fused encoder's scale indexes "
                        "for this configuration (layout/tiling "
                        "divergence) — demoting to the split-transform "
                        "fused encode and re-encoding",
                        RuntimeWarning,
                    )
                    self._fused_mode = "split"
                    return self._compress_fused(
                        x_dev, probe=probe, prefetch=prefetch
                    )
                warnings.warn(
                    "fused encode self-check FAILED: neither decoder "
                    "derives the fused encoder's scale indexes for this "
                    "configuration (layout/tiling divergence) — disabling "
                    "fused encode for this codec and re-encoding with the "
                    "per-slice anchor",
                    RuntimeWarning,
                )
                self.fused_encode = False
                return None
            self._lane_fused_cache[vkey] = True
            if probe is not None:
                probe("fused_verify", None)
        return out

    def _lane_rv(self, idx, words_dev, side_dev, states_dev):
        """Decode one lane-rANS segment on device: (idx-shaped int32
        symbols). jit-cached per (idx shape, stream bucket shapes)."""
        from ..ans import lane_coder as lc

        key = (idx.shape, words_dev.shape[0], side_dev.shape[0])
        fn = self._lane_rv_cache.get(key)
        if fn is None:
            n = int(np.prod(idx.shape))
            # the Mosaic kernel needs a real TPU; CPU (tests, CI) runs the
            # same kernel through the Pallas interpreter
            interpret = jax.default_backend() != "tpu"

            def decode(idx, w, sd, st, cdf, lens, offs):
                rv = lc.lane_decode_device(
                    idx, w, sd, st, cdf, lens, offs, n, interpret=interpret
                )
                return rv.reshape(idx.shape).astype(jnp.int32)

            fn = jax.jit(decode)
            self._lane_rv_cache[key] = fn
        return fn(idx, words_dev, side_dev, states_dev,
                  *self._lane_dev_tables)

    def _build_lane_stream(self, pending, flags: int = 0) -> bytes:
        """Assemble the lane y-stream from the walk's pending entries.

        "dev" entries hold resident kernel outputs: one stacked counts
        fetch (the only sync), then a bucketed tail-gather per segment
        geometry so only ~stream-sized bytes cross device->host. A
        side-channel-overflow flag (or a "host" entry) re-encodes that
        segment with the native host encoder from the same symbols — the
        two encoders are bit-exact, so mixing is invisible to decoders.
        Fused-encode dev entries carry pre-fetched numpy counts/hashes and
        no symbols; their side overflow raises `_LaneSideOverflow` so the
        caller can retry with the per-slice walk.
        """
        from ..ans import lane_coder as lc

        keys = sorted(pending)
        dev_keys = [key for key in keys if pending[key][0] == "dev"]
        counts_np: Dict = {}
        hash_np: Dict = {}
        fetch_keys = []
        for key in dev_keys:
            ent = pending[key]
            if isinstance(ent[7], np.ndarray):
                counts_np[key] = ent[7]
                hash_np[key] = int(ent[8])
            else:
                fetch_keys.append(key)
        if fetch_keys:
            counts_st, hashes_st = self._stack_fn(
                [pending[key][7] for key in fetch_keys],
                [pending[key][8] for key in fetch_keys],
            )
            counts_all = np.asarray(counts_st)
            hash_all = np.asarray(hashes_st)
            for j, key in enumerate(fetch_keys):
                counts_np[key] = counts_all[j]
                hash_np[key] = int(hash_all[j])

        # bucketed tail-gather, grouped by segment geometry
        ok_keys = [
            key for key in dev_keys if not counts_np[key][:, 2].any()
        ]
        groups: Dict = {}
        for key in ok_keys:
            n = int(np.prod(pending[key][1]))
            groups.setdefault(lc.encode_caps(n), []).append(key)
        tails: Dict = {}
        for (tg, wcap_rows, scap_rows), gkeys in groups.items():
            wb = min(
                _bucket(
                    max(
                        int(-(-counts_np[key][:, 0].max() // lc.K))
                        for key in gkeys
                    ) + 1
                ),
                tg,
            )
            sb = min(
                _bucket(
                    max(
                        int(-(-counts_np[key][:, 1].max() // lc.K))
                        for key in gkeys
                    ) + 1
                ),
                scap_rows,
            )
            fn = self._gather_fn(
                tg, wcap_rows, scap_rows, wb, sb, len(gkeys)
            )
            w_st, s_st, st_st = fn(
                [pending[key][4] for key in gkeys],
                [pending[key][5] for key in gkeys],
                [pending[key][6] for key in gkeys],
            )
            for a in (w_st, s_st, st_st):
                self._start_transfer(a)
            tails.update({
                key: (w_st, s_st, st_st, j)
                for j, key in enumerate(gkeys)
            })
        tail_np: Dict = {}

        sym_idx = self._pending_symbols(pending)
        segments, hashes = [], []
        for key in keys:
            ent = pending[key]
            if ent[0] == "dev" and key in tails:
                w_st, s_st, st_st, j = tails[key]
                if id(w_st) not in tail_np:
                    tail_np[id(w_st)] = (
                        np.asarray(w_st), np.asarray(s_st),
                        np.asarray(st_st),
                    )
                w_np, s_np, st_np = tail_np[id(w_st)]
                n = int(np.prod(ent[1]))
                segments.append(lc.assemble_from_tails(
                    w_np[j], s_np[j], st_np[j], counts_np[key], n
                ))
                hashes.append(hash_np[key])
                continue
            # host fallback: overflow-flagged dev segment or host entry
            if ent[0] == "dev":
                if ent[2] is None:
                    # fused-encode program keeps no symbols on device;
                    # the caller re-runs the per-slice walk
                    raise _LaneSideOverflow(key)
                q_np = np.asarray(ent[2]).reshape(-1)
                idx_np = np.asarray(ent[3]).reshape(-1)
                hashes.append(hash_np[key])
            else:
                q_np, idx_np = sym_idx[key]
                hashes.append(_idx_hash_host(idx_np))
            segments.append(lc.lane_encode(
                q_np.astype(np.int32),
                idx_np,
                self.lane_tables,
            ))
        return (
            np.asarray([_LANE_HEADER_MAGIC | (flags & 0xFF)], "<u4").tobytes()
            + np.asarray(hashes, "<u4").tobytes()
            + lc.pack_lane_stream(segments)
        )

    # -- shared per-slice walk ------------------------------------------------

    def _walk_slices(self, latent_means, latent_scales, get_symbols):
        """Run the channel-AR slice chain with fused steps. `get_symbols(i,
        mu, idx)` returns the int32 symbols for slice i — from quantization
        (encoder) or from the rANS stream (decoder). Returns the y_hat
        slices. Encoder and decoder both run exactly this walk, so every
        program (and hence every mu/scale/index bit) matches."""
        y_hat_slices: List = []
        k = self.model.max_support_slices

        def support():
            return tuple(y_hat_slices if k < 0 else y_hat_slices[:k])

        mu, idx = self._slice_idx(
            self.params, 0, latent_means, latent_scales, ()
        )
        for i in range(1, self.model.num_slices):
            rv = get_symbols(i - 1, mu, idx)
            y_prev, mu, idx = self._slice_fused(
                self.params, i, latent_means, latent_scales, support(), mu, rv
            )
            y_hat_slices.append(y_prev)
        rv = get_symbols(self.model.num_slices - 1, mu, idx)
        y_hat_slices.append(
            self._slice_apply(
                self.params,
                self.model.num_slices - 1,
                latent_means,
                support(),
                mu,
                rv,
            )
        )
        return y_hat_slices

    def _sub_batches(self, B: int):
        K = self.pipeline
        if K > B or B % K != 0:
            K = 1
        step = B // K
        return [(k * step, (k + 1) * step) for k in range(K)]

    @staticmethod
    def _start_transfer(arr):
        try:
            arr.copy_to_host_async()
        except AttributeError:
            pass

    # -- compress ------------------------------------------------------------

    def compress(self, x, probe=None, prefetch=None) -> Dict[str, Any]:
        """x: NHWC float array in [0,1]. Returns strings + z spatial shape.

        `probe(name, arr_or_None)` is an optional instrumentation hook
        called at phase boundaries (upload/analyze/hyper/walk/drain/rans).
        A probe that synchronizes on `arr` serializes the pipeline — use
        it for attribution runs, never inside the timed path.

        `prefetch()` is called EXACTLY ONCE per compress(), at the point
        where this call's device work is fully enqueued and the host is
        about to block on device->host results — the window where the
        H2D link sits idle for the walk's duration. Callers pipelining
        batches issue the next batch's `jax.device_put` there; upload
        order is not part of the stream layout, so streams stay
        byte-identical."""
        if prefetch is not None:
            fired = []

            def prefetch(_inner=prefetch, _fired=fired):
                # once-guard: a fused-path overflow fallback reruns the
                # per-slice walk, which must not re-trigger the upload
                if not _fired:
                    _fired.append(True)
                    _inner()

        if self.fused_encode:
            out = self._compress_fused(x, probe=probe, prefetch=prefetch)
            if out is not None:
                return out
            if probe is not None:
                # mark the rerun so attribution readers don't silently mix
                # the aborted fused walk's marks with the per-slice walk's
                probe("fused_encode_fallback", None)
        if probe is None:
            x_dev = jnp.asarray(x)
        else:
            x_dev = jax.device_put(x)
            probe("upload", x_dev)
        y, z = self._analyze(self.params, x_dev)
        if probe is not None:
            probe("analyze", y)
        # z_hat is built on device exactly as the decoder will (round +
        # medians, f32); the int8 symbol copy drains asynchronously for the
        # host factorized coder while the hyper/walk dispatches proceed
        z_sym32, z_sym8, z_overflow, z_hat = self._z_quantize(
            z, jnp.asarray(self.eb_coder.medians)
        )
        self._start_transfer(z_sym8)

        y_shape = (y.shape[1], y.shape[2])
        latent_means, latent_scales = self._hyper(self.params, z_hat, y_shape)
        if probe is not None:
            probe("hyper", latent_scales)
        bounds = self.model.slice_boundaries(y.shape[-1])

        pending = {}  # (slice, sub) -> ("dev" | "host", ...)
        dev = self.coder == "lane" and self._dev_encode

        # Per-sub-batch walks: all device work enqueues asynchronously.
        # Device-encode path: quantize + reverse-rANS kernel fuse into one
        # per-slice program and nothing drains to the host during the
        # walk. Host path: the (q, idx) transfers start async during the
        # walks so the critical path never stalls on device->host traffic.
        for k, (lo, hi) in enumerate(self._sub_batches(y.shape[0])):
            lm, ls = latent_means[lo:hi], latent_scales[lo:hi]
            y_slices = jnp.split(y[lo:hi], bounds, axis=-1)

            def get_symbols(i, mu, idx, k=k, y_slices=y_slices):
                # VMEM guard: the encode kernel keeps the word banks
                # resident (4 B/symbol), so huge slices use the host path
                if dev and int(np.prod(y_slices[i].shape)) <= 2_000_000:
                    q32, words, side, states, counts, h = (
                        self._quantize_encode(
                            y_slices[i], mu, idx, *self._lane_dev_tables
                        )
                    )
                    pending[(i, k)] = (
                        "dev", y_slices[i].shape, q32, idx,
                        words, side, states, counts, h,
                    )
                    return q32
                if self._pack_drain:
                    q32, packed, fits, q8, overflow = self._quantize_packed(
                        y_slices[i], mu, idx
                    )
                    self._start_transfer(packed)
                    pending[(i, k)] = (
                        "packed", q32, packed, fits, q8, overflow, idx
                    )
                    return q32
                q32, q8, overflow = self._quantize(y_slices[i], mu)
                self._start_transfer(q8)
                self._start_transfer(idx)
                pending[(i, k)] = ("host", q32, q8, overflow, idx)
                return q32

            self._walk_slices(lm, ls, get_symbols)

        if prefetch is not None:
            prefetch()
        if probe is not None:
            ent = pending[max(pending)]
            probe("walk", ent[2] if ent[0] == "dev" else ent[1])

        # (slice, sub-batch) order — must match the decoder's read order
        if self.coder == "lane":
            y_strings_out = [self._build_lane_stream(pending)]
            if probe is not None:
                probe("entropy", None)
        else:
            # PER-IMAGE host y-streams: image b's stream holds its slices
            # in 0..S-1 order, exactly the bytes a batch-1 encode of that
            # image produces — so batched eval reports exact per-image bpp
            # (reference contract: `eval_model/__main__.py:117-125`), and
            # the host stream layout no longer depends on `pipeline`.
            cdf, lengths, offsets = self.gc_coder.tables.astuple()
            sym_idx = self._pending_symbols(pending)
            if probe is not None:
                probe("drain", None)
            subs = self._sub_batches(y.shape[0])
            encoders = [
                host_coder_classes(self.host_backend)[0]()
                for _ in range(y.shape[0])
            ]
            for key in sorted(pending):
                _, k = key
                lo, hi = subs[k]
                sym_np, idx_np = sym_idx[key]
                per = sym_np.size // (hi - lo)
                sym2 = sym_np.reshape(hi - lo, per)
                idx2 = idx_np.reshape(hi - lo, per)
                for b in range(hi - lo):
                    encoders[lo + b].encode_with_indexes(
                        sym2[b], idx2[b], cdf, lengths, offsets
                    )
            y_strings_out = [e.flush() for e in encoders]
            if probe is not None:
                probe("rans", None)

        z_sym = np.asarray(z_sym32 if bool(z_overflow) else z_sym8)
        z_strings = self.eb_coder.compress_symbols(z_sym)
        if probe is not None:
            probe("z_rans", None)

        return {
            "strings": [y_strings_out, z_strings],
            "shape": (z_hat.shape[1], z_hat.shape[2]),
        }

    # -- decompress ----------------------------------------------------------

    def decompress(self, strings: Sequence, shape, probe=None) -> Dict[str, Any]:
        y_strings, z_strings = strings[0], strings[1]
        # decode z to raw symbols; dequantization (+ medians) runs on
        # device in the fused path (int8 crosses the link instead of f32),
        # on host for the per-slice paths (f32 z_hat as before)
        z_sym = self.eb_coder.decompress_symbols(z_strings, shape)
        if probe is not None:
            probe("z_host_rans", None)  # host-side z decode, no round trip
        up = self.model.hyper_upsample
        y_shape = (shape[0] * up, shape[1] * up)

        B = z_sym.shape[0]
        subs = self._sub_batches(B)
        K = len(subs)
        S = self.model.num_slices
        k_supp = self.model.max_support_slices

        fused_enc = False
        if self.coder == "lane":
            from ..ans import lane_coder as lc

            blob = y_strings[0] if len(y_strings) else b""
            # the header word plus the S*K idx hashes must be present
            # before any frombuffer parse (a truncated/foreign blob should
            # hit the documented ValueError, not a numpy buffer-size error)
            if len(blob) < 4 + 4 * S * K:
                raise ValueError(
                    f"lane y-stream is {len(blob)} bytes — shorter than "
                    f"its {4 + 4 * S * K}-byte header (truncated, or not "
                    "a lane stream)"
                )
            header = int(np.frombuffer(blob[:4], "<u4")[0])
            if (header & 0xFFFFFF00) != _LANE_HEADER_MAGIC:
                raise ValueError(
                    f"lane y-stream header 0x{header:08x} does not carry "
                    f"magic 0x{_LANE_HEADER_MAGIC:08x} (stream from an "
                    "older build, or not a lane stream)"
                )
            fused_enc = bool(header & _LANE_FLAG_FUSED_ENC)
            enc_hashes = np.frombuffer(
                blob[4: 4 + 4 * S * K], "<u4"
            ).copy()
            segments = lc.unpack_lane_stream(blob[4 + 4 * S * K:])
            if probe is not None:
                probe("y_unpack", None)  # host stream parse, no round trip
            if len(segments) != S * K:
                raise ValueError(
                    f"lane stream has {len(segments)} segments, expected "
                    f"{S * K} (num_slices x pipeline mismatch?)"
                )
            if self.fused:
                x_hat = self._fused_decompress(
                    z_sym, y_shape, subs, segments, enc_hashes, probe=probe
                )
                if x_hat is not None:
                    return {"x_hat": x_hat}
            # per-slice walk (fused off, or hash-mismatch fallback):
            # upload every segment's stream banks up front — the H2D
            # transfers overlap the hyper synthesis + walk dispatches
            dev_segs = []
            for seg in segments:
                wr = _bucket(lc.words_rows_for(seg.word_counts.max()))
                sr = _bucket(lc.side_rows_for(seg.side_counts.max()))
                dev_segs.append((
                    jax.device_put(lc.pack_word_banks(seg, wr)),
                    jax.device_put(lc.pad_side_banks(seg, sr)),
                    jax.device_put(np.ascontiguousarray(seg.states)),
                    seg.n,
                ))
        else:
            cdf, lengths, offsets = self.gc_coder.tables.astuple()
            if len(y_strings) != B:
                raise ValueError(
                    f"host y-streams are per image: got {len(y_strings)} "
                    f"streams for a batch of {B}"
                )
            decoders = []
            for s in y_strings:
                d = host_coder_classes(self.host_backend)[2]()
                d.set_stream(s)
                decoders.append(d)

        z_hat = jnp.asarray(
            z_sym.astype(np.float32) + self.eb_coder.medians
        )
        if probe is not None:
            probe("z_decode", z_hat)
        latent_means, latent_scales = self._hyper(self.params, z_hat, y_shape)
        lm = [latent_means[lo:hi] for lo, hi in subs]
        ls = [latent_scales[lo:hi] for lo, hi in subs]
        y_hats: List[List] = [[] for _ in range(K)]
        mu, idx = [None] * K, [None] * K

        def support(k):
            return tuple(
                y_hats[k] if k_supp < 0 else y_hats[k][:k_supp]
            )

        # Interleave the K sub-batch walks: while sub-batch k's symbols run
        # through the host rANS decoder, the other sub-batches' dispatches
        # and index transfers are in flight.
        lane = self.coder == "lane"
        # A fused-ENCODED stream's indexes anchor to the fused encode
        # executable, not to these per-slice programs — verify our derived
        # indexes against the stream's hashes and fail loudly on mismatch
        # (a desynced rANS read would otherwise return garbage silently).
        verify = lane and fused_enc
        dec_hashes: Dict = {}
        for k in range(K):
            mu[k], idx[k] = self._slice_idx(self.params, 0, lm[k], ls[k], ())
            if not lane:
                self._start_transfer(idx[k])
        for i in range(S):
            for k in range(K):
                if lane:
                    words_d, side_d, states_d, n = dev_segs[i * K + k]
                    if n != int(np.prod(idx[k].shape)):
                        raise ValueError(
                            "lane segment symbol count does not match the "
                            "slice shape"
                        )
                    if verify:
                        dec_hashes[(i, k)] = self._hash_fn(idx[k])
                    rv = self._lane_rv(idx[k], words_d, side_d, states_d)
                else:
                    idx_np = np.asarray(idx[k])
                    lo, _ = subs[k]
                    rv = np.stack([
                        decoders[lo + b].decode_stream(
                            idx_np[b].reshape(-1), cdf, lengths, offsets
                        ).reshape(idx_np.shape[1:])
                        for b in range(idx_np.shape[0])
                    ])
                    rv = jnp.asarray(rv)
                if i < S - 1:
                    y_prev, mu[k], idx[k] = self._slice_fused(
                        self.params, i + 1, lm[k], ls[k], support(k), mu[k], rv
                    )
                    if not lane:
                        self._start_transfer(idx[k])
                    y_hats[k].append(y_prev)
                else:
                    y_hats[k].append(
                        self._slice_apply(
                            self.params, S - 1, lm[k], support(k), mu[k], rv
                        )
                    )

        if verify:
            hvec = np.asarray(self._stack_flags(
                [dec_hashes[(i, k)] for i in range(S) for k in range(K)]
            )).astype(np.uint32)
            if not np.array_equal(hvec, enc_hashes):
                if not self.fused:
                    # the stream's indexes anchor to the fused ENCODE
                    # executable, whose decode twin is the fused program —
                    # with the fused knob off it was never tried, so try
                    # it before failing (symmetric fallback)
                    x_hat = self._fused_decompress(
                        z_sym, y_shape, subs, segments, enc_hashes,
                        probe=probe,
                    )
                    if x_hat is not None:
                        return {"x_hat": x_hat}
                raise ValueError(
                    "per-slice decode derived different scale indexes than "
                    "the stream's fused encoder (lockstep hash mismatch); "
                    "re-encode with fused_encode=False"
                )
        y_hat = jnp.concatenate(
            [jnp.concatenate(h, axis=-1) for h in y_hats], axis=0
        )
        x_hat = self._synth(self.params, y_hat)
        return {"x_hat": x_hat}
