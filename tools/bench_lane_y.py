"""Time the lane decoder at the y-latent operating shape (real TPU).

One WACNN slice of the 24-image Kodak bench: 24 x 32 x 48 x 32 = 1.18M
symbols against the truncated 64-row Gaussian-conditional tables (W<=257).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    from stf_tpu.ans.lane_coder import (
        lane_decode,
        truncate_tables,
    )
    from stf_tpu.entropy import build_gc_tables, get_scale_table
    from stf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print("device:", jax.devices()[0], file=sys.stderr)

    tables = truncate_tables(*build_gc_tables(get_scale_table()).astuple())
    R, W = tables.cdf.shape
    print(f"GC lane tables: {R} rows, width {W}", file=sys.stderr)

    n = 24 * 32 * 48 * 32  # one slice of the bench batch
    rng = np.random.default_rng(0)
    idx = rng.integers(0, R, n).astype(np.int32)
    centers = -tables.offsets
    half = np.minimum(centers[idx], 127)
    sym = np.clip(
        rng.normal(0, np.maximum(half / 3.0, 0.7)).round(), -half, half
    ).astype(np.int32)

    from stf_tpu.ans.lane_coder import lane_encode

    stream = lane_encode(sym, idx, tables)
    print(
        f"symbols: {stream.n}  words: {stream.words.size * 2} B  "
        f"side: {stream.side.size * 4} B",
        file=sys.stderr,
    )

    out = lane_decode(stream, idx, tables)
    np.testing.assert_array_equal(np.asarray(out), sym)
    print("TPU decode matches", file=sys.stderr)

    # measure the codec's actual call pattern: streams resident on device,
    # ONE jitted program per decode (pad/permute fused with the kernel)
    import jax
    import jax.numpy as jnp

    from stf_tpu.ans import lane_coder as lc

    wr = lc.words_rows_for(stream.word_counts.max())
    sr = lc.side_rows_for(stream.side_counts.max())
    words_dev = jnp.asarray(lc.pack_word_banks(stream, wr))
    side_dev = jnp.asarray(lc.pad_side_banks(stream, sr))
    states_dev = jnp.asarray(np.ascontiguousarray(stream.states))
    dev_tabs = lc.device_tables(tables)
    idx_dev = jnp.asarray(idx)

    fn = jax.jit(
        lambda i, w, sd, st, cdf, ln, off: lc.lane_decode_device(
            i, w, sd, st, cdf, ln, off, stream.n
        )
    )
    out = fn(idx_dev, words_dev, side_dev, states_dev, *dev_tabs)
    np.testing.assert_array_equal(np.asarray(out), sym)

    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(idx_dev, words_dev, side_dev, states_dev, *dev_tabs)
        _ = np.asarray(out[:8])
        times.append(time.time() - t0)
    T = -(-stream.n // 128) // 8  # rows per group
    best = min(times)
    print(
        f"decode: best {best:.4f}s of {['%.4f' % t for t in times]} "
        f"({T} steps, {best / T * 1e6:.2f} us/step)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
