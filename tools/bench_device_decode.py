"""Device-side entropy-decode spike measurement (real TPU).

Scenario: the z-latent of the bench workload (24 Kodak-size images through
full-size WACNN: z = 24 x 12 x 8 x 192 = 442k symbols, one CDF row per
channel). Host path (models/codec.py + EntropyBottleneckCoder) round-trips
indexes/symbols over the link; the lane decoder uploads only the bitstream
and decodes in one Pallas program.

Reports: correctness vs the host reference decoder, decode wall time, and
the per-direction transfer bytes of both paths.

Run: python tools/bench_device_decode.py   (needs the real TPU; don't run
concurrently with bench.py)
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
        lane_decode_reference,
        lane_encode,
        make_lane_tables,
    )
    from stf_tpu.entropy import build_eb_tables
    from stf_tpu.models import WACNN
    from stf_tpu.training import create_train_state
    from stf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print("device:", jax.devices()[0], file=sys.stderr)

    # EB tables of the full-size flagship (192 z channels)
    model = WACNN()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 256, 256, 3)
    )
    eb = build_eb_tables(state.params["entropy_bottleneck"])
    cdf, lengths, offsets = (np.asarray(a) for a in eb.astuple())
    tables = make_lane_tables(cdf, lengths, offsets)
    C = cdf.shape[0]
    print(f"EB tables: {C} rows, width {cdf.shape[1]}", file=sys.stderr)

    # z-latent symbol tensor, channel-major (static row per step)
    n_img, zh, zw = 24, 8, 12
    spatial = n_img * zh * zw
    rng = np.random.default_rng(0)
    sym = np.empty(C * spatial, np.int32)
    idx = np.repeat(np.arange(C, dtype=np.int32), spatial)
    for c in range(C):
        lo, hi = offsets[c], offsets[c] + lengths[c] - 2
        sym[c * spatial : (c + 1) * spatial] = rng.integers(lo, hi, spatial)
    # sprinkle escapes (out-of-range outliers)
    esc_pos = rng.random(sym.size) < 0.001
    sym[esc_pos] = rng.integers(-1000, 1000, int(esc_pos.sum()))

    stream = lane_encode(sym, idx, tables)
    print(
        f"symbols: {stream.n}  stream: {stream.words.size * 2} B words + "
        f"{stream.side.size * 4} B side + {stream.states.size * 4} B states",
        file=sys.stderr,
    )

    ref = lane_decode_reference(stream, idx, tables)
    np.testing.assert_array_equal(ref, sym)

    # --- device decode (compile + 3 timed runs) ---
    out = lane_decode(stream, idx, tables)
    dev = np.asarray(out)
    np.testing.assert_array_equal(dev, sym)
    print("TPU decode matches", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.time()
        out = lane_decode(stream, idx, tables)
        host_visible = np.asarray(out[:8])  # force completion host-side
        times.append(time.time() - t0)
    del host_visible

    stream_bytes = (stream.words.size * 2 + stream.side.size * 4
                    + stream.states.size * 4)
    # host path per z decode: indexes uint8 D2H? (z indexes are static ->
    # the host already knows them; charge 0) + decoded symbols H2D as int32
    # for z_hat — and critically one full link round trip of latency.
    host_h2d = stream.n * 4
    print(
        f"lane decode (incl. upload + dispatch): best "
        f"{min(times):.4f}s of {['%.4f' % t for t in times]}",
        file=sys.stderr,
    )
    print(
        f"transfers: device path H2D {stream_bytes} B vs host path H2D "
        f"{host_h2d} B ({host_h2d / stream_bytes:.1f}x reduction)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
