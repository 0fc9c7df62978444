"""Benchmark: enc+dec throughput on Kodak-sized images, single TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Baseline (BASELINE.md): reference WACNN on a CUDA GPU takes 0.12 s encode +
0.12 s decode per Kodak image => 1 / 0.24 = 4.167 images/sec end-to-end.
Kodak images are 768x512; without network egress the bench uses synthetic
images at that exact resolution (timing is content-independent: the
transforms are fixed-shape and the rANS coder is ~linear in symbol count
with data-dependent constants small next to the transforms).
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_SEC_PER_IMG = 0.12 + 0.12  # CNN enc + dec, README.md:85


def main():
    import jax

    from stf_tpu.models import Codec, WACNN
    from stf_tpu.training import create_train_state
    from stf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    model = WACNN()  # full-size flagship: N=192, M=320, 10 slices
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 256, 256, 3)
    )
    # bf16 transforms (MXU-native; entropy bottleneck stays f32). RD impact
    # is guard-tested: <0.5% entropy-estimation bpp delta, -0.04 dB on the
    # trained golden model (tests/test_golden_rd.py).
    # pipeline=1: on the tunneled single-chip setup, per-dispatch latency
    # outweighs the host/device overlap that sub-batch pipelining buys
    # (measured 2.50 img/s at pipeline=1 vs 1.69 at pipeline=3); on hosts
    # with local PCIe/DMA links, raise `pipeline` to overlap rANS with
    # device compute.
    # entropy backend: "lane" encodes with the native C++ lane encoder and
    # decodes the whole walk as ONE device program (Pallas interleaved
    # rANS + hash-guarded fused decompress, ans/lane_coder.py +
    # models/codec.py); "host" is the reference-contract CPU coder.
    # Measured (same session, best of 3): lane 3.46 img/s vs host 3.02.
    coder = os.environ.get("STF_BENCH_CODER", "lane")
    codec = Codec(
        model, state.params, pipeline=1, dtype=jnp.bfloat16, coder=coder
    )

    rng = np.random.default_rng(0)
    n_images = 24  # Kodak size
    # Throughput mode (SURVEY.md §7 build-plan #10): the channel-AR slice
    # walk is batched across all images, so the per-slice program dispatches
    # and host<->device transfers are paid once per *batch*, not per image;
    # the host rANS coder runs while the device works on the next stage.
    batch = rng.integers(0, 256, (n_images, 512, 768, 3), dtype=np.uint8)

    # warm-up: compile every program in the enc+dec path
    out = codec.compress(batch)
    codec.decompress(out["strings"], out["shape"])

    # Best of 3 measured iterations: the tunneled link has high run-to-run
    # variance. (A staged half-batch pipeline — decode(b1) overlapping
    # encode(b2) — measured *slower* here, 2.46 vs 3.15 img/s: the tunnel
    # itself is the serial resource; see PERF.md.)
    elapsed = float("inf")
    for _ in range(3):
        start = time.time()
        out_enc = codec.compress(batch)
        t_enc = time.time() - start
        out_dec = codec.decompress(out_enc["strings"], out_enc["shape"])
        jax.block_until_ready(out_dec["x_hat"])
        total = time.time() - start
        print(
            f"encode: {t_enc:.2f}s  decode: {total - t_enc:.2f}s "
            f"({n_images} images)",
            file=sys.stderr,
        )
        elapsed = min(elapsed, total)

    images_per_sec = n_images / elapsed
    baseline_ips = 1.0 / REFERENCE_SEC_PER_IMG
    print(
        json.dumps(
            {
                "metric": "kodak_enc_dec_throughput_cnn",
                "value": round(images_per_sec, 4),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / baseline_ips, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
