"""Evaluate a codec end-to-end on an image directory.

Drop-in analog of the reference CLI
(`compressai/utils/eval_model/__main__.py`): pads each image to a multiple
of 64, runs real compress/decompress (or --entropy-estimation for
theoretical bpp), and reports averaged PSNR / MS-SSIM / bpp / enc / dec
times as a JSON blob.

Usage:
    python -m stf_tpu.cli.eval_model -a cnn -p ckpt.msgpack -d /path/kodak

TPU notes: images of the same padded shape share one compiled program;
enc/dec times are measured after a warm-up pass per shape bucket so
compilation is not billed to the codec. `--batch-size N` groups same-shape
images through one batched codec walk.
"""

import argparse
import collections
import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import stf_tpu
from ..datasets import load_image
from ..models import Codec
from ..utils.metrics import ms_ssim
from ..zoo import load_checkpoint

IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp",
)


def collect_images(rootpath):
    return sorted(
        os.path.join(rootpath, f)
        for f in os.listdir(rootpath)
        if os.path.splitext(f)[-1].lower() in IMG_EXTENSIONS
    )


def pad_to_multiple(x: np.ndarray, p: int = 64):
    """Zero-pad NHWC to the next multiple of p, centered (reference
    `__main__.py:88-101`)."""
    h, w = x.shape[1:3]
    new_h = (h + p - 1) // p * p
    new_w = (w + p - 1) // p * p
    left = (new_w - w) // 2
    top = (new_h - h) // 2
    pads = (
        (0, 0),
        (top, new_h - h - top),
        (left, new_w - w - left),
        (0, 0),
    )
    return np.pad(x, pads), (top, left, h, w)


def unpad(x: np.ndarray, box):
    top, left, h, w = box
    return x[:, top : top + h, left : left + w, :]


def inference(codec: Codec, xs, warm_shapes: set, batch=None, boxes=None,
              prefetch=None):
    """Encode+decode a batch of same-shape images (xs: list of (1,H,W,3));
    returns per-image metric dicts and reconstructions. Batching the
    channel-AR walk amortizes program dispatches across the batch (see
    PERF.md); per-image times are the batch time divided by the batch.

    `batch`/`boxes` let the caller hand in a pre-padded (possibly already
    device-resident) batch; `prefetch` is forwarded to the timed
    `codec.compress` so the NEXT batch's H2D upload rides the link while
    this batch's walk runs (see Codec.compress)."""
    if batch is None:
        padded, boxes = zip(*[pad_to_multiple(x) for x in xs])
        batch = np.concatenate(padded, axis=0)
    n = batch.shape[0]

    cold_enc = cold_dec = None
    if tuple(batch.shape) not in warm_shapes:
        # Warm-up: compile all shape-specialized programs outside the warm
        # timer; its own (cold) time is reported separately so first-use
        # latency is visible instead of hidden (the persistent compile
        # cache + cli.prime_cache shrink it on later runs).
        start = time.time()
        out_enc = codec.compress(batch)
        cold_enc = (time.time() - start) / n
        start = time.time()
        codec.decompress(out_enc["strings"], out_enc["shape"])
        cold_dec = (time.time() - start) / n
        warm_shapes.add(tuple(batch.shape))

    start = time.time()
    out_enc = codec.compress(batch, prefetch=prefetch)
    enc_time = (time.time() - start) / n

    start = time.time()
    out_dec = codec.decompress(out_enc["strings"], out_enc["shape"])
    x_hat_batch = np.asarray(out_dec["x_hat"], np.float32)
    dec_time = (time.time() - start) / n

    # host backend: y-streams are PER IMAGE (exact per-image bpp, matching
    # the reference CLI's batch-1 output contract). lane backend: the batch
    # shares one throughput-oriented stream — bytes are apportioned
    # equally (average exact, per-image approximate) and the fixed
    # per-segment framing share is reported so RD comparisons can account
    # for it (use the host backend for RD curves).
    y_list = out_enc["strings"][0]
    z_bytes = [len(s) for s in out_enc["strings"][1]]
    lane_overhead = 0.0
    if len(y_list) == n:
        y_bytes = [len(s) for s in y_list]
    else:
        total = sum(len(s) for s in y_list)
        y_bytes = [total / n] * n
    if codec.coder == "lane":
        # framing is fixed per segment, so it dominates small/batch-1
        # streams — always report its share for lane RD accounting
        from ..ans.lane_coder import fixed_overhead_bytes

        S = codec.model.num_slices
        K = len(codec._sub_batches(n))
        lane_overhead = (
            4 + 4 * S * K + fixed_overhead_bytes(S * K)
        ) / n

    results = []
    for i, (x, box) in enumerate(zip(xs, boxes)):
        x_hat = unpad(x_hat_batch[i : i + 1], box)
        num_pixels = x.shape[1] * x.shape[2]
        bpp = (y_bytes[i] + z_bytes[i]) * 8.0 / num_pixels
        mse = float(np.mean((x - x_hat) ** 2))
        rv = {
            "psnr": -10 * math.log10(mse),
            "ms-ssim": float(
                ms_ssim(jnp.asarray(x), jnp.asarray(x_hat))
            ),
            "bpp": bpp,
            "encoding_time": enc_time,
            "decoding_time": dec_time,
        }
        if lane_overhead:
            rv["lane_framing_bpp"] = lane_overhead * 8.0 / num_pixels
        if cold_enc is not None:
            rv["first_use_encoding_time"] = cold_enc
            rv["first_use_decoding_time"] = cold_dec
        results.append((rv, x_hat))
    return results


def inference_entropy_estimation(model, params, x: np.ndarray, apply_jit):
    x_padded, box = pad_to_multiple(x)
    start = time.time()
    out = apply_jit(params, jnp.asarray(x_padded))
    jax.block_until_ready(out)
    elapsed = time.time() - start

    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = sum(
        float(jnp.sum(jnp.log(lik)) / (-math.log(2) * num_pixels))
        for lik in out["likelihoods"].values()
    )
    x_hat = unpad(np.clip(np.asarray(out["x_hat"]), 0, 1), box)
    mse = float(np.mean((x - x_hat) ** 2))
    return {
        "psnr": -10 * math.log10(mse),
        "bpp": bpp,
        "encoding_time": elapsed / 2.0,
        "decoding_time": elapsed / 2.0,
    }, x_hat


def eval_model(
    model,
    params,
    filepaths,
    entropy_estimation=False,
    recon_path="reconstruction",
    verbose=False,
    half=False,
    batch_size=1,
    backend="host",
    fused_encode=False,
    transform_chunks=1,
    pipeline=1,
    prefetch=False,
):
    if half and entropy_estimation:
        # estimation path has no coder: plain bf16 params are fine
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else a,
            params,
        )
    metrics = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    # real-coding path: Codec(dtype=bf16) keeps the entropy bottleneck f32
    # so the CDF tables stay exact (the RD-guarded bench configuration) —
    # a blanket params cast would rebuild tables from bf16 quantiles
    codec = (
        None
        if entropy_estimation
        else Codec(
            model, params, coder=backend,
            dtype=jnp.bfloat16 if half else None,
            fused_encode=fused_encode,
            pipeline=pipeline,
            analyze_chunks=transform_chunks,
            synth_chunks=transform_chunks,
        )
    )
    apply_jit = (
        jax.jit(
            lambda p, x: model.apply({"params": p}, x, training=False)
        )
        if entropy_estimation
        else None
    )
    warm_shapes: set = set()
    os.makedirs(recon_path, exist_ok=True)

    def save_recon(path, x_hat):
        try:
            from PIL import Image

            Image.fromarray(
                (np.clip(x_hat[0], 0, 1) * 255 + 0.5).astype(np.uint8)
            ).save(os.path.join(recon_path, os.path.basename(path)))
        except Exception:
            pass

    if entropy_estimation:
        for f in filepaths:
            if verbose:
                print(f, file=sys.stderr)
            x = load_image(f)[None]
            rv, x_hat = inference_entropy_estimation(
                model, params, x, apply_jit
            )
            save_recon(f, x_hat)
            for k, v in rv.items():
                metrics[k] += v
        return {k: v / len(filepaths) for k, v in metrics.items()}

    # group same-shape images so the codec's batched walk amortizes
    # dispatches (Kodak is uniform; CLIC buckets by shape), then flatten
    # into a batch list so batch i+1's H2D upload can ride the link while
    # batch i's walk runs (codec prefetch hook; steady-state pipelining)
    groups = collections.defaultdict(list)
    for f in filepaths:
        x = load_image(f)[None]
        groups[x.shape].append((f, x))
    batches = []
    for shape, items in groups.items():
        for lo in range(0, len(items), batch_size):
            chunk = items[lo : lo + batch_size]
            padded, boxes = zip(*[pad_to_multiple(x) for _, x in chunk])
            batches.append((chunk, np.concatenate(padded, 0), boxes))
    carried = None  # device buffer the previous iteration prefetched
    for i, (chunk, batch_np, boxes) in enumerate(batches):
        if verbose:
            for f, _ in chunk:
                print(f, file=sys.stderr)
        nxt = batches[i + 1][1] if i + 1 < len(batches) else None
        holder: dict = {}
        hook = (
            (lambda n_=nxt: holder.update(x=jax.device_put(n_)))
            if prefetch and nxt is not None
            else None
        )
        x_in = carried if carried is not None else batch_np
        results = inference(
            codec, [x for _, x in chunk], warm_shapes,
            batch=x_in, boxes=boxes, prefetch=hook,
        )
        carried = holder.get("x")
        for (f, _), (rv, x_hat) in zip(chunk, results):
            save_recon(f, x_hat)
            for k, v in rv.items():
                metrics[k] += v
                counts[k] += 1

    return {k: v / counts[k] for k, v in metrics.items()}


def setup_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-d", "--dataset", type=str, required=True)
    p.add_argument("-r", "--recon_path", type=str, default="reconstruction")
    p.add_argument("-a", "--architecture", type=str, required=True)
    p.add_argument(
        "-c",
        "--entropy-coder",
        choices=stf_tpu.available_entropy_coders(),
        default=stf_tpu.available_entropy_coders()[0],
    )
    p.add_argument("--entropy-estimation", action="store_true")
    p.add_argument(
        "--batch-size",
        type=int,
        default=1,
        help="encode/decode same-shape images together (amortizes program "
        "dispatches; per-image times are batch time / batch size)",
    )
    p.add_argument(
        "--half",
        action="store_true",
        help="run the transforms in bfloat16 (TPU-native half precision; "
        "the reference's fp16 option)",
    )
    p.add_argument(
        "--backend",
        choices=("host", "lane"),
        default="host",
        help="y-latent entropy backend: 'host' = reference-contract CPU "
        "rANS with per-image streams (use this for RD curves); 'lane' = "
        "TPU-resident interleaved rANS with one-dispatch fused decompress "
        "(fastest on TPU; throughput mode — its bpp includes fixed "
        "per-segment framing, reported as lane_framing_bpp)",
    )
    p.add_argument(
        "--fused-encode",
        nargs="?",
        const="1",
        default="0",
        choices=("0", "1", "split"),
        help="lane backend only: trace the encode walk into ONE program "
        "(1 = full fusion incl. analyze/hyper; split = standalone "
        "transforms + one walk+encode program, the tier a failed "
        "full-fusion self-check demotes to). Streams are byte-identical "
        "(header flag aside); oversized or overflowing inputs fall back "
        "to the per-slice walk",
    )
    p.add_argument(
        "--transform-chunks",
        type=int,
        default=1,
        help="run analyze/synthesize over the batch in this many lax.map "
        "chunks inside one jitted program (shrinks peak HBM ~chunks-fold "
        "at large --batch-size, e.g. the Swin family at batch 24 full-res; "
        "ignored when the batch is not divisible)",
    )
    p.add_argument(
        "--pipeline",
        type=int,
        default=1,
        help="split the channel-AR walk into this many interleaved "
        "sub-batches (overlaps host coding with device dispatches; part "
        "of the LANE stream layout — decode needs the same value). The "
        "bench ships the WACNN flagship at --pipeline 2 with "
        "--fused-encode",
    )
    p.add_argument(
        "--prefetch",
        action="store_true",
        help="upload batch i+1 to the device while batch i codes "
        "(steady-state pipelining via the codec prefetch hook). Big win "
        "on direct-attached hardware; leave OFF through a tunneled "
        "link, where a concurrent bulk upload starves every other "
        "transfer (measured 100x decode slowdown — PERF.md round 4)",
    )
    p.add_argument(
        "--profile-dir",
        type=str,
        default=None,
        help="capture a jax.profiler trace of the eval into this directory",
    )
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument(
        "-p", "--path", dest="paths", type=str, nargs="*", required=True
    )
    return p


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = setup_args().parse_args(argv)
    filepaths = collect_images(args.dataset)
    if not filepaths:
        print("Error: no images found in directory.", file=sys.stderr)
        sys.exit(1)

    stf_tpu.set_entropy_coder(args.entropy_coder)

    import contextlib

    profiler_ctx = (
        jax.profiler.trace(args.profile_dir)
        if args.profile_dir
        else contextlib.nullcontext()
    )

    results = collections.defaultdict(list)
    with profiler_ctx:
        for run in args.paths:
            model, params = load_checkpoint(run, args.architecture)
            metrics = eval_model(
                model,
                params,
                filepaths,
                args.entropy_estimation,
                args.recon_path,
                args.verbose,
                half=args.half,
                batch_size=args.batch_size,
                backend=args.backend,
                fused_encode={
                    "0": False, "1": True, "split": "split"
                }[args.fused_encode],
                transform_chunks=args.transform_chunks,
                pipeline=args.pipeline,
                prefetch=args.prefetch,
            )
            for k, v in metrics.items():
                results[k].append(v)

    description = (
        "entropy estimation" if args.entropy_estimation else args.entropy_coder
    )
    print(
        json.dumps(
            {
                "name": args.architecture,
                "description": f"Inference ({description})",
                "results": dict(results),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
