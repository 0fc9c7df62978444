"""Rate-distortion comparison harness: evaluate checkpoints and report
BD-rate vs the reference's published curves.

The reference's reason to exist is its RD numbers
(`/root/reference/results/stf_mse_Kodak.json`, `README.md:82-96`); this
harness is ready to fire the moment real checkpoints are on disk:

    python -m stf_tpu.cli.rd_compare -a cnn -d /path/kodak \
        -p cnn_0035.pth.tar cnn_0067.pth.tar ... \
        --baseline cnn_mse_Kodak

Accepts native msgpack checkpoints and reference `.pth.tar` files (auto-
imported). Missing checkpoint paths are skipped with a notice (exit 0 with
whatever points exist; exit 0 + "no checkpoints" when none do, so CI can
include this unconditionally). With >=2 evaluated points it reports
BD-rate/BD-quality (Bjøntegaard); with 1 point, the interpolated rate
delta vs the baseline curve at that quality.
"""

import argparse
import json
import sys


def setup_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-a", "--architecture", required=True)
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument(
        "-p", "--paths", nargs="+", required=True,
        help="checkpoints, one per RD point (.msgpack or .pth/.pth.tar)",
    )
    p.add_argument(
        "--baseline",
        default=None,
        help="published-curve name (e.g. cnn_mse_Kodak; see "
        "stf_tpu/zoo/published.py) or a JSON file with bpp/quality arrays. "
        "Default: <arch>_mse_Kodak",
    )
    p.add_argument("--entropy-estimation", action="store_true")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--recon-path", default=None, help="save reconstructions")
    return p


def load_baseline(name_or_path: str):
    from ..zoo.published import PUBLISHED_RD

    if name_or_path in PUBLISHED_RD:
        return PUBLISHED_RD[name_or_path]
    with open(name_or_path) as f:
        blob = json.load(f)
    if "bpp" in blob:
        return blob
    # reference results/*.json layout: {"results": {"bpp": [...], "psnr": [...]}}
    res = blob["results"]
    if res.get("psnr") is not None:
        return {"bpp": res["bpp"], "quality": res["psnr"], "metric": "psnr"}
    # MS-SSIM-optimized files store -10*log10(1-MS-SSIM) dB (sometimes
    # under a "psnr" key in the reference's own files)
    return {
        "bpp": res["bpp"], "quality": res["ms-ssim"],
        "metric": "ms-ssim-db",
    }


def main(argv=None):
    import os
    import tempfile

    args = setup_args().parse_args(argv)

    present = [p for p in args.paths if os.path.exists(p)]
    missing = [p for p in args.paths if not os.path.exists(p)]
    for p in missing:
        print(f"skipping missing checkpoint: {p}", file=sys.stderr)
    if not present:
        print(
            json.dumps({"name": args.architecture, "results": None,
                        "note": "no checkpoints present"})
        )
        return 0

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()

    from ..utils.bdrate import bd_quality, bd_rate, rate_delta_at_quality
    from ..zoo import load_any_checkpoint
    from .eval_model import collect_images, eval_model

    filepaths = collect_images(args.dataset)
    if not filepaths:
        print("Error: no images found in directory.", file=sys.stderr)
        return 1

    baseline = load_baseline(
        args.baseline or f"{args.architecture}_mse_Kodak"
    )

    # compare in the BASELINE's quality metric: PSNR curves vs eval PSNR,
    # MS-SSIM curves vs -10*log10(1 - MS-SSIM) dB (never mix the two)
    import math

    metric = baseline.get("metric", "psnr")
    if metric == "ms-ssim-db" and args.entropy_estimation:
        print(
            "Error: --entropy-estimation computes no MS-SSIM; use a PSNR "
            "baseline or run real coding.",
            file=sys.stderr,
        )
        return 1

    bpps, qualities = [], []
    recon = args.recon_path or tempfile.mkdtemp(prefix="rd_recon_")
    for path in present:
        model, params = load_any_checkpoint(path, args.architecture)
        metrics = eval_model(
            model,
            params,
            filepaths,
            entropy_estimation=args.entropy_estimation,
            recon_path=recon,
            batch_size=args.batch_size,
        )
        if metric == "ms-ssim-db":
            q = -10 * math.log10(max(1 - metrics["ms-ssim"], 1e-12))
        else:
            q = metrics["psnr"]
        bpps.append(metrics["bpp"])
        qualities.append(q)
        print(
            f"{path}: bpp={metrics['bpp']:.4f} {metric}={q:.2f}",
            file=sys.stderr,
        )

    out = {
        "name": args.architecture,
        "dataset": args.dataset,
        "baseline": args.baseline or f"{args.architecture}_mse_Kodak",
        "metric": metric,
        "results": {"bpp": bpps, metric: qualities},
    }
    if len(bpps) >= 2:
        out["bd_rate_pct"] = bd_rate(
            baseline["bpp"], baseline["quality"], bpps, qualities
        )
        out["bd_quality_db"] = bd_quality(
            baseline["bpp"], baseline["quality"], bpps, qualities
        )
    else:
        try:
            out["rate_delta_pct"] = rate_delta_at_quality(
                baseline["bpp"], baseline["quality"], bpps[0], qualities[0]
            )
        except ValueError as e:
            out["rate_delta_pct"] = None
            out["note"] = str(e)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
