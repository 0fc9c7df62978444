"""Produce RD_r05.json: a BD-rate artifact of OUR framework vs the trained
reference oracle, end to end through the production `cli/rd_compare`
harness.

Published .pth.tar checkpoints need network egress this environment does
not have (VERDICT r4 missing #1), so the oracle is trained in-place: the
real torch reference WACNN at several lambdas with the reference's own
recipe (shared with tests/test_trained_oracle_rd.py), each state_dict
imported through `zoo/torch_import` and written as a native msgpack
checkpoint. The oracle's OWN real-codec RD curve (batch-1 compress/
decompress per image) becomes the --baseline file; `rd_compare` then
evaluates our checkpoints with our real codec against it. BD-rate ≈ 0
demonstrates trained-weights parity through the exact harness that will
consume the real published checkpoints when egress exists.

CPU-heavy (~minutes per lambda of torch training). Run with no other CPU
jobs:  python tools/make_rd_r05.py
"""

import json
import os
import sys

import numpy as np

_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _DIR)
sys.path.insert(0, os.path.join(_DIR, "tests"))
sys.path.insert(0, os.path.join(_DIR, "tests", "data"))

LAMBDAS = (0.0035, 0.013, 0.045)
STEPS = 60
EVAL_IMAGES = 4
EVAL_SIZE = 192


def main():
    from make_golden_rd import synth_image
    from reference_oracle import load_reference, reference_available
    from test_trained_oracle_rd import _oracle_rd, _train_reference

    if not reference_available():
        raise SystemExit("reference tree not available")
    load_reference()

    import torch

    from stf_tpu.cli.rd_compare import main as rd_main
    from stf_tpu.models import WACNN
    from stf_tpu.zoo.checkpoint import save_checkpoint
    from stf_tpu.zoo.torch_import import import_state_dict

    import jax
    import jax.numpy as jnp
    from PIL import Image

    work = os.path.join(_DIR, ".rd_r05_work")
    os.makedirs(work, exist_ok=True)

    # held-out eval set on disk for the CLI harness
    img_dir = os.path.join(work, "kodak_synth")
    os.makedirs(img_dir, exist_ok=True)
    x_eval = np.stack(
        [synth_image(20_000 + i, EVAL_SIZE) for i in range(EVAL_IMAGES)]
    )
    for i, img in enumerate(x_eval):
        Image.fromarray((img * 255 + 0.5).astype(np.uint8)).save(
            os.path.join(img_dir, f"img{i}.png")
        )
    # the oracle must see EXACTLY the pixels the CLI will load (uint8 PNG)
    x_eval = (
        np.stack(
            [
                np.asarray(
                    Image.open(os.path.join(img_dir, f"img{i}.png"))
                )
                for i in range(EVAL_IMAGES)
            ]
        ).astype(np.float32)
        / 255.0
    )

    my_model = WACNN()
    variables = my_model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        training=False,
    )

    oracle_bpp, oracle_psnr, ours_ckpts = [], [], []
    import compressai.zoo

    for lmbda in LAMBDAS:
        torch.manual_seed(0)
        tmodel = compressai.zoo.models["cnn"](192, 320)
        import test_trained_oracle_rd as tor

        tor.LMBDA = lmbda  # the shared trainer reads the module global
        bpp_train = _train_reference(tmodel, steps=STEPS)
        print(f"[oracle l={lmbda:g}] trained ({bpp_train:.2f} train bpp)")

        bpp, psnr, _ = _oracle_rd(tmodel, x_eval)
        print(f"[oracle l={lmbda:g}] RD {bpp:.4f} bpp / {psnr:.2f} dB")
        oracle_bpp.append(bpp)
        oracle_psnr.append(psnr)

        params = import_state_dict(
            "cnn", variables["params"], tmodel.state_dict()
        )
        ckpt = os.path.join(work, f"cnn_oracle_l{lmbda:g}.msgpack")
        save_checkpoint(ckpt, "cnn", params)
        ours_ckpts.append(ckpt)

    baseline = os.path.join(work, "oracle_curve.json")
    with open(baseline, "w") as f:
        json.dump(
            {"bpp": oracle_bpp, "quality": oracle_psnr, "metric": "psnr"}, f
        )

    # run the production harness, capture its JSON line
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = rd_main(
            [
                "-a", "cnn",
                "-d", img_dir,
                "-p", *ours_ckpts,
                "--baseline", baseline,
            ]
        )
    assert rc == 0, buf.getvalue()
    report = json.loads(buf.getvalue())
    report["oracle"] = {
        "bpp": oracle_bpp, "psnr": oracle_psnr,
        "lambdas": list(LAMBDAS), "train_steps": STEPS,
        "note": (
            "baseline curve = the SAME torch reference model's own "
            "real-codec eval on the same images; BD-rate ~ 0 demonstrates "
            "trained-weight import parity through cli/rd_compare"
        ),
    }
    out_path = os.path.join(_DIR, "RD_r05.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
