"""Trained-weights RD parity against the reference oracle.

Every other parity test runs on RANDOMLY INITIALIZED torch models; nothing
demonstrated that a *trained* reference checkpoint imports to the same RD
point. This is the in-environment proxy for published-checkpoint
validation (the real .pth.tar files need network egress): train the torch
reference model itself for a short deterministic run with the reference's
own loss recipe (`/root/reference/train.py:39-59` — lambda*255²*MSE + bpp
main objective, separate aux optimizer on the bottleneck quantiles,
`train.py:99-123`), import the TRAINED state_dict through
`zoo/torch_import`, and assert our real-codec eval reproduces the
oracle's own real-codec eval (bpp + PSNR) on held-out images.

Covers both flagships: WACNN (`cnn`) and the Swin `stf` — the latter
exercises the trickiest importer rules (token-major Linears, rel-pos bias
tables, PatchMerging/PatchSplit layouts) on weights that actually moved.

Slow (~minutes of torch CPU training per family); skipped when
/root/reference is absent.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_oracle import (  # noqa: E402
    load_reference,
    reference_available,
    to_nchw,
    to_nhwc,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not available"
)

BATCH = 4
PATCH = 64
LMBDA = 0.013  # the bench/published-band operating point


def _synth_batch(step: int):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
    from make_golden_rd import synth_image

    return np.stack(
        [synth_image(step * BATCH + j, PATCH) for j in range(BATCH)]
    )


def _train_reference(tmodel, steps: int) -> float:
    """Short deterministic training with the reference recipe
    (`/root/reference/train.py:39-59,99-123`); returns the last-step bpp."""
    import torch

    tmodel.train()
    # reference optimizer split (train.py:99-123): main Adam on everything
    # but the quantiles, aux Adam on the quantiles
    aux_names = {
        n for n, _ in tmodel.named_parameters() if n.endswith("quantiles")
    }
    main_params = [
        p for n, p in tmodel.named_parameters()
        if n not in aux_names and p.requires_grad
    ]
    aux_params = [
        p for n, p in tmodel.named_parameters() if n in aux_names
    ]
    opt = torch.optim.Adam(main_params, lr=1e-4)
    aux_opt = torch.optim.Adam(aux_params, lr=1e-3)

    for step in range(steps):
        x = torch.from_numpy(to_nchw(_synth_batch(step)))
        opt.zero_grad()
        aux_opt.zero_grad()
        out = tmodel(x)
        n_pix = x.shape[0] * x.shape[2] * x.shape[3]
        bpp = sum(
            torch.log(lik).sum() for lik in out["likelihoods"].values()
        ) / (-np.log(2) * n_pix)
        mse = torch.mean((out["x_hat"] - x) ** 2)
        loss = LMBDA * 255 ** 2 * mse + bpp
        loss.backward()
        torch.nn.utils.clip_grad_norm_(main_params, 1.0)
        opt.step()
        aux = tmodel.aux_loss()
        aux.backward()
        aux_opt.step()
    tmodel.eval()
    tmodel.update(force=True)
    return float(bpp)


def _oracle_rd(tmodel, x):
    """Real-codec RD point from the reference oracle itself.

    The oracle's compress/decompress are batch-1-only (decompress reads
    strings[0][0] and reshapes to batch 1 — `cnn.py:296,320`,
    `stf.py:747,770`), so drive it one image at a time."""
    import torch

    total_bytes = 0
    xhats = []
    with torch.no_grad():
        for i in range(x.shape[0]):
            enc = tmodel.compress(torch.from_numpy(to_nchw(x[i : i + 1])))
            dec = tmodel.decompress(enc["strings"], enc["shape"])
            total_bytes += sum(
                len(s) for group in enc["strings"] for s in group
            )
            xhats.append(to_nhwc(dec["x_hat"].numpy()))
    xhat = np.clip(np.concatenate(xhats, axis=0), 0, 1)
    n_pix = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = total_bytes * 8 / n_pix
    psnr = -10 * np.log10(float(np.mean((x - xhat) ** 2)))
    return bpp, psnr, xhat


def _our_rd(name, my_model, tmodel, x):
    """Import the trained state_dict and run OUR real codec (batched)."""
    import jax
    import jax.numpy as jnp

    from stf_tpu.models import Codec
    from stf_tpu.zoo.torch_import import import_state_dict

    variables = my_model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        training=False,
    )
    params = import_state_dict(name, variables["params"], tmodel.state_dict())

    codec = Codec(my_model, params)
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    total_bytes = sum(len(s) for group in enc["strings"] for s in group)
    xhat = np.clip(np.asarray(dec["x_hat"], np.float32), 0, 1)
    n_pix = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = total_bytes * 8 / n_pix
    psnr = -10 * np.log10(float(np.mean((x - xhat) ** 2)))
    return bpp, psnr, xhat


def _held_out(n: int, size: int):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
    from make_golden_rd import synth_image

    return np.stack([synth_image(10_000 + i, size) for i in range(n)])


def _assert_rd_parity(label, ref_rd, my_rd):
    ref_bpp, ref_psnr, ref_xhat = ref_rd
    my_bpp, my_psnr, my_xhat = my_rd
    print(
        f"[{label}] oracle: {ref_bpp:.4f} bpp / {ref_psnr:.2f} dB   "
        f"ours: {my_bpp:.4f} bpp / {my_psnr:.2f} dB"
    )
    # the imported TRAINED weights must land on the oracle's RD point:
    # same CDFs + same symbols => near-identical rate; transform parity
    # (atol 5e-3 per pixel) => near-identical distortion
    assert abs(my_bpp - ref_bpp) / ref_bpp < 0.02
    assert abs(my_psnr - ref_psnr) < 0.1
    # reconstructions themselves agree pixelwise, not just in aggregate
    np.testing.assert_allclose(my_xhat, ref_xhat, atol=1e-2)


@pytest.fixture(scope="module")
def trained_oracle():
    """Short deterministic training of the REAL full-size reference WACNN
    (its hyper path hardcodes M=320, so no tiny config exists)."""
    ref = load_reference()
    import torch

    torch.manual_seed(0)
    import compressai.zoo

    tmodel = compressai.zoo.models["cnn"](192, 320)
    train_bpp = _train_reference(tmodel, steps=60)
    return ref, tmodel, train_bpp


def test_trained_oracle_rd_parity(trained_oracle):
    from stf_tpu.models import WACNN

    ref, tmodel, train_bpp = trained_oracle
    # the short run must have actually moved the model into a trained
    # regime (random init sits at ~19 bpp on these images)
    assert train_bpp < 8.0, train_bpp

    x = _held_out(2, 128)
    _assert_rd_parity(
        "cnn", _oracle_rd(tmodel, x), _our_rd("cnn", WACNN(), tmodel, x)
    )


@pytest.fixture(scope="module")
def trained_oracle_stf():
    """Same recipe on the full-size reference Swin stf (its hyper path
    hardcodes the 384-channel latent — `stf.py:475-507`; at 64x64 patches
    the transforms are light, so full size trains fine on CPU)."""
    ref = load_reference()
    import torch

    torch.manual_seed(0)
    import compressai.zoo

    tmodel = compressai.zoo.models["stf"]()
    train_bpp = _train_reference(tmodel, steps=40)
    return ref, tmodel, train_bpp


def test_trained_oracle_rd_parity_stf(trained_oracle_stf):
    from stf_tpu.models import SymmetricalTransFormer

    ref, tmodel, train_bpp = trained_oracle_stf
    assert train_bpp < 8.0, train_bpp

    x = _held_out(2, 128)
    _assert_rd_parity(
        "stf",
        _oracle_rd(tmodel, x),
        _our_rd("stf", SymmetricalTransFormer(), tmodel, x),
    )
