"""Trained-weights RD parity against the reference oracle.

Every other parity test runs on RANDOMLY INITIALIZED torch models; nothing
demonstrated that a *trained* reference checkpoint imports to the same RD
point. This is the in-environment proxy for published-checkpoint
validation (the real .pth.tar files need network egress): train the torch
reference WACNN itself for a short deterministic run with the reference's
own loss recipe (`/root/reference/train.py:39-59` — lambda*255²*MSE + bpp
main objective, separate aux optimizer on the bottleneck quantiles,
`train.py:99-123`), import the TRAINED state_dict through
`zoo/torch_import`, and assert our real-codec eval reproduces the
oracle's own real-codec eval (bpp + PSNR) on held-out images.

Slow (~minutes of torch CPU training); skipped when /root/reference is
absent.
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

STEPS = 60
BATCH = 4
PATCH = 64
LMBDA = 0.013  # the bench/published-band operating point


def _synth_batch(step: int):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
    from make_golden_rd import synth_image

    return np.stack(
        [synth_image(step * BATCH + j, PATCH) for j in range(BATCH)]
    )


@pytest.fixture(scope="module")
def trained_oracle():
    """Short deterministic training of the REAL full-size reference WACNN
    (its hyper path hardcodes M=320, so no tiny config exists)."""
    ref = load_reference()
    import torch

    torch.manual_seed(0)
    import compressai.zoo

    tmodel = compressai.zoo.models["cnn"](192, 320)
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

    for step in range(STEPS):
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
    return ref, tmodel, float(bpp)


def test_trained_oracle_rd_parity(trained_oracle):
    import torch

    import jax.numpy as jnp

    from stf_tpu.models import WACNN, Codec
    from stf_tpu.zoo.torch_import import import_state_dict

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
    from make_golden_rd import synth_image

    ref, tmodel, train_bpp = trained_oracle
    # the short run must have actually moved the model into a trained
    # regime (random init sits at ~19 bpp on these images)
    assert train_bpp < 8.0, train_bpp

    import jax

    my_model = WACNN()
    variables = my_model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        training=False,
    )
    params = import_state_dict(
        "cnn", variables["params"], tmodel.state_dict()
    )

    x = np.stack([synth_image(10_000 + i, 128) for i in range(2)])
    n_pix = x.shape[0] * x.shape[1] * x.shape[2]

    with torch.no_grad():
        ref_enc = tmodel.compress(torch.from_numpy(to_nchw(x)))
        ref_dec = tmodel.decompress(ref_enc["strings"], ref_enc["shape"])
    ref_bytes = sum(
        len(s) for group in ref_enc["strings"] for s in group
    )
    ref_xhat = np.clip(to_nhwc(ref_dec["x_hat"].numpy()), 0, 1)
    ref_bpp = ref_bytes * 8 / n_pix
    ref_psnr = -10 * np.log10(float(np.mean((x - ref_xhat) ** 2)))

    codec = Codec(my_model, params)
    my_enc = codec.compress(x)
    my_dec = codec.decompress(my_enc["strings"], my_enc["shape"])
    my_bytes = sum(
        len(s) for group in my_enc["strings"] for s in group
    )
    my_xhat = np.clip(np.asarray(my_dec["x_hat"], np.float32), 0, 1)
    my_bpp = my_bytes * 8 / n_pix
    my_psnr = -10 * np.log10(float(np.mean((x - my_xhat) ** 2)))

    print(
        f"oracle: {ref_bpp:.4f} bpp / {ref_psnr:.2f} dB   "
        f"ours: {my_bpp:.4f} bpp / {my_psnr:.2f} dB"
    )
    # the imported TRAINED weights must land on the oracle's RD point:
    # same CDFs + same symbols => near-identical rate; transform parity
    # (atol 5e-3 per pixel) => near-identical distortion
    assert abs(my_bpp - ref_bpp) / ref_bpp < 0.02
    assert abs(my_psnr - ref_psnr) < 0.1
    # reconstructions themselves agree pixelwise, not just in aggregate
    np.testing.assert_allclose(my_xhat, ref_xhat, atol=1e-2)
