"""Generate the Swin-family golden-RD artifact (run from repo root):

    python tests/data/make_golden_rd_stf.py

Swin twin of make_golden_rd.py: trains a tiny SymmetricalTransFormer
briefly (seed-deterministic) on the same synthetic images, runs the REAL
codec on two held-out images, and freezes (bpp, psnr) into
tests/data/golden_rd/golden_stf.json. tests/test_golden_rd_stf.py repeats
the training and asserts the point hasn't drifted — the stf bench ships
bf16+lane, and LayerNorm/attention stacks have different bf16 sensitivity
than conv/GDN stacks, so the WACNN guard does not transfer
(reference curve being stood in for: results/stf_mse_Kodak.json:2-17).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from make_golden_rd import synth_image, train_batches  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "golden_rd")
TINY = dict(
    embed_dim=8,
    depths=(1, 1, 2, 1),
    num_heads=(1, 2, 4, 4),
    num_slices=4,
    drop_path_rate=0.1,
)
LMBDA = 0.01
STEPS = 120


def main():
    import jax.numpy as jnp

    from stf_tpu.models import Codec, SymmetricalTransFormer
    from stf_tpu.training import create_train_state, make_train_step

    model = SymmetricalTransFormer(**TINY)
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 64, 64, 3)
    )
    step = jax.jit(make_train_step(model, lmbda=LMBDA))
    rng = jax.random.key(1)
    for i, batch in enumerate(train_batches(8, 64, STEPS)):
        state, metrics = step(state, jnp.asarray(batch), rng)
        if i % 25 == 0:
            print(f"step {i}: loss {float(metrics['loss']):.4f}")

    os.makedirs(OUT, exist_ok=True)

    codec = Codec(model, state.params)
    x = np.stack([synth_image(10_000 + i, 128) for i in range(2)])
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    x_hat = np.clip(np.asarray(dec["x_hat"], np.float32), 0, 1)
    n_bytes = sum(len(s) for s in enc["strings"][0]) + sum(
        len(s) for s in enc["strings"][1]
    )
    bpp = n_bytes * 8 / (x.shape[0] * x.shape[1] * x.shape[2])
    mse = float(np.mean((x - x_hat) ** 2))
    psnr = -10 * np.log10(mse)
    golden = {
        "model_kwargs": TINY,
        "lmbda": LMBDA,
        "steps": STEPS,
        "bpp": float(bpp),
        "psnr": float(psnr),
    }
    with open(os.path.join(OUT, "golden_stf.json"), "w") as f:
        json.dump(golden, f, indent=2)
    print(json.dumps(golden, indent=2))


if __name__ == "__main__":
    main()
