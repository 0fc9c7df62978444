"""Generate the golden-RD regression artifact (run from repo root):

    python tests/data/make_golden_rd.py

Trains a tiny WACNN briefly (seed-deterministic) on synthetic images, then
runs the REAL codec on two held-out images and freezes (bpp, psnr) into
tests/data/golden_rd/golden.json. tests/test_golden_rd.py repeats the
same deterministic training and asserts the RD point hasn't drifted — the in-repo
stand-in for published-checkpoint RD validation while the real .pth.tar
files can't be fetched (no network).
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

OUT = os.path.join(os.path.dirname(__file__), "golden_rd")
SMALL = dict(N=32, M=40, num_slices=4, max_support_slices=2)
LMBDA = 0.01
STEPS = 120


def synth_image(i: int, size: int) -> np.ndarray:
    """Deterministic smooth-texture image (bands + gradients)."""
    yy, xx = np.mgrid[0:size, 0:size] / size
    r = 0.5 + 0.25 * np.sin(2 * np.pi * (xx * (2 + i % 3) + 0.1 * i))
    g = 0.5 + 0.25 * np.cos(2 * np.pi * (yy * (1 + i % 4) - 0.07 * i))
    b = 0.5 + 0.2 * np.sin(2 * np.pi * (xx + yy) * (1 + i % 2))
    return np.stack([r, g, b], -1).astype(np.float32)


def train_batches(batch: int, size: int, steps: int):
    for s in range(steps):
        yield np.stack([synth_image(s * batch + j, size) for j in range(batch)])


def main():
    import jax.numpy as jnp

    from stf_tpu.models import WACNN, Codec
    from stf_tpu.training import create_train_state, make_train_step

    model = WACNN(**SMALL)
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

    # held-out eval through the REAL codec
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
        "model_kwargs": SMALL,
        "lmbda": LMBDA,
        "steps": STEPS,
        "bpp": float(bpp),
        "psnr": float(psnr),
    }
    with open(os.path.join(OUT, "golden.json"), "w") as f:
        json.dump(golden, f, indent=2)
    print(json.dumps(golden, indent=2))


if __name__ == "__main__":
    main()
