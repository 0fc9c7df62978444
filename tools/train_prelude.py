"""Train a bench prelude checkpoint with periodic RD logging.

The bench's operating point must sit in the published table's 0.5-0.8 bpp
band at a defensible quality (VERDICT r4 weak #4: a 300-step prelude
benches realistic *rates* but toy *quality*). This tool runs the same
deterministic prelude recipe as bench.py's `trained_state` for a longer
step budget, logging entropy-estimated bpp + PSNR on the bench warm-up
geometry every `--eval-every` steps so lambda can be re-pointed without
retraining blind. The final params are written to the exact cache filename
`bench.py:ckpt_path` expects.

Run on the real chip (one TPU job at a time):
    python tools/train_prelude.py -m cnn --steps 3000 --lambda 0.013
"""

import argparse
import os
import sys
import time

import numpy as np

_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _DIR)

from bench import PRELUDE_LMBDA, ckpt_path, smooth_batch  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", default="cnn")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--lambda", dest="lmbda", type=float, default=None)
    p.add_argument("--eval-every", type=int, default=250)
    p.add_argument(
        "--out", default=None,
        help="override output path (default: bench ckpt_path for "
        "model/lambda/steps)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from stf_tpu.training import create_train_state, make_train_step
    from stf_tpu.utils.cache import enable_compile_cache
    from stf_tpu.zoo import models

    enable_compile_cache()
    lmbda = args.lmbda if args.lmbda is not None else PRELUDE_LMBDA[args.model]
    out = args.out or ckpt_path(args.model, lmbda, args.steps)

    model = models[args.model]()
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 256, 256, 3)
    )
    step_fn = jax.jit(make_train_step(model, lmbda=lmbda))

    # bench warm-up geometry probe (entropy-estimation forward: tracks the
    # real-coder bpp closely and needs no stream machinery). Evaluated in
    # 256x256 tiles of the 512x768 bench images so the full-size Swin
    # forward is not compiled twice.
    probe = smooth_batch(6, 512, 768, seed=999)
    tiles = probe.reshape(6, 2, 256, 3, 256, 3).transpose(0, 1, 3, 2, 4, 5)
    tiles = jnp.asarray(tiles.reshape(-1, 256, 256, 3))

    @jax.jit
    def rd_probe(params):
        out_f = model.apply(
            {"params": params}, tiles, training=False
        )
        n_pix = tiles.shape[0] * tiles.shape[1] * tiles.shape[2]
        bits = sum(
            -jnp.sum(jnp.log2(lik))
            for lik in out_f["likelihoods"].values()
        )
        mse = jnp.mean((out_f["x_hat"] - tiles) ** 2)
        return bits / n_pix, -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    t0 = time.time()
    for step in range(args.steps):
        batch = smooth_batch(8, 256, 256, seed=step)
        state, logs = step_fn(
            state, jnp.asarray(batch), jax.random.key(step)
        )
        if step % args.eval_every == 0 or step == args.steps - 1:
            bpp, psnr = rd_probe(state.params)
            print(
                f"[{args.model} l={lmbda:g}] step {step}: train bpp "
                f"{float(logs['bpp_loss']):.3f}  probe {float(bpp):.3f} bpp "
                f"/ {float(psnr):.2f} dB  ({time.time() - t0:.0f}s)",
                flush=True,
            )

    params = jax.tree_util.tree_map(np.asarray, state.params)
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
