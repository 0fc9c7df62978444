"""Compute-only MFU probe for the flagship transforms (bench.py's probe,
standalone): N back-to-back dispatches on device-resident input minus a
1-dispatch run cancels the tunnel's fixed latency. Usage:

    python tools/mfu_probe.py [cnn|stf] [--steps 300|3000]

Loads the cached bench prelude checkpoint for the given step budget
(default: the legacy 300-step cache, so A/Bs against r4's recorded
numbers need no retrain).
"""

import argparse
import os
import sys
import time

import numpy as np

_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _DIR)

from bench import PEAK_BF16_FLOPS, PRELUDE_LMBDA, ckpt_path, smooth_batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model", nargs="?", default="cnn")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from stf_tpu.models import Codec
    from stf_tpu.training import create_train_state
    from stf_tpu.utils.cache import enable_compile_cache
    from stf_tpu.zoo import models

    enable_compile_cache()
    name = args.model
    model = models[name]()
    lmbda = PRELUDE_LMBDA[name]
    ckpt = ckpt_path(name, lmbda, args.steps)
    state = create_train_state(
        model, jax.random.key(0), input_shape=(1, 256, 256, 3)
    )
    with open(ckpt, "rb") as f:
        params = serialization.from_bytes(state.params, f.read())

    chunks = {"cnn": 1, "stf": 3}[name]
    codec = Codec(
        model, params, dtype=jnp.bfloat16,
        analyze_chunks=chunks, synth_chunks=chunks,
    )
    batch = (smooth_batch(24, 512, 768, seed=999) * 255).astype(np.uint8)
    x_dev = jnp.asarray(batch)
    y_res, _ = codec._analyze(codec.params, x_dev)

    def per_call_s(call, pick, n):
        def run(reps):
            t0 = time.time()
            out = None
            for _ in range(reps):
                out = call()
            a = pick(out)
            np.asarray(a[(0,) * a.ndim])
            return time.time() - t0

        run(1)
        t1, tn = run(1), run(n)
        return max((tn - t1) / (n - 1), 1e-9)

    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in PEAK_BF16_FLOPS.items() if k in kind), None)

    def flops_of(jitted, *a):
        ca = jitted.lower(*a).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", -1.0))

    t_an = per_call_s(
        lambda: codec._analyze(codec.params, x_dev), lambda o: o[0],
        args.reps,
    )
    t_sy = per_call_s(
        lambda: codec._synth(codec.params, y_res), lambda o: o, args.reps
    )
    f_an = flops_of(codec._analyze, codec.params, x_dev)
    f_sy = flops_of(codec._synth, codec.params, y_res)
    print(
        f"[{name} s{args.steps}] analyze {t_an:.4f}s"
        f" ({f_an / 1e12:.2f} TF, {f_an / t_an / peak * 100:.1f}% MFU)"
        f"  synthesize {t_sy:.4f}s"
        f" ({f_sy / 1e12:.2f} TF, {f_sy / t_sy / peak * 100:.1f}% MFU)"
    )


if __name__ == "__main__":
    main()
