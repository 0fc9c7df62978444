"""FLOPs / parameter counting.

The reference uses thop's `profile()` (`flops_param_calculate.py:32-42`)
plus hand-written per-block `flops()` methods on DYSTF. Here the compiled
XLA computation itself is the source of truth: `jax.jit(...).lower()
.compile().cost_analysis()` reports the exact FLOPs XLA will execute —
more faithful than op-counting heuristics, and it covers fused/rematerialized
code paths for free.
"""

from typing import Dict, Tuple


def count_params(params) -> int:
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def model_flops(
    model, params, input_shape: Tuple[int, ...] = (1, 256, 256, 3)
) -> Dict[str, float]:
    """FLOPs of the eval forward pass, per XLA cost analysis."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(
        lambda p, x: model.apply({"params": p}, x, training=False)
    )
    compiled = fn.lower(params, jnp.zeros(input_shape, jnp.float32)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
        "params": count_params(params),
    }


def main(argv=None):
    import argparse

    import jax

    from ..zoo import models

    p = argparse.ArgumentParser(description="FLOPs/params calculator")
    p.add_argument("-a", "--architecture", default="stf")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    model = models[args.architecture]()
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, args.height, args.width, 3)),
        training=False,
    )
    stats = model_flops(
        model, variables["params"], (1, args.height, args.width, 3)
    )
    print(
        f"{args.architecture}: params {stats['params'] / 1e6:.2f}M, "
        f"forward {stats['flops'] / 1e9:.2f} GFLOPs "
        f"({stats['bytes_accessed'] / 1e9:.2f} GB accessed) "
        f"@ {args.height}x{args.width}"
    )
    return stats


if __name__ == "__main__":
    main()
