"""Per-piece timing of the Swin stage-0 block at bench geometry, plus
machine baselines (copy bandwidth, big-GEMM MFU), to locate where the
analyze transform's time goes. Compute-only timing (repeat-dispatch on
device-resident data minus a 1-dispatch run)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from stf_tpu.layers.swin import Mlp, SwinTransformerBlock
    from stf_tpu.layers.win_attention import (
        WindowAttention,
        shifted_window_region_labels,
    )
    from stf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    B, H, W, C = 8, 256, 384, 48
    nh, ws = 3, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)

    def per_call_s(fn, *args, n=8):
        f = jax.jit(fn)

        def run(reps):
            t0 = time.time()
            out = None
            for _ in range(reps):
                out = f(*args)
            a = jax.tree_util.tree_leaves(out)[0]
            np.asarray(a[(0,) * a.ndim])
            return time.time() - t0

        run(1)
        t1, tn = run(1), run(n)
        return max((tn - t1) / (n - 1), 1e-9)

    nbytes = x.size * 2

    # --- machine baselines ---
    t = per_call_s(lambda a: a + 1.0, x)
    print(f"copy   (+1 on {nbytes/1e6:.0f} MB bf16): {t*1e3:7.2f} ms "
          f"= {2*nbytes/t/1e9:6.0f} GB/s eff")

    big = jnp.asarray(rng.standard_normal((8192, 2048)), jnp.bfloat16)
    bw = jnp.asarray(rng.standard_normal((2048, 2048)), jnp.bfloat16)
    t = per_call_s(lambda a, b: a @ b, big, bw)
    fl = 2 * 8192 * 2048 * 2048
    print(f"bigGEMM 8192x2048x2048 bf16:  {t*1e3:7.2f} ms = "
          f"{fl/t/1e12:5.1f} TF/s")

    # --- stage-0 pieces ---
    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5)
    lnv = ln.init(jax.random.key(0), x)
    lnv = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), lnv)
    t = per_call_s(lambda p, a: ln.apply(p, a), lnv, x)
    print(f"LayerNorm(48):               {t*1e3:7.2f} ms "
          f"= {2*nbytes/t/1e9:6.0f} GB/s eff")

    dq = nn.Dense(3 * C)
    dqv = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), dq.init(jax.random.key(0), x))
    t = per_call_s(lambda p, a: dq.apply(p, a), dqv, x)
    fl = 2 * B * H * W * C * 3 * C
    print(f"qkv Dense 48->144:           {t*1e3:7.2f} ms = "
          f"{fl/t/1e12:5.1f} TF/s ({4*nbytes/t/1e9:4.0f} GB/s)")

    mlp = Mlp(4 * C, C)
    mv = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), mlp.init(jax.random.key(0), x))
    t = per_call_s(lambda p, a: mlp.apply(p, a), mv, x)
    fl = 2 * B * H * W * C * 4 * C * 2
    print(f"MLP 48->192->48:             {t*1e3:7.2f} ms = "
          f"{fl/t/1e12:5.1f} TF/s")

    t = per_call_s(lambda a: jnp.roll(a, (-2, -2), (1, 2)), x)
    print(f"roll:                        {t*1e3:7.2f} ms "
          f"= {2*nbytes/t/1e9:6.0f} GB/s eff")

    wa = WindowAttention(dim=C, window_size=(ws, ws), num_heads=nh)
    wav = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), wa.init(jax.random.key(0), x))
    t = per_call_s(lambda p, a: wa.apply(p, a), wav, x)
    print(f"WindowAttention (no shift):  {t*1e3:7.2f} ms")

    lab = shifted_window_region_labels(H, W, ws, 2)
    t = per_call_s(lambda p, a: wa.apply(p, a, lab), wav, x)
    print(f"WindowAttention (shifted):   {t*1e3:7.2f} ms")

    blk = SwinTransformerBlock(dim=C, num_heads=nh, window_size=ws,
                               shift_size=0)
    bv = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), blk.init(jax.random.key(0), x))
    t = per_call_s(lambda p, a: blk.apply(p, a), bv, x)
    print(f"SwinBlock (W-MSA):           {t*1e3:7.2f} ms")

    blk2 = SwinTransformerBlock(dim=C, num_heads=nh, window_size=ws,
                                shift_size=2)
    b2v = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), blk2.init(jax.random.key(0), x))
    t = per_call_s(lambda p, a: blk2.apply(p, a), b2v, x)
    print(f"SwinBlock (SW-MSA):          {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
