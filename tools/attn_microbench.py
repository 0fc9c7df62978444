"""Break WindowAttention's 32 ms (stage-0 stf geometry) into its internal
ops: pack transpose, scores dot, penalty+softmax, att@v dot, unpack."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from stf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    B, H, W, C = 8, 256, 384, 48
    nh, ws, G = 3, 4, 8
    hd = C // nh
    N = ws * ws
    P, Q = H // ws, W // ws
    nW = P * Q
    GN = G * N
    BG = B * nW // G
    rng = np.random.default_rng(0)

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

    qkv = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), jnp.bfloat16)

    def pack(a):
        a = a.reshape(B, P, ws, Q, ws, 3, nh, hd)
        a = a.transpose(5, 6, 0, 1, 3, 2, 4, 7)
        return a.reshape(3, nh, BG, GN, hd)

    t = per_call_s(pack, qkv)
    nbytes = qkv.size * 2
    print(f"pack transpose 8-D ({nbytes/1e6:.0f} MB): {t*1e3:7.2f} ms "
          f"({2*nbytes/t/1e9:4.0f} GB/s)")

    # two-step variant: 6-D window partition then 5-D head split
    def pack2(a):
        a = a.reshape(B, P, ws, Q, ws, 3 * C)
        a = a.transpose(0, 1, 3, 2, 4, 5)          # 6-D, C minor intact
        a = a.reshape(B * nW, N, 3, nh, hd)
        a = a.transpose(2, 3, 0, 1, 4)             # 5-D
        return a.reshape(3, nh, BG, GN, hd)

    t = per_call_s(pack2, qkv)
    print(f"pack two-step 6D+5D:         {t*1e3:7.2f} ms")

    q = jnp.asarray(rng.standard_normal((nh, BG, GN, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((nh, BG, GN, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((nh, BG, GN, hd)), jnp.bfloat16)

    t = per_call_s(lambda a, b: jnp.einsum(
        "hgnd,hgmd->hgnm", a, b, preferred_element_type=jnp.float32), q, k)
    fl = 2 * nh * BG * GN * GN * hd
    print(f"scores dot (f32 out):        {t*1e3:7.2f} ms = {fl/t/1e12:5.1f} TF/s")

    att = jnp.asarray(rng.standard_normal((nh, BG, GN, GN)), jnp.float32)
    t = per_call_s(lambda a: jax.nn.softmax(a, axis=-1), att)
    ab = att.size * 4
    print(f"softmax f32 ({ab/1e6:.0f} MB):       {t*1e3:7.2f} ms "
          f"({2*ab/t/1e9:4.0f} GB/s)")

    win = np.repeat(np.arange(nW, dtype=np.int32), N).reshape(nW // G, GN)
    winj = jnp.asarray(win)

    def pen_softmax(a):
        p = jnp.where(winj[:, None, :] != winj[:, :, None],
                      np.float32(-1e5), np.float32(0))
        a = (a.reshape(nh, B, nW // G, GN, GN) + p[None, None]).reshape(a.shape)
        return jax.nn.softmax(a, axis=-1)

    t = per_call_s(pen_softmax, att)
    print(f"penalty+softmax:             {t*1e3:7.2f} ms")

    t = per_call_s(lambda a, b: jnp.einsum(
        "hgnm,hgmd->hgnd", a, b,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16), att, v)
    fl = 2 * nh * BG * GN * GN * hd
    print(f"att@v dot (f32 att):         {t*1e3:7.2f} ms = {fl/t/1e12:5.1f} TF/s")

    attb = att.astype(jnp.bfloat16)
    t = per_call_s(lambda a, b: jnp.einsum(
        "hgnm,hgmd->hgnd", a, b,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16), attb, v)
    print(f"att@v dot (bf16 att):        {t*1e3:7.2f} ms")

    out = jnp.asarray(rng.standard_normal((nh, BG, GN, hd)), jnp.bfloat16)

    def unpack(a):
        a = a.reshape(nh, B, P, Q, ws, ws, hd)
        a = a.transpose(1, 2, 4, 3, 5, 0, 6)
        return a.reshape(B, H, W, C)

    t = per_call_s(unpack, out)
    print(f"unpack transpose 7-D:        {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
