"""Variant layouts for the packed attention core: keep C (=nh*hd) minor
everywhere so no hd-minor transpose is ever materialized, and let the two
dots carry nh as a middle batch dim. Measures end-to-end attention-core
time from the qkv map to the proj-ready map at stf stage-0 geometry."""

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
    scale = hd ** -0.5

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
    win = np.repeat(np.arange(nW, dtype=np.int32), N).reshape(nW // G, GN)
    winj = jnp.asarray(win)

    # current shipping core (pack/unpack through hd-minor layouts)
    def core_current(a):
        a = a.reshape(B, P, ws, Q, ws, 3, nh, hd)
        a = a.transpose(5, 6, 0, 1, 3, 2, 4, 7)
        a = a.reshape(3, nh, BG, GN, hd)
        q, k, v = a[0], a[1], a[2]
        att = jnp.einsum("hgnd,hgmd->hgnm", q * scale, k,
                         preferred_element_type=jnp.float32)
        att = (att.reshape(nh, B, nW // G, GN, GN)
               + jnp.where(winj[:, None, :] != winj[:, :, None],
                           np.float32(-1e5), np.float32(0))[None, None]
               ).reshape(att.shape)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("hgnm,hgmd->hgnd", att, v,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
        o = o.reshape(nh, B, P, Q, ws, ws, hd)
        o = o.transpose(1, 2, 4, 3, 5, 0, 6)
        return o.reshape(B, H, W, C)

    t = per_call_s(core_current, qkv)
    print(f"core current (hd-minor packs):   {t*1e3:7.2f} ms")

    # C-minor variant: only the window-partition 6-D transpose; nh rides
    # as a middle batch dim inside the dots
    def core_cminor(a):
        a = a.reshape(B, P, ws, Q, ws, 3 * C)
        a = a.transpose(0, 1, 3, 2, 4, 5)           # C minor intact
        a = a.reshape(BG, GN, 3, nh, hd)
        q = a[:, :, 0]
        k = a[:, :, 1]
        v = a[:, :, 2]                               # (BG, GN, nh, hd)
        att = jnp.einsum("gnhd,gmhd->ghnm", q * scale, k,
                         preferred_element_type=jnp.float32)
        att = (att.reshape(B, nW // G, nh, GN, GN)
               + jnp.where(winj[:, None, :] != winj[:, :, None],
                           np.float32(-1e5), np.float32(0))[:, None][None]
               ).reshape(att.shape)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("ghnm,gmhd->gnhd", att, v,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
        o = o.reshape(B, P, Q, ws, ws, C)
        o = o.transpose(0, 1, 3, 2, 4, 5)           # C minor intact
        return o.reshape(B, H, W, C)

    t = per_call_s(core_cminor, qkv)
    print(f"core C-minor (middle batch nh):  {t*1e3:7.2f} ms")

    # same but bf16 score storage (softmax still computes exp in f32 via
    # upcast inside the fused pass)
    def core_cminor_bf16(a):
        a = a.reshape(B, P, ws, Q, ws, 3 * C)
        a = a.transpose(0, 1, 3, 2, 4, 5)
        a = a.reshape(BG, GN, 3, nh, hd)
        q, k, v = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        att = jnp.einsum("gnhd,gmhd->ghnm", q * scale, k)  # bf16 out
        att = (att.reshape(B, nW // G, nh, GN, GN)
               + jnp.where(winj[:, None, :] != winj[:, :, None],
                           np.float32(-1e5), np.float32(0)).astype(
                               jnp.bfloat16)[:, None][None]
               ).reshape(att.shape)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1
                             ).astype(jnp.bfloat16)
        o = jnp.einsum("ghnm,gmhd->gnhd", att, v)
        o = o.reshape(B, P, Q, ws, ws, C)
        o = o.transpose(0, 1, 3, 2, 4, 5)
        return o.reshape(B, H, W, C)

    t = per_call_s(core_cminor_bf16, qkv)
    print(f"core C-minor bf16 scores:        {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
