"""Fused window-attention kernel (Pallas/Mosaic TPU).

Computes, entirely in VMEM, the attention core of (S)W-MSA for a block of
windows per program:  scores = q·kᵀ·scale + rel-pos-bias (+ shift mask) →
softmax → ·v.  The qkv / output projections stay as XLA matmuls (large
MXU-friendly GEMMs); what this kernel removes is the HBM round trips of the
(B·nW, heads, N, N) attention tensors — the only intermediates bigger than
the activations themselves.

Windows are tiny (N = window² = 16 or 64 tokens), so each program processes
`windows_per_block` of them for one head: q/k/v blocks are (W, N, hd), and
the per-window matmuls unroll statically.

The `interpret=True` path runs on CPU for tests; `window_attention_core`
falls back to pure jnp when Pallas is unavailable for the platform.

Measured on a v5e chip (batch-24 Kodak shapes): XLA's batched-matmul
lowering beats this kernel ~10x for these tiny windows (N=16/64 tokens,
head_dim 16-40 — far below the 128x128 MXU tile), so `use_pallas` stays
off by default; the kernel remains as the fused building block for larger
window/head configurations where the attention tensors stop fitting the
fusion budget.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _reference_core(q, k, v, bias, mask, scale):
    """Pure-XLA attention core; also the fallback path.

    q,k,v: (B_, nh, N, hd); bias: (nh, N, N); mask: (B_, N, N) or None.
    """
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = attn + bias[None]
    if mask is not None:
        attn = attn + mask[:, None]
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum(
        "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
    )


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, scale, W):
    # refs: q/k/v (W, 1, N, hd); bias (1, N, N); mask (W, N, N); out like q
    for w in range(W):
        q = q_ref[w, 0] * scale  # (N, hd)
        k = k_ref[w, 0]
        v = v_ref[w, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, N)
        s = s + bias_ref[0] + mask_ref[w]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out_ref[w, 0] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def pallas_window_attention(
    q, k, v, bias, mask=None, scale=1.0, windows_per_block=8, interpret=False
):
    """Fused attention core. Shapes as `_reference_core`; returns (B_, nh,
    N, hd)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B_, nh, N, hd = q.shape
    W = windows_per_block
    while B_ % W != 0:
        W //= 2
    W = max(W, 1)

    if mask is None:
        mask_full = jnp.zeros((B_, N, N), q.dtype)
    else:
        mask_full = jnp.asarray(mask, q.dtype)

    del pltpu  # only VMEM (default) blocks are needed
    grid = (B_ // W, nh)
    qkv_spec = pl.BlockSpec((W, 1, N, hd), lambda b, h: (b, h, 0, 0))
    bias_spec = pl.BlockSpec((1, N, N), lambda b, h: (h, 0, 0))
    mask_spec = pl.BlockSpec((W, N, N), lambda b, h: (b, 0, 0))

    kernel = functools.partial(_attn_kernel, scale=scale, W=W)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias, mask_full)


def window_attention_core(
    q, k, v, bias, mask=None, scale=1.0, use_pallas=False, interpret=False
):
    """Dispatch between the fused Pallas kernel and the XLA fallback."""
    if not use_pallas:
        return _reference_core(q, k, v, bias, mask, scale)
    try:
        return pallas_window_attention(
            q, k, v, bias, mask, scale, interpret=interpret
        )
    except Exception:
        return _reference_core(q, k, v, bias, mask, scale)
