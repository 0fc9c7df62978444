"""Pallas fused window-attention kernel vs the XLA reference core
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_tpu.layers.pallas_attention import (
    _reference_core,
    pallas_window_attention,
)


@pytest.mark.parametrize(
    "B_,nh,N,hd",
    [
        (8, 4, 16, 16),   # stf-like: window 4, 64ch stage
        (12, 8, 16, 40),  # wacnn attn1: window 4, dim 320
        (4, 8, 64, 24),   # wacnn attn0: window 8, dim 192
    ],
)
def test_kernel_matches_reference(B_, nh, N, hd):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B_, nh, N, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B_, nh, N, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B_, nh, N, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((nh, N, N)), jnp.float32)
    scale = hd ** -0.5

    expected = _reference_core(q, k, v, bias, None, scale)
    got = pallas_window_attention(q, k, v, bias, None, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_kernel_with_shift_mask():
    rng = np.random.default_rng(1)
    B_, nh, N, hd = 8, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((B_, nh, N, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B_, nh, N, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B_, nh, N, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((nh, N, N)), jnp.float32)
    # per-window additive mask with -100 blocks (as SW-MSA produces)
    mask = np.zeros((B_, N, N), np.float32)
    mask[:, : N // 2, N // 2 :] = -100.0
    mask[:, N // 2 :, : N // 2] = -100.0
    mask = jnp.asarray(mask)

    expected = _reference_core(q, k, v, bias, mask, 0.5)
    got = pallas_window_attention(q, k, v, bias, mask, 0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_module_flag_matches_default():
    """WindowAttention(use_pallas=True) in interpret mode == default path."""
    from stf_tpu.layers.win_attention import WindowAttention
    from stf_tpu.layers import pallas_attention

    # NHWC map, 2x3 windows of 4x4 (the module's grid-layout contract)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 8, 12, 32)), jnp.float32
    )
    ref_mod = WindowAttention(dim=32, window_size=(4, 4), num_heads=4)
    variables = ref_mod.init(jax.random.key(0), x)
    expected = ref_mod.apply(variables, x)

    # monkeypatch interpret mode on for the CPU test
    orig = pallas_attention.pallas_window_attention
    try:
        pallas_attention.pallas_window_attention = (
            lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
        )
        fast_mod = WindowAttention(
            dim=32, window_size=(4, 4), num_heads=4, use_pallas=True
        )
        got = fast_mod.apply(variables, x)
    finally:
        pallas_attention.pallas_window_attention = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
