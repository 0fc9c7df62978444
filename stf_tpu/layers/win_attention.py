"""Shifted-window multi-head attention on NHWC feature maps.

Functional rebuild of the reference's Swin-style blocks
(`compressai/layers/win_attention.py`): window partition/reverse as pure
reshapes, W-MSA with a learned relative-position-bias table, SW-MSA via
cyclic roll + additive mask. Unlike the reference there are no NCHW<->NHWC
permutes — everything stays NHWC, and window batches land as one big batched
matmul on the MXU.

Shapes are static under jit, so the shifted-window mask is precomputed with
NumPy at trace time (it depends only on H, W, window_size, shift_size).
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv, conv1x1, conv3x3, gelu


def window_partition(x, window_size: int):
    """(B, H, W, C) -> (B * H/ws * W/ws, ws*ws, C)."""
    B, H, W, C = x.shape
    ws = window_size
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows, window_size: int, H: int, W: int):
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    ws = window_size
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Static pairwise relative-position index table (wh*ww, wh*ww).

    Same indexing scheme as the reference (`win_attention.py:59-74`): the
    2-D relative coordinate (dh, dw) in [-(wh-1), wh-1] x [-(ww-1), ww-1] is
    flattened as (dh + wh - 1) * (2*ww - 1) + (dw + ww - 1).
    """
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    )  # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def shifted_window_mask(H: int, W: int, window_size: int, shift_size: int):
    """Additive (0 / -100) attention mask for SW-MSA, shape (nW, N, N).

    Built exactly as the reference does on the fly (`win_attention.py:159-
    179`), but with NumPy at trace time since H/W are static under jit.
    """
    img_mask = np.zeros((1, H, W, 1), np.float32)
    slices = (
        slice(0, -window_size),
        slice(-window_size, -shift_size),
        slice(-shift_size, None),
    )
    cnt = 0
    for h in slices:
        for w in slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    ws = window_size
    mw = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA over an NHWC map whose H/W are window multiples: x is
    (B, H, W, C), returned in the same shape.

    TPU-first grid layout: the window/token/head axes come from
    contiguity-preserving reshapes of the map itself, so no window
    partition/reverse or qkv head transposes ever materialize in HBM —
    the only data movements are the attention dots themselves (measured:
    the flattened-window form spent several full activation-sized HBM
    passes per block on 5-D/6-D transposes, capping the Swin analyze at
    ~1% MFU on a v5e).

    With `use_pallas=True` the attention core (scores + bias + mask +
    softmax + weighted sum) runs as one fused Pallas kernel in VMEM
    (layers/pallas_attention.py); the qkv/out projections remain XLA GEMMs.
    """

    dim: int
    window_size: tuple  # (wh, ww)
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        B, H, W, C = x.shape
        wh, ww = self.window_size
        P, Q = H // wh, W // ww
        nh = self.num_heads
        hd = self.dim // nh
        scale = self.qk_scale or hd ** -0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        # (B, P, i, Q, j, 3, h, d): every split keeps row-major contiguity
        qkv = qkv.reshape(B, P, wh, Q, ww, 3, nh, hd)
        q = qkv[..., 0, :, :]
        k = qkv[..., 1, :, :]
        v = qkv[..., 2, :, :]  # (B, P, i, Q, j, h, d)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * wh - 1) * (2 * ww - 1), nh),
        )
        idx = relative_position_index(wh, ww).reshape(-1)
        rel_bias = bias_table[idx].reshape(wh * ww, wh * ww, nh)
        rel_bias = rel_bias.transpose(2, 0, 1)  # (nh, N, N)

        if self.use_pallas:
            out = self._pallas_core(q, k, v, rel_bias, mask, scale)
        else:
            # (h, i, j, k, l) token-pair bias
            bias_g = rel_bias.reshape(nh, wh, ww, wh, ww)
            attn = jnp.einsum(
                "bpiqjhd,bpkqlhd->bpqhijkl", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            attn = attn + bias_g[None, None, None]
            if mask is not None:
                # (nW, N, N) -> (P, Q, i, j, k, l); window order is
                # (P, Q) row-major by construction (shifted_window_mask)
                m = jnp.asarray(mask).reshape(P, Q, wh, ww, wh, ww)
                attn = attn + m[None, :, :, None]
            attn = attn.reshape(B, P, Q, nh, wh, ww, wh * ww)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = attn.reshape(B, P, Q, nh, wh, ww, wh, ww)
            out = jnp.einsum(
                "bpqhijkl,bpkqlhd->bpiqjhd", attn, v,
                preferred_element_type=jnp.float32,
            )
        out = out.reshape(B, H, W, C)
        return nn.Dense(self.dim, name="proj")(out)

    def _pallas_core(self, q, k, v, rel_bias, mask, scale):
        """Opt-in fused-kernel path: flatten grid -> (B*nW, nh, N, hd)."""
        from .pallas_attention import window_attention_core

        B, P, wh, Q, ww, nh, hd = q.shape
        N = wh * ww

        def flat(t):  # (B,P,i,Q,j,h,d) -> (B*nW, nh, N, hd)
            t = t.transpose(0, 1, 3, 5, 2, 4, 6)
            return t.reshape(B * P * Q, nh, N, hd)

        if mask is not None:
            nW = mask.shape[0]
            mask_full = jnp.broadcast_to(
                jnp.asarray(mask)[None], (B, nW, N, N)
            ).reshape(B * nW, N, N)
        else:
            mask_full = None
        out = window_attention_core(
            flat(q), flat(k), flat(v), rel_bias, mask_full, scale,
            use_pallas=True,
        )
        out = out.reshape(B, P, Q, nh, wh, ww, hd)
        return out.transpose(0, 1, 4, 2, 5, 3, 6)  # -> (B,P,i,Q,j,h,d)


class WinBasedAttention(nn.Module):
    """Standalone (S)W-MSA residual block on NHWC maps
    (`win_attention.py:118-207`). H and W must be multiples of window_size."""

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws, ss = self.window_size, self.shift_size
        assert 0 <= ss < ws, "shift_size must be in [0, window_size)"
        shortcut = x

        if ss > 0:
            mask = shifted_window_mask(H, W, ws, ss)
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
        else:
            mask = None

        x = WindowAttention(
            dim=self.dim,
            window_size=(ws, ws),
            num_heads=self.num_heads,
            name="attn",
        )(x, mask=mask)

        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        return shortcut + x


class ResidualUnit(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with GELUs (`layers.py:52-71`)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv1x1(self.dim // 2)(x)
        out = gelu(out)
        out = conv3x3(self.dim // 2)(out)
        out = gelu(out)
        out = conv1x1(self.dim)(out)
        return gelu(out + identity)


class Win_noShift_Attention(nn.Module):
    """CNN-codec attention block (`layers.py:45-89`): trunk a(x) gated by
    sigmoid of an attention branch b(x), plus identity."""

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0

    @nn.compact
    def __call__(self, x):
        identity = x
        a = x
        for i in range(3):
            a = ResidualUnit(self.dim, name=f"res_a{i}")(a)

        b = WinBasedAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=self.window_size,
            shift_size=self.shift_size,
            name="win_attn",
        )(x)
        for i in range(3):
            b = ResidualUnit(self.dim, name=f"res_b{i}")(b)
        b = conv1x1(self.dim, name="proj")(b)

        return a * jax.nn.sigmoid(b) + identity
