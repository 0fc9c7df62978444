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


def shifted_window_region_labels(
    H: int, W: int, window_size: int, shift_size: int
) -> np.ndarray:
    """Per-token shift-region labels for SW-MSA, shape (nW, N) int32.

    The reference builds a pairwise (nW, N, N) additive mask of
    0 / -100 from these same region ids on the fly (`win_attention.py:
    159-179`); keeping the per-token labels instead lets the penalty be
    fused as an elementwise label compare over the score tensor — no
    (N, N)-sized mask is ever materialized, which is what makes packed
    multi-window attention (see WindowAttention) affordable."""
    img_mask = np.zeros((H, W), np.int32)
    slices = (
        slice(0, -window_size),
        slice(-window_size, -shift_size),
        slice(-shift_size, None),
    )
    cnt = 0
    for h in slices:
        for w in slices:
            img_mask[h, w] = cnt
            cnt += 1
    ws = window_size
    mw = img_mask.reshape(H // ws, ws, W // ws, ws)
    return mw.transpose(0, 2, 1, 3).reshape(-1, ws * ws)


def shifted_window_mask(H: int, W: int, window_size: int, shift_size: int):
    """Additive (0 / -100) attention mask for SW-MSA, shape (nW, N, N).

    Pairwise form of `shifted_window_region_labels` — the exact tensor
    the reference builds (`win_attention.py:159-179`); used by the
    Pallas kernel path and tests."""
    lab = shifted_window_region_labels(H, W, window_size, shift_size)
    diff = lab[:, None, :] != lab[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _pack_group(n_windows: int, N: int, cap: int = 128) -> int:
    """Largest divisor G of n_windows with G*N <= cap tokens per pack."""
    G = max(cap // N, 1)
    while G > 1 and n_windows % G:
        G -= 1
    return G


class WindowAttention(nn.Module):
    """W-MSA over an NHWC map whose H/W are window multiples: x is
    (B, H, W, C), returned in the same shape. `labels` (optional) is the
    (nW, N) int32 per-token shift-region table from
    `shifted_window_region_labels`.

    TPU-first packed-window core, shaped by measurement
    (tools/attn_microbench.py, tools/attn_layout_bench.py on a v5e):

    * windows are PACKED: attention over G consecutive windows (G*N =
      128 tokens) runs as ONE dense dot with an additive penalty
      forbidding cross-window pairs — exp(-1e5) underflows to exact 0,
      so the result equals per-window softmax to f32 precision. Without
      packing the dots are (N=16, hd=16) batched stamps the 128x128 MXU
      cannot tile.
    * the penalty (window id + shift-region mismatch) is an elementwise
      compare of two small per-token label vectors fused into the score
      pass, and the rel-pos bias tiles to (nh, G*N, G*N) — nothing
      (N, N)-shaped per window ever lands in HBM. The shift-region part
      keeps the reference's -100 semantics (`win_attention.py:159-179`).
    * every materialized layout keeps the CHANNEL axis minor-most: the
      only transposes are whole-(3C)-row window partition/un-partition
      copies (full DMA bandwidth), while any layout with head_dim minor
      measured ~29 GB/s. The dots carry nh as a middle batch dim; XLA's
      internal dot normalization still pays hd-minor copies it won't
      surrender (measured core floor ~24 ms at stage-0 geometry vs
      ~31 ms for explicit hd-minor packing), which is what bounds the
      Swin analyze MFU on this backend — see PERF.md round 5.

    With `use_pallas=True` the attention core runs as the fused Pallas
    kernel in VMEM (layers/pallas_attention.py) on unpacked windows; the
    qkv/out projections remain XLA GEMMs.
    """

    dim: int
    window_size: tuple  # (wh, ww)
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, labels=None):
        B, H, W, C = x.shape
        wh, ww = self.window_size
        P, Q = H // wh, W // ww
        N = wh * ww
        nW = P * Q
        nh = self.num_heads
        hd = self.dim // nh
        scale = self.qk_scale or hd ** -0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        # window partition with the channel axis left minor-most: a 6-D
        # transpose over whole (3C)-rows DMAs at full bandwidth, while any
        # layout that makes head_dim (16-40 elements) the minor axis
        # copies at ~29 GB/s (measured, tools/attn_microbench.py). The
        # dots carry nh as a middle batch dim instead.
        G = _pack_group(nW, N)
        qkv = qkv.reshape(B, P, wh, Q, ww, 3 * C)
        qkv = qkv.transpose(0, 1, 3, 2, 4, 5)
        qkv = qkv.reshape(B * nW // G, G * N, 3, nh, hd)
        q = qkv[:, :, 0]
        k = qkv[:, :, 1]
        v = qkv[:, :, 2]  # (B*nW/G, G*N, nh, hd)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * wh - 1) * (2 * ww - 1), nh),
        )
        idx = relative_position_index(wh, ww).reshape(-1)
        rel_bias = bias_table[idx].reshape(N, N, nh)
        rel_bias = rel_bias.transpose(2, 0, 1)  # (nh, N, N)

        if self.use_pallas:
            out = self._pallas_core(q, k, v, rel_bias, labels, scale,
                                    B, nW, G)
        else:
            attn = jnp.einsum(
                "gnhd,gmhd->ghnm", q * scale, k,
                preferred_element_type=jnp.float32,
            )  # (B*nW/G, nh, GN, GN)
            # bias on every (window, window) block; off-diagonal blocks
            # are dead under the window-id penalty, so tiling is exact
            bias_t = jnp.tile(rel_bias, (1, G, G)) if G > 1 else rel_bias
            attn = attn + bias_t[None]
            pen = self._penalty(nW, N, G, labels)
            if pen is not None:
                attn = (
                    attn.reshape(B, nW // G, nh, G * N, G * N)
                    + pen[None, :, None]
                ).reshape(attn.shape)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum(
                "ghnm,gmhd->gnhd", attn, v,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)  # (B*nW/G, GN, nh, hd) — channels minor again
        # un-partition (C stays minor: full-bandwidth copy)
        out = out.reshape(B, P, Q, wh, ww, C)
        out = out.transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, H, W, C)
        return nn.Dense(self.dim, name="proj")(out)

    @staticmethod
    def _penalty(nW, N, G, labels):
        """(nW/G, GN, GN) additive penalty, or None when unnecessary:
        -1e5 for cross-window pairs, -100 for cross-shift-region pairs
        within a window (the reference's mask value)."""
        if G == 1 and labels is None:
            return None
        win = np.repeat(np.arange(nW, dtype=np.int32), N).reshape(nW, N)
        win = jnp.asarray(win.reshape(nW // G, G * N))
        pen = jnp.where(
            win[:, None, :] != win[:, :, None], np.float32(-1e5),
            np.float32(0),
        )
        if labels is not None:
            lab = jnp.asarray(
                np.asarray(labels, np.int32).reshape(nW // G, G * N)
            )
            pen = pen + jnp.where(
                lab[:, None, :] != lab[:, :, None], np.float32(-100),
                np.float32(0),
            )
        return pen

    def _pallas_core(self, q, k, v, rel_bias, labels, scale, B, nW, G):
        """Opt-in fused-kernel path on unpacked windows."""
        from .pallas_attention import window_attention_core

        _, GN, nh, hd = q.shape
        N = GN // G

        def flat(t):  # (B*nW/G, GN, nh, d) -> (B*nW, nh, N, d)
            return t.reshape(B * nW, N, nh, hd).transpose(0, 2, 1, 3)

        if labels is not None:
            lab = np.asarray(labels, np.int32)
            mask = np.where(
                lab[:, None, :] != lab[:, :, None], -100.0, 0.0
            ).astype(np.float32)
            mask_full = jnp.broadcast_to(
                jnp.asarray(mask)[None], (B, nW, N, N)
            ).reshape(B * nW, N, N)
        else:
            mask_full = None
        out = window_attention_core(
            flat(q), flat(k), flat(v), rel_bias, mask_full, scale,
            use_pallas=True,
        )
        # (B*nW, nh, N, hd) -> (B*nW/G, GN, nh, hd) to share the caller's
        # un-partition reshape
        return out.transpose(0, 2, 1, 3).reshape(B * nW // G, GN, nh, hd)


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
            labels = shifted_window_region_labels(H, W, ws, ss)
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
        else:
            labels = None

        x = WindowAttention(
            dim=self.dim,
            window_size=(ws, ws),
            num_heads=self.num_heads,
            name="attn",
        )(x, labels=labels)

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
