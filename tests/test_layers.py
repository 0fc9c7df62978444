"""Layer tests, including exact cross-checks against torch (CPU) for the
spatial-alignment-critical ops (conv padding, transposed conv, pixel
shuffle). These lock in the layout contract the checkpoint importer relies
on: torch OIHW -> flax HWIO, NCHW -> NHWC.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stf_tpu.layers import (
    GDN,
    Conv,
    ConvTranspose,
    PixelShuffle,
    WinBasedAttention,
    Win_noShift_Attention,
    window_partition,
    window_reverse,
)


def nchw(x_nhwc):
    return np.asarray(x_nhwc).transpose(0, 3, 1, 2)


def nhwc(x_nchw):
    return np.asarray(x_nchw).transpose(0, 2, 3, 1)


class TestConvTorchParity:
    @pytest.mark.parametrize("k,s,n", [(5, 2, 16), (3, 1, 16), (3, 2, 15), (5, 2, 17)])
    def test_conv_matches_torch(self, k, s, n):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, n, n, 4)).astype(np.float32)
        w = rng.normal(size=(6, 4, k, k)).astype(np.float32) * 0.1
        b = rng.normal(size=(6,)).astype(np.float32)

        ref = F.conv2d(
            torch.from_numpy(nchw(x)), torch.from_numpy(w),
            torch.from_numpy(b), stride=s, padding=k // 2,
        ).numpy()

        m = Conv(6, kernel_size=k, stride=s)
        variables = m.init(jax.random.key(0), jnp.asarray(x))
        params = {
            "Conv_0": {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
        }
        out = m.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(nchw(out), ref, atol=1e-4)

    @pytest.mark.parametrize("k,s,n", [(5, 2, 8), (3, 2, 9)])
    def test_conv_transpose_matches_torch(self, k, s, n):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, n, n, 4)).astype(np.float32)
        w = rng.normal(size=(4, 6, k, k)).astype(np.float32) * 0.1  # (I, O, kh, kw)
        b = rng.normal(size=(6,)).astype(np.float32)

        ref = F.conv_transpose2d(
            torch.from_numpy(nchw(x)), torch.from_numpy(w),
            torch.from_numpy(b), stride=s, padding=k // 2,
            output_padding=s - 1,
        ).numpy()

        m = ConvTranspose(6, kernel_size=k, stride=s)
        m.init(jax.random.key(0), jnp.asarray(x))
        # torch convtranspose correlates the *flipped* kernel over the dilated
        # input; flax ConvTranspose does not flip -> flip spatially here.
        kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
        params = {
            "ConvTranspose_0": {
                "kernel": jnp.asarray(kernel),
                "bias": jnp.asarray(b),
            }
        }
        out = m.apply({"params": params}, jnp.asarray(x))
        assert out.shape[1] == n * s
        np.testing.assert_allclose(nchw(out), ref, atol=1e-4)

    def test_pixel_shuffle_matches_torch(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 4, 5, 18)).astype(np.float32)
        ref = F.pixel_shuffle(torch.from_numpy(nchw(x)), 3).numpy()
        out = PixelShuffle(3).apply({}, jnp.asarray(x))
        np.testing.assert_allclose(nchw(out), ref, atol=1e-6)


class TestGDN:
    def test_fresh_init_formula(self):
        # At init: beta=1, gamma=0.1*I  =>  y = x / sqrt(1 + 0.1 x²)
        m = GDN(channels=4)
        variables = m.init(jax.random.key(0), jnp.zeros((1, 2, 2, 4)))
        x = jax.random.normal(jax.random.key(1), (1, 3, 3, 4))
        y = m.apply(variables, x)
        expected = np.asarray(x) / np.sqrt(1 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)

    def test_inverse_multiplies(self):
        m = GDN(channels=4, inverse=True)
        variables = m.init(jax.random.key(0), jnp.zeros((1, 2, 2, 4)))
        x = jax.random.normal(jax.random.key(1), (1, 3, 3, 4))
        y = m.apply(variables, x)
        expected = np.asarray(x) * np.sqrt(1 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)

    def test_igdn_inverts_gdn_at_init(self):
        g = GDN(channels=4)
        ig = GDN(channels=4, inverse=True)
        vg = g.init(jax.random.key(0), jnp.zeros((1, 2, 2, 4)))
        vig = ig.init(jax.random.key(0), jnp.zeros((1, 2, 2, 4)))
        x = jax.random.normal(jax.random.key(1), (1, 4, 4, 4))
        # IGDN is not the exact inverse (norm is computed from its own input),
        # but for diagonal gamma at init the composition is near-identity for
        # small x.
        y = ig.apply(vig, g.apply(vg, x * 0.1))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 0.1, atol=2e-3)


class TestWindowOps:
    def test_partition_reverse_roundtrip(self):
        x = jax.random.normal(jax.random.key(0), (2, 8, 12, 5))
        w = window_partition(x, 4)
        assert w.shape == (2 * 2 * 3, 16, 5)
        back = window_reverse(w, 4, 8, 12)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_win_attention_shapes(self):
        m = WinBasedAttention(dim=32, num_heads=4, window_size=4, shift_size=0)
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 32))
        variables = m.init(jax.random.key(1), x)
        y = m.apply(variables, x)
        assert y.shape == x.shape

    def test_win_attention_shifted(self):
        m = WinBasedAttention(dim=32, num_heads=4, window_size=4, shift_size=2)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 32))
        variables = m.init(jax.random.key(1), x)
        y = m.apply(variables, x)
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))

    def test_shift_mask_blocks_wrapped_tokens(self):
        # With a shift, tokens that wrap around must not attend to each other:
        # verify output differs from the unshifted result but stays finite,
        # and that the mask has the expected structure.
        from stf_tpu.layers.win_attention import shifted_window_mask

        mask = shifted_window_mask(8, 8, 4, 2)
        assert mask.shape == (4, 16, 16)
        # the first window (interior) is unmasked, later ones partially
        assert np.all(mask[0] == 0)
        assert np.any(mask[-1] == -100.0)

    def test_win_noshift_attention_block(self):
        m = Win_noShift_Attention(dim=32, num_heads=4, window_size=4, shift_size=2)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 32))
        variables = m.init(jax.random.key(1), x)
        y = m.apply(variables, x)
        assert y.shape == x.shape

    def test_translation_equivariance_no_shift(self):
        # W-MSA with no shift is equivariant to translations by window_size.
        m = WinBasedAttention(dim=16, num_heads=2, window_size=4, shift_size=0)
        x = jax.random.normal(jax.random.key(0), (1, 12, 12, 16))
        variables = m.init(jax.random.key(1), x)
        y = m.apply(variables, x)
        x_shift = jnp.roll(x, 4, axis=1)
        y_shift = m.apply(variables, x_shift)
        np.testing.assert_allclose(
            np.asarray(jnp.roll(y, 4, axis=1)), np.asarray(y_shift), atol=1e-5
        )
