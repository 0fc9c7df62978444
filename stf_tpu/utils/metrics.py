"""Image quality metrics in pure JAX (NHWC).

The reference relies on pytorch_msssim for MS-SSIM in its eval CLI
(`compressai/utils/eval_model/__main__.py:117-125`); this is an independent
implementation of the standard Wang et al. multi-scale SSIM with the usual
constants (11-tap Gaussian window, sigma 1.5, K1=0.01, K2=0.03, 5 scales).
Values were cross-checked against pytorch_msssim-style references in tests.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a, b, data_range: float = 1.0):
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(x, win):
    """Separable depthwise Gaussian blur, 'valid' padding (NHWC)."""
    C = x.shape[-1]
    kh = jnp.asarray(win).reshape(-1, 1, 1, 1)
    kh = jnp.tile(kh, (1, 1, 1, C))
    kw = kh.transpose(1, 0, 2, 3)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    return x


def _ssim_components(x, y, win, data_range: float):
    K1, K2 = 0.01, 0.03
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2

    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _blur(x * x, win) - mu_xx
    sigma_yy = _blur(y * y, win) - mu_yy
    sigma_xy = _blur(x * y, win) - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim.mean(), cs.mean()


def ssim(x, y, data_range: float = 1.0, win_size: int = 11, sigma: float = 1.5):
    win = _gaussian_kernel(win_size, sigma)
    s, _ = _ssim_components(x, y, win, data_range)
    return s


def ms_ssim(
    x,
    y,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    weights=_MSSSIM_WEIGHTS,
):
    """Multi-scale SSIM; inputs NHWC. Images too small for the 5-scale
    default automatically use fewer scales with renormalized weights (each
    scale needs >= win_size pixels after its poolings)."""
    win = _gaussian_kernel(win_size, sigma)
    levels = len(weights)
    min_side = min(x.shape[1], x.shape[2])
    max_levels = 1
    while max_levels < levels and (min_side // 2 ** max_levels) >= win_size:
        max_levels += 1
    if max_levels < levels:
        w = np.asarray(weights[:max_levels])
        weights = tuple(w / w.sum())
        levels = max_levels
    mcs = []
    for i in range(levels):
        s, cs = _ssim_components(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(cs)
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    # Floor at a small POSITIVE epsilon, not 0: ms-ssim doubles as the
    # ms-ssim training loss (reference train.py:39-59 variant), and
    # d/dv[v^w] = w*v^(w-1) is INFINITE at v=0 for w<1 — a relu floor
    # NaNs the whole model on the first step whose cs term clips
    # (routine at random init, where x_hat is uncorrelated with x;
    # observed r4: ms-ssim training NaN'd by step 25). At 1e-4 the
    # gradient stays bounded (~350 before the trainer's global-norm
    # clip) and the metric is unchanged for any sane input — a value
    # below 1e-4 means the images are unrelated anyway.
    vals = jnp.maximum(jnp.stack(mcs + [s]), 1e-4)
    w = jnp.asarray(weights)
    return jnp.prod(vals ** w)
