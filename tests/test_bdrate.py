"""Bjøntegaard-delta unit tests (analytic cases)."""

import numpy as np
import pytest

from stf_tpu.utils.bdrate import bd_quality, bd_rate, rate_delta_at_quality

BPP = [0.127, 0.199, 0.309, 0.449, 0.649, 0.895]
PSNR = [29.22, 30.59, 32.26, 34.15, 35.91, 37.72]


def test_identical_curves_zero():
    assert abs(bd_rate(BPP, PSNR, BPP, PSNR)) < 1e-9
    assert abs(bd_quality(BPP, PSNR, BPP, PSNR)) < 1e-9


def test_uniform_rate_saving():
    test_bpp = [b * 0.9 for b in BPP]
    np.testing.assert_allclose(bd_rate(BPP, PSNR, test_bpp, PSNR), -10.0,
                               atol=1e-6)
    np.testing.assert_allclose(bd_rate(BPP, PSNR, [b * 1.1 for b in BPP],
                                       PSNR), 10.0, atol=1e-6)


def test_uniform_quality_gain():
    test_psnr = [p + 1.0 for p in PSNR]
    np.testing.assert_allclose(
        bd_quality(BPP, PSNR, BPP, test_psnr), 1.0, atol=0.02
    )


def test_single_point_delta():
    # a point exactly on the curve -> ~0% delta
    d = rate_delta_at_quality(BPP, PSNR, BPP[2], PSNR[2])
    assert abs(d) < 1e-9
    # 20% more rate at the same quality -> +20%
    d = rate_delta_at_quality(BPP, PSNR, BPP[2] * 1.2, PSNR[2])
    np.testing.assert_allclose(d, 20.0, atol=1e-6)
    with pytest.raises(ValueError):
        rate_delta_at_quality(BPP, PSNR, 0.1, 50.0)  # outside the curve


def test_too_few_points():
    with pytest.raises(ValueError):
        bd_rate([0.1], [30.0], BPP, PSNR)
