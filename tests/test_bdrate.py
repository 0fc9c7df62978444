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


def test_rd_compare_baseline_metric_selection(tmp_path):
    """MS-SSIM reference curves must be flagged ms-ssim-db so the harness
    never integrates PSNR qualities against them."""
    import json

    from stf_tpu.cli.rd_compare import load_baseline

    blob = {"results": {"bpp": [0.1, 0.2], "ms-ssim": [13.6, 15.0]}}
    p = tmp_path / "ms.json"
    p.write_text(json.dumps(blob))
    b = load_baseline(str(p))
    assert b["metric"] == "ms-ssim-db"
    assert b["quality"] == [13.6, 15.0]

    blob = {"results": {"bpp": [0.1, 0.2], "psnr": [29.1, 30.5]}}
    p2 = tmp_path / "ps.json"
    p2.write_text(json.dumps(blob))
    assert load_baseline(str(p2))["metric"] == "psnr"

    from stf_tpu.zoo.published import PUBLISHED_RD

    assert PUBLISHED_RD["cnn_ms-ssim_Kodak"]["metric"] == "ms-ssim-db"
