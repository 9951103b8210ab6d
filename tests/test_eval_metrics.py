"""Fusion evaluation metric sanity tests."""

import numpy as np
import pytest

from swin_unet_image_fusion_tpu.eval_metrics import (
    entropy,
    fusion_mutual_information,
    mutual_information,
    qabf,
    scd,
    score_fusion,
    spatial_frequency,
    std_deviation,
)


def test_entropy_bounds(rng):
    flat = np.full((32, 32), 0.5)
    assert entropy(flat) == pytest.approx(0.0, abs=1e-9)
    noisy = rng.random((64, 64))
    assert 6.0 < entropy(noisy) <= 8.0  # near-uniform 8-bit histogram


def test_std_and_sf(rng):
    flat = np.full((32, 32), 0.25)
    assert std_deviation(flat) == 0.0
    assert spatial_frequency(flat) == 0.0
    noisy = rng.random((32, 32))
    assert std_deviation(noisy) > 10
    assert spatial_frequency(noisy) > 10


def test_mutual_information_self_is_entropy(rng):
    img = rng.random((256, 256))
    assert mutual_information(img, img) == pytest.approx(entropy(img), rel=1e-6)
    # independent noise: only the (conventional) histogram-estimator bias remains,
    # far below the self-MI
    other = rng.random((256, 256))
    assert mutual_information(img, other) < 0.5 * entropy(img)


def test_fusion_mi_prefers_related_fusion(rng):
    ir = rng.random((256, 256))
    vis = rng.random((256, 256))
    avg = (ir + vis) / 2
    unrelated = rng.random((256, 256))
    assert fusion_mutual_information(avg, ir, vis) > fusion_mutual_information(
        unrelated, ir, vis
    )


def test_qabf_perfect_when_fused_equals_source(rng):
    img = rng.random((32, 32))
    q = qabf(img, img, img)
    assert q > 0.95
    q_bad = qabf(np.full((32, 32), 0.5), img, img)
    assert q_bad < 0.1


def test_scd_range(rng):
    ir = rng.random((32, 32))
    vis = rng.random((32, 32))
    v = scd((ir + vis) / 2, ir, vis)
    assert -2.0 <= v <= 2.0
    assert v > 0.5  # average fusion correlates with both differences


def test_score_fusion_returns_all_keys(rng):
    ir = rng.random((32, 32)).astype(np.float32)
    vis = rng.random((32, 32)).astype(np.float32)
    scores = score_fusion((ir + vis) / 2, ir, vis)
    assert set(scores) == {
        "EN", "SD", "SF", "MI", "SCD", "Qabf",
        "SSIM_ir", "SSIM_vis", "PSNR_ir", "PSNR_vis",
    }
    assert all(np.isfinite(v) for v in scores.values())
