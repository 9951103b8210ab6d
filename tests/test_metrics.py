"""Evaluation metric sanity tests (SSIM / MS-SSIM index / PSNR)."""

import numpy as np

import jax.numpy as jnp

from swin_unet_image_fusion_tpu.metrics import ms_ssim_index, psnr, ssim


def test_ssim_bounds(rng):
    a = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    assert abs(float(ssim(a, a)) - 1.0) < 1e-5
    b = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    assert float(ssim(a, b)) < 0.5


def test_ms_ssim_index_identity(rng):
    a = jnp.asarray(rng.random((1, 192, 192, 1), dtype=np.float32))
    v = float(ms_ssim_index(a, a))
    assert abs(v - 1.0) < 1e-4
    noisy = jnp.clip(a + 0.2 * jnp.asarray(rng.standard_normal(a.shape), jnp.float32), 0, 1)
    assert float(ms_ssim_index(a, noisy)) < v


def test_psnr_symmetry(rng):
    a = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    assert abs(float(psnr(a, b)) - float(psnr(b, a))) < 1e-5
