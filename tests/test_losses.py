"""Loss-stack tests: Sobel vs torch golden conv, SSIM/MS-SSIM properties, total loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swin_unet_image_fusion_tpu.config import LossConfig
from swin_unet_image_fusion_tpu.losses import (
    intensity_term,
    texture_term,
    total_fusion_loss,
)
from swin_unet_image_fusion_tpu.ops.edges import sobel_magnitude
from swin_unet_image_fusion_tpu.ops.ssim import (
    ms_ssim_l1_loss,
    psnr,
    ssim_index,
    ssim_loss,
)


def test_sobel_matches_torch_golden(rng):
    """Golden check against torch's conv2d with kornia's Sobel recipe:
    replicate pad 1, kernels normalised by abs-sum (/8), sqrt(gx^2+gy^2+1e-6)."""
    import torch
    import torch.nn.functional as F

    x = rng.random((2, 1, 16, 20), dtype=np.float32)
    kx = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]]) / 8.0
    ky = kx.T
    xt = F.pad(torch.from_numpy(x), (1, 1, 1, 1), mode="replicate")
    gx = F.conv2d(xt, kx[None, None])
    gy = F.conv2d(xt, ky[None, None])
    ref = torch.sqrt(gx**2 + gy**2 + 1e-6).numpy()

    ours = sobel_magnitude(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-6
    )


def test_intensity_term_is_l1_to_max(rng):
    fus = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    ir = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    expected = np.abs(
        np.asarray(fus) - np.maximum(np.asarray(ir), np.asarray(vis))
    ).mean()
    np.testing.assert_allclose(float(intensity_term(fus, ir, vis)), expected, rtol=1e-6)


def test_ssim_identity_and_monotonicity(rng):
    a = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    assert abs(float(ssim_loss(a, a))) < 1e-6
    near = a + 0.01
    far = a + 0.3
    assert float(ssim_loss(a, jnp.clip(near, 0, 1))) < float(
        ssim_loss(a, jnp.clip(far, 0, 1))
    )
    s = ssim_index(a, a)
    assert s.shape == a.shape  # padding='same' keeps resolution


def test_ms_ssim_l1_identity_and_monotonicity(rng):
    a = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    assert abs(float(ms_ssim_l1_loss(a, a))) < 1e-4
    near = jnp.clip(a + 0.02, 0, 1)
    far = jnp.clip(a + 0.4, 0, 1)
    assert float(ms_ssim_l1_loss(a, near)) < float(ms_ssim_l1_loss(a, far))


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 1))
    b = jnp.full((1, 8, 8, 1), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)


def test_total_loss_terms_and_gradient(rng):
    cfg = LossConfig()
    fus = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))
    ir = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))

    total, terms = total_fusion_loss(cfg, fus, ir, vis)
    assert set(terms) == {
        "ssim_loss", "texture_loss", "intensity_loss", "psnr_loss", "total_loss",
    }
    # total = mean of the three active terms with ratios 1/3 (a008:264-269)
    expected = (
        terms["ssim_loss"] / 3 + terms["texture_loss"] / 3 + terms["intensity_loss"] / 3
    )
    np.testing.assert_allclose(float(total), float(expected), rtol=1e-6)

    grad = jax.grad(lambda f: total_fusion_loss(cfg, f, ir, vis)[0])(fus)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).max() > 0


def test_texture_term_zero_when_fused_has_max_edges(rng):
    ir = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    vis = ir * 0.5
    # fusing the stronger-edged image exactly -> edge(fus) == max(edge_ir, edge_vis)
    val = float(texture_term(LossConfig(), ir, ir, vis))
    assert val < 1e-6


def test_canny_edges_reasonable(rng):
    """Canny returns a binary edge map that marks a sharp step edge."""
    from swin_unet_image_fusion_tpu.ops.edges import canny

    img = np.zeros((1, 32, 32, 1), np.float32)
    img[:, :, 16:, :] = 1.0  # vertical step edge
    mag, edges = canny(jnp.asarray(img))
    edges = np.asarray(edges)
    assert set(np.unique(edges)).issubset({0.0, 1.0})
    # the edge column fires, far-away columns don't
    assert edges[0, 16, 15:17, 0].max() == 1.0
    assert edges[0, :, :8, 0].max() == 0.0
    assert edges[0, :, 24:, 0].max() == 0.0


def test_texture_term_canny_mode(rng):
    cfg = LossConfig(choose_canny_else_sobel=True)
    a = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    val = float(texture_term(cfg, a, a, a * 0.5))
    assert np.isfinite(val) and val >= 0


def test_ms_ssim_l1_matches_independent_torch_implementation(rng):
    """Golden check of ops/ssim.py::ms_ssim_l1_loss against a torch implementation of
    the same objective (Zhao et al. mixed MS-SSIM + Gaussian-weighted L1, the semantics
    of kornia.losses.MS_SSIMLoss) written independently with torch ops."""
    import torch
    import torch.nn.functional as F

    from swin_unet_image_fusion_tpu.ops.ssim import gaussian_kernel_2d

    sigmas = [0.5, 1.0, 2.0, 4.0, 8.0]
    fs = int(4 * sigmas[-1] + 1)  # 33
    pad = int(2 * sigmas[-1])  # 16
    c1, c2 = 0.01**2, 0.03**2
    alpha, comp = 0.025, 200.0

    x_np = rng.random((2, 1, 48, 48)).astype(np.float32)
    y_np = np.clip(x_np + 0.1 * rng.standard_normal((2, 1, 48, 48)).astype(np.float32), 0, 1)

    kernels = torch.stack(
        [torch.from_numpy(gaussian_kernel_2d(fs, s)) for s in sigmas]
    ).unsqueeze(1)  # (5, 1, fs, fs)

    x, y = torch.from_numpy(x_np), torch.from_numpy(y_np)
    mux = F.conv2d(x, kernels, padding=pad)   # (B, 5, H, W)
    muy = F.conv2d(y, kernels, padding=pad)
    sx = F.conv2d(x * x, kernels, padding=pad) - mux * mux
    sy = F.conv2d(y * y, kernels, padding=pad) - muy * muy
    sxy = F.conv2d(x * y, kernels, padding=pad) - mux * muy
    l = (2 * mux * muy + c1) / (mux**2 + muy**2 + c1)
    cs = (2 * sxy + c2) / (sx + sy + c2)
    lm = l[:, -1]
    pics = cs.prod(dim=1)
    loss_ms = 1 - lm * pics
    g_l1 = F.conv2d((x - y).abs(), kernels[-1:], padding=pad).squeeze(1)
    ref = float((comp * (alpha * loss_ms + (1 - alpha) * g_l1)).mean())

    from swin_unet_image_fusion_tpu.ops.ssim import ms_ssim_l1_loss

    ours = float(ms_ssim_l1_loss(
        jnp.asarray(x_np.transpose(0, 2, 3, 1)), jnp.asarray(y_np.transpose(0, 2, 3, 1))
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_single_scale_ssim_matches_independent_torch(rng):
    """Golden check of the single-scale SSIM (Gaussian 11x11 sigma 1.5, 'same'
    zero-padding) against an independent torch computation."""
    import torch
    import torch.nn.functional as F

    from swin_unet_image_fusion_tpu.ops.ssim import gaussian_kernel_2d

    k = torch.from_numpy(gaussian_kernel_2d(11, 1.5)).unsqueeze(0).unsqueeze(0)
    c1, c2 = 0.01**2, 0.03**2
    x_np = rng.random((1, 1, 32, 32)).astype(np.float32)
    y_np = rng.random((1, 1, 32, 32)).astype(np.float32)
    x, y = torch.from_numpy(x_np), torch.from_numpy(y_np)
    xp = F.pad(x, (5, 5, 5, 5))
    yp = F.pad(y, (5, 5, 5, 5))
    mux, muy = F.conv2d(xp, k), F.conv2d(yp, k)
    sx = F.conv2d(xp * xp, k) - mux**2
    sy = F.conv2d(yp * yp, k) - muy**2
    sxy = F.conv2d(xp * yp, k) - mux * muy
    s = ((2 * mux * muy + c1) * (2 * sxy + c2)) / ((mux**2 + muy**2 + c1) * (sx + sy + c2))
    ref = float(((1 - s) / 2).mean())

    ours = float(ssim_loss(
        jnp.asarray(x_np.transpose(0, 2, 3, 1)), jnp.asarray(y_np.transpose(0, 2, 3, 1))
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
