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
    """Canny returns a binary edge map that marks a sharp step edge.

    A perfectly clean vertical step blurs into TWO equal-magnitude columns, an exact
    NMS tie that kornia's strict > suppresses entirely — so a touch of noise is added
    to break the symmetry (as any real image would).
    """
    from swin_unet_image_fusion_tpu.ops.edges import canny

    img = np.zeros((1, 32, 32, 1), np.float32)
    img[:, :, 16:, :] = 1.0  # vertical step edge
    img = np.clip(img + 0.01 * rng.standard_normal(img.shape).astype(np.float32), 0, 1)
    mag, edges = canny(jnp.asarray(img))
    edges = np.asarray(edges)
    assert set(np.unique(edges)).issubset({0.0, 1.0})
    # the edge fires near the step, far-away columns don't
    assert edges[0, :, 14:18, 0].max() == 1.0
    assert edges[0, :, :8, 0].max() == 0.0
    assert edges[0, :, 24:, 0].max() == 0.0


def test_texture_term_canny_mode(rng):
    cfg = LossConfig(choose_canny_else_sobel=True)
    a = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    val = float(texture_term(cfg, a, a, a * 0.5))
    assert np.isfinite(val) and val >= 0


# --------------------------------------------------------------------------- golden
# Ground truth: tests/kornia_ref.py — faithful torch reimplementations of the exact
# kornia ops the reference loss calls (a008_loss.py:3-4). Every term of the training
# objective is asserted against it below, on random and structured images.


def _nchw(a):
    return np.ascontiguousarray(np.asarray(a).transpose(0, 3, 1, 2))


def _pairs(rng, shape=(2, 1, 48, 48)):
    """(fus, ir, vis)-style NCHW pairs: random + a structured 'natural' image."""
    x = rng.random(shape).astype(np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal(shape).astype(np.float32), 0, 1)
    # structured: smooth gradient + a bright square (edges + flat regions), with a
    # little noise — perfectly constant-gradient regions produce exact NMS ties whose
    # resolution depends on conv summation order, which no two frameworks share
    s = np.tile(np.linspace(0, 1, shape[-1], dtype=np.float32), (shape[-2], 1))
    s = np.broadcast_to(s, shape).copy()
    s[..., 12:30, 8:20] = 0.9
    s = np.clip(s + 0.02 * rng.standard_normal(shape).astype(np.float32), 0, 1)
    t = np.clip(s + 0.05 * rng.standard_normal(shape).astype(np.float32), 0, 1)
    return [(x, y), (s, t)]


def test_ms_ssim_l1_matches_kornia_golden(rng):
    """ms_ssim_l1_loss == kornia MS_SSIMLoss (incl. the triplicated-mask slot layout
    that cubes the 1-channel luminance/cs products) at <=1e-5."""
    import torch

    from kornia_ref import MS_SSIMLoss
    from swin_unet_image_fusion_tpu.ops.ssim import ms_ssim_l1_loss

    crit = MS_SSIMLoss()
    for shape in [(2, 1, 48, 48), (1, 3, 40, 40)]:
        for x_np, y_np in _pairs(rng, shape):
            ref = float(crit(torch.from_numpy(x_np), torch.from_numpy(y_np)))
            ours = float(ms_ssim_l1_loss(
                jnp.asarray(x_np.transpose(0, 2, 3, 1)),
                jnp.asarray(y_np.transpose(0, 2, 3, 1)),
            ))
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_single_scale_ssim_matches_kornia_golden(rng):
    """ssim_loss == kornia ssim_loss (reflect 'same' padding + clamp) at <=1e-6."""
    import torch

    import kornia_ref

    for x_np, y_np in _pairs(rng, (1, 1, 32, 32)):
        ref = float(kornia_ref.ssim_loss(
            torch.from_numpy(x_np), torch.from_numpy(y_np), window_size=11,
            max_val=1.0, reduction="mean", padding="same",
        ))
        ours = float(ssim_loss(
            jnp.asarray(x_np.transpose(0, 2, 3, 1)),
            jnp.asarray(y_np.transpose(0, 2, 3, 1)),
        ))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_sobel_matches_kornia_golden(rng):
    import torch

    from kornia_ref import Sobel

    for x_np, _ in _pairs(rng, (2, 1, 24, 30)):
        ref = Sobel()(torch.from_numpy(x_np)).numpy()
        ours = _nchw(sobel_magnitude(jnp.asarray(x_np.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_psnr_loss_matches_kornia_golden(rng):
    import torch

    from kornia_ref import PSNRLoss
    from swin_unet_image_fusion_tpu.ops.ssim import psnr_loss

    x_np, y_np = _pairs(rng, (2, 1, 16, 16))[0]
    ref = float(PSNRLoss(max_val=1.0)(torch.from_numpy(x_np), torch.from_numpy(y_np)))
    ours = float(psnr_loss(
        jnp.asarray(x_np.transpose(0, 2, 3, 1)), jnp.asarray(y_np.transpose(0, 2, 3, 1))
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_canny_matches_kornia_golden(rng):
    """canny == kornia Canny: NMS'd magnitude to <=1e-5, edge map bit-exact."""
    import torch

    from kornia_ref import Canny
    from swin_unet_image_fusion_tpu.ops.edges import canny

    for x_np, _ in _pairs(rng, (1, 1, 32, 32)):
        mag_ref, edges_ref = Canny()(torch.from_numpy(x_np))
        mag, edges = canny(jnp.asarray(x_np.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(_nchw(mag), mag_ref.numpy(), atol=2e-5)
        np.testing.assert_array_equal(_nchw(edges), edges_ref.numpy())


def test_total_loss_matches_reference_myloss_golden(rng):
    """End-to-end: total_fusion_loss == the reference MyLoss.calcu_total_loss
    (a008_loss.py:226-282) running on the kornia ground truth, every term <=1e-4."""
    import reference_loader

    reference_loader.load_reference()
    from a008_loss import MyLoss  # noqa: E402  (read-only reference import)
    import torch

    my_loss = MyLoss()
    cfg = LossConfig()

    (x_np, y_np), (s_np, t_np) = _pairs(rng, (2, 1, 48, 48))
    fus, ir, vis = x_np, y_np, s_np

    _, ref_terms = my_loss.calcu_total_loss(
        torch.from_numpy(fus), torch.from_numpy(ir), torch.from_numpy(vis)
    )
    total, terms = total_fusion_loss(
        cfg,
        jnp.asarray(fus.transpose(0, 2, 3, 1)),
        jnp.asarray(ir.transpose(0, 2, 3, 1)),
        jnp.asarray(vis.transpose(0, 2, 3, 1)),
    )
    for key in ["ssim_loss", "texture_loss", "intensity_loss", "total_loss"]:
        np.testing.assert_allclose(
            float(terms[key]), ref_terms[key], rtol=1e-4, atol=1e-4
        ), key


def test_total_loss_matches_reference_single_scale_and_canny(rng, monkeypatch):
    """Same end-to-end parity with the non-default switches: single-scale SSIM and
    Canny texture (A000_CONFIG.py:34,37 flipped)."""
    import reference_loader

    reference_loader.load_reference()
    import A000_CONFIG
    import torch
    from a008_loss import MyLoss  # noqa: E402

    monkeypatch.setattr(A000_CONFIG, "CHOOSE_MS_SSIM", False)
    monkeypatch.setattr(A000_CONFIG, "CHOOSE_CANNY_ELSE_SOBEL", True)
    my_loss = MyLoss()
    cfg = LossConfig(choose_ms_ssim=False, choose_canny_else_sobel=True)

    (fus, ir), (vis, _) = _pairs(rng, (1, 1, 40, 40))
    _, ref_terms = my_loss.calcu_total_loss(
        torch.from_numpy(fus), torch.from_numpy(ir), torch.from_numpy(vis)
    )
    _, terms = total_fusion_loss(
        cfg,
        jnp.asarray(fus.transpose(0, 2, 3, 1)),
        jnp.asarray(ir.transpose(0, 2, 3, 1)),
        jnp.asarray(vis.transpose(0, 2, 3, 1)),
    )
    for key in ["ssim_loss", "texture_loss", "intensity_loss", "total_loss"]:
        np.testing.assert_allclose(
            float(terms[key]), ref_terms[key], rtol=1e-4, atol=1e-4
        ), key


def test_ms_ssim_band_matmul_equals_conv_form(rng):
    """The band-matrix einsum blur (the TPU fast path) is bitwise-equal on CPU to
    the depthwise-conv formulation it replaced, at even/odd/large sizes — the
    band matrices are an exact re-expression of the same VALID correlation."""
    from swin_unet_image_fusion_tpu.ops.ssim import (
        DEFAULT_MS_SIGMAS,
        _depthwise_conv_nhwc,
        _ms_ssim_kernels,
        _pad_zeros,
        ms_ssim_l1_loss,
    )

    for hw in [(33, 33), (64, 48), (100, 90)]:
        x = jnp.asarray(rng.random((2, *hw, 1)).astype(np.float32))
        y = jnp.asarray(rng.random((2, *hw, 1)).astype(np.float32))
        got = float(ms_ssim_l1_loss(x, y))

        # reference: same loss computed with the 2-D grouped-conv bank
        kernels = jnp.asarray(_ms_ssim_kernels(1, DEFAULT_MS_SIGMAS))
        pad = int(2 * DEFAULT_MS_SIGMAS[-1])
        blur = lambda a: _depthwise_conv_nhwc(_pad_zeros(a, pad), kernels, "VALID")
        mux, muy = blur(x), blur(y)
        mux2, muy2, muxy = mux * mux, muy * muy, mux * muy
        sx2 = blur(x * x) - mux2
        sy2 = blur(y * y) - muy2
        sxy = blur(x * y) - muxy
        c1, c2 = 0.01**2, 0.03**2
        l_map = (2 * muxy + c1) / (mux2 + muy2 + c1)
        cs_map = (2 * sxy + c2) / (sx2 + sy2 + c2)
        lm = jnp.prod(l_map[..., 2:], axis=-1)  # 3 coarsest of 5 slots (C=1: cubed)
        pics = jnp.prod(cs_map, axis=-1) ** 3   # product over all 3*n_s slots
        loss_ms = 1.0 - lm * pics
        l1 = jnp.abs(x - y)
        smoothed = _depthwise_conv_nhwc(
            _pad_zeros(l1, pad), kernels[..., 4:5], "VALID"
        )[..., 0]
        want = float(200.0 * (0.025 * loss_ms + 0.975 * smoothed).mean())
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_win64_odd_heads_fallback_matches_jnp():
    """num_heads*d not divisible by 8 falls back to the 128-lane head-batched
    layout — parity must hold there too."""
    from swin_unet_image_fusion_tpu.models.layers import BasicBlock

    rng2 = np.random.default_rng(3)
    s, b, c, heads, d = 2, 1, 24, 3, 3  # ip=9: not 8-aligned -> no win64
    h, w = 14, 14
    x = jnp.asarray(rng2.random((s, b, h, w, c), np.float32))
    kw = dict(
        streams=s, dims=c, num_heads=heads, dims_per_head=d,
        window_size=(7, 7), shift=True, cross=True, mlp_hidden_dims=4 * c,
    )
    ref = BasicBlock(impl="jnp", **kw)
    params = ref.init(jax.random.PRNGKey(0), x)
    out_ref = ref.apply(params, x)
    packed = BasicBlock(impl="pallas_pack_interpret", packed=True, **kw)
    out_pk = jnp.moveaxis(packed.apply(params, jnp.moveaxis(x, -1, 2)), 2, -1)
    np.testing.assert_allclose(
        np.asarray(out_pk), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )
