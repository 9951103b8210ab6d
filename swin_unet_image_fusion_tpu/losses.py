"""Unsupervised fusion objective: MS-SSIM + Sobel-texture + max-intensity L1.

Functional re-design of the reference ``MyLoss`` (``/root/reference/a008_loss.py``):
stateless pure functions returning ``(total_loss, per_term_dict)`` so the whole loss
fuses into the jitted train step. The per-term dict stays on device — no ``.item()``
per step (the reference syncs the device every iteration at a008_loss.py:274-275; we log
asynchronously instead). Running means live in host-side metric accumulators
(``utils/meters.py``), not in module state.

Term semantics (reference a008_loss.py:89-282, weights A000_CONFIG.py:32-52):
  ssim      = [MS-SSIM(fus, ir) * w_ir + MS-SSIM(fus, vis) * (1-w_ir)] * ssim_scale
  texture   = mean|sobel(fus) - max(sobel(ir), sobel(vis))| * texture_scale
  intensity = ||fus - max(ir, vis)||_1 / numel * intensity_scale
  psnr      = optional, off by default
  total     = sum(term * ratio), ratios 1/3 each.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from .config import LossConfig
from .ops.edges import sobel_magnitude
from .ops.ssim import ms_ssim_l1_loss, psnr_loss, ssim_loss


def ssim_term(
    cfg: LossConfig, fusion: jnp.ndarray, ir: jnp.ndarray, vis: jnp.ndarray
) -> jnp.ndarray:
    """Reference a008_loss.py:89-131 (weights 0.2 ir / 0.8 vis by default)."""
    if cfg.choose_ms_ssim:
        fus_ir = ms_ssim_l1_loss(fusion, ir)
        fus_vis = ms_ssim_l1_loss(fusion, vis)
    else:
        # kornia ssim_loss is (1-ssim)/2; the reference doubles it (a008:112-127)
        fus_ir = 2.0 * ssim_loss(fusion, ir, window_size=cfg.ssim_window_size)
        fus_vis = 2.0 * ssim_loss(fusion, vis, window_size=cfg.ssim_window_size)
    w = cfg.fus_ir_ssim_weight
    return fus_ir * w + fus_vis * (1.0 - w)


def texture_term(
    cfg: LossConfig, fusion: jnp.ndarray, ir: jnp.ndarray, vis: jnp.ndarray
) -> jnp.ndarray:
    """Reference a008_loss.py:161-199: fused edges should dominate both inputs'.

    With ``choose_canny_else_sobel`` the reference uses kornia Canny's *binary edge
    map* (``a008:187-192``, the second return value) — which carries no gradient there
    either; it ships and trains with Sobel.
    """
    if cfg.choose_canny_else_sobel:
        from .ops.edges import canny

        edge_fus = canny(fusion)[1]
        edge_ir = canny(ir)[1]
        edge_vis = canny(vis)[1]
    else:
        edge_fus = sobel_magnitude(fusion)
        edge_ir = sobel_magnitude(ir)
        edge_vis = sobel_magnitude(vis)
    return jnp.mean(jnp.abs(edge_fus - jnp.maximum(edge_ir, edge_vis)))


def intensity_term(
    fusion: jnp.ndarray, ir: jnp.ndarray, vis: jnp.ndarray
) -> jnp.ndarray:
    """Reference a008_loss.py:201-224: L1 toward the elementwise-max image."""
    target = jnp.maximum(ir, vis)
    return jnp.sum(jnp.abs(fusion - target)) / fusion.size


def psnr_term(
    cfg: LossConfig, fusion: jnp.ndarray, ir: jnp.ndarray, vis: jnp.ndarray
) -> jnp.ndarray:
    w = cfg.fus_ir_psnr_weight
    return psnr_loss(fusion, ir) * w + psnr_loss(fusion, vis) * (1.0 - w)


def total_fusion_loss(
    cfg: LossConfig, fusion: jnp.ndarray, ir: jnp.ndarray, vis: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted total + per-term breakdown (reference a008_loss.py:226-282).

    All returned values are 0-d device arrays; callers decide when to sync.
    """
    the_ssim = ssim_term(cfg, fusion, ir, vis) * cfg.ssim_scale
    texture = texture_term(cfg, fusion, ir, vis) * cfg.texture_scale
    intensity = intensity_term(fusion, ir, vis) * cfg.intensity_scale
    if cfg.use_psnr:
        psnr = psnr_term(cfg, fusion, ir, vis) * cfg.psnr_scale
    else:
        psnr = jnp.asarray(0.0, jnp.float32)

    total = (
        the_ssim * cfg.ssim_loss_ratio
        + texture * cfg.texture_loss_ratio
        + intensity * cfg.intensity_loss_ratio
        + psnr * cfg.psnr_loss_ratio
    )
    terms = {
        "ssim_loss": the_ssim,
        "texture_loss": texture,
        "intensity_loss": intensity,
        "psnr_loss": psnr,
        "total_loss": total,
    }
    return total, terms
