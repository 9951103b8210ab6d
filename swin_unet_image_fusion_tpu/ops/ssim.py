"""SSIM / MS-SSIM in pure jnp (kornia-parity, differentiable, fuses into the train step).

The reference's SSIM term (``/root/reference/a008_loss.py:89-131``) calls either
``kornia.losses.MS_SSIMLoss()`` (default, ``A000_CONFIG.py:34``) or
``2 * kornia.losses.ssim_loss(win=11, max_val=1, padding='same')``.

kornia's ``MS_SSIMLoss`` is the mixed MS-SSIM + Gaussian-weighted-L1 objective of
Zhao et al., "Loss Functions for Image Restoration With Neural Networks" (TCI 2017):
per-scale Gaussian filters with sigmas (0.5, 1, 2, 4, 8), luminance from the coarsest
scale, contrast-structure product across scales, mixed with an L1 term smoothed by the
largest-sigma Gaussian, scaled by ``compensation=200`` and ``alpha=0.025``. This module
reimplements that objective in jnp with the same defaults, plus the single-scale
``ssim_loss`` (Gaussian window, sigma 1.5) used when ``choose_ms_ssim=False``.

Layout: NHWC, single- or multi-channel. All convolutions are depthwise
(``feature_group_count=C``) so they lower to cheap VPU ops on TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MS_SIGMAS: Tuple[float, ...] = (0.5, 1.0, 2.0, 4.0, 8.0)


def gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    """Normalised 1-D Gaussian, matching kornia/Zhao ``_fspecial_gauss_1d``."""
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def gaussian_kernel_2d(size: int, sigma: float) -> np.ndarray:
    g = gaussian_kernel_1d(size, sigma)
    return np.outer(g, g)


def _depthwise_conv_nhwc(
    x: jnp.ndarray, kernels: jnp.ndarray, padding: str | Sequence[Tuple[int, int]]
) -> jnp.ndarray:
    """Depthwise 2-D conv. x: (B, H, W, C); kernels: (kh, kw, C, mult) HWIO.

    Returns (B, H', W', C * mult) with per-input-channel outputs grouped contiguously
    (all multipliers of channel 0, then channel 1, ...), matching torch's grouped-conv
    channel layout used by the Zhao-loss reference implementation.
    """
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x,
        kernels,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


@functools.lru_cache(maxsize=32)
def _band_matrices(
    bank_key: Tuple[Tuple[float, ...], ...], h: int, w: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Band matrices for the separable blur as MXU matmuls.

    bank_key: tuple of per-slot 1-D kernels (each a tuple of taps, length=size).
    Returns BH (M, h+size-1, h) and BW (M, w+size-1, w) with
    B[m, p, u] = bank[m][p - u] — einsum-contracting the padded axis against
    these computes the same VALID conv. 4x the FLOPs of the 1-D convs but at
    MXU speed instead of the ~220 GFLOP/s XLA manages on 5-lane-wide depthwise
    convs (measured: the conv form was still ~25 ms of the 206 ms train step).
    """
    bank = np.asarray(bank_key, np.float32)  # (M, size)
    m, size = bank.shape

    def band(n_out):
        b = np.zeros((m, n_out + size - 1, n_out), np.float32)
        for d in range(size):
            idx = np.arange(n_out)
            b[:, idx + d, idx] = bank[:, d : d + 1]
        return b

    return band(h), band(w)


def _gaussian_band_nhwc(x: jnp.ndarray, bank: np.ndarray, out_hw) -> jnp.ndarray:
    """Separable blur via band-matrix einsums. x: (B, Hp, Wp, M) padded, one slot
    per channel; bank: (size, M) per-slot taps; returns (B, H, W, M)."""
    h, w = out_hw
    key = tuple(tuple(float(v) for v in bank[:, m]) for m in range(bank.shape[1]))
    bh, bw = _band_matrices(key, h, w)
    hi = jax.lax.Precision.HIGHEST
    mid = jnp.einsum("bhwm,mhu->buwm", x, jnp.asarray(bh), precision=hi)
    return jnp.einsum("buwm,mwv->buvm", mid, jnp.asarray(bw), precision=hi)


def _separable_gaussian_nhwc(
    x: jnp.ndarray, kv: jnp.ndarray, kh: jnp.ndarray
) -> jnp.ndarray:
    """Depthwise Gaussian bank as two 1-D valid convs (exactly separable).

    x: (B, H, W, C); kv: (size, 1, 1, C*mult) column pass (groups=C, mult outputs
    per channel, contiguous per input channel); kh: (1, size, 1, C*mult) row pass
    (groups=C*mult). The 2-D bank is ``outer(g, g)`` per sigma, so two 1-D passes
    are the same operator with ~size/2 x fewer FLOPs — the 33-tap MS-SSIM bank ran
    as 2-D 33x33 convs at 10.9 GFLOP each and dominated the measured train step
    (six 41 ms fusions at 224^2 bs=20; docs/BENCHMARKS.md).
    """
    c = x.shape[-1]
    mid = jax.lax.conv_general_dilated(
        x, kv, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        mid, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mid.shape[-1],
    )


def _pad_zeros(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])


@functools.lru_cache(maxsize=8)
def _ms_ssim_kernels(num_channels: int, sigmas: Tuple[float, ...]) -> np.ndarray:
    """(kh, kw, 1, C*n_sigmas) grouped-conv kernel stack (HWIO, groups=C): per input
    channel, the n_sigmas Gaussian masks. Filter size = 4*max_sigma+1 (=33)."""
    size = int(4 * sigmas[-1] + 1)
    ks = np.stack([gaussian_kernel_2d(size, s) for s in sigmas], axis=-1)  # (kh,kw,S)
    ks = np.tile(ks[:, :, None, :], (1, 1, 1, num_channels))  # (kh,kw,1,C*S)
    return ks.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _ms_ssim_kernels_1d(
    num_channels: int, sigmas: Tuple[float, ...]
) -> Tuple[np.ndarray, np.ndarray]:
    """Separable form of :func:`_ms_ssim_kernels`: column pass (size, 1, 1, C*S)
    with groups=C, row pass (1, size, 1, C*S) with groups=C*S."""
    size = int(4 * sigmas[-1] + 1)
    g = np.stack([gaussian_kernel_1d(size, s) for s in sigmas], axis=-1)  # (size, S)
    bank = np.tile(g, (1, num_channels))  # (size, C*S), same slot order as the 2-D bank
    kv = bank[:, None, None, :].astype(np.float32)   # (size, 1, 1, C*S)
    kh = bank[None, :, None, :].astype(np.float32)   # (1, size, 1, C*S)
    return kv, kh


def ms_ssim_l1_loss(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    *,
    sigmas: Tuple[float, ...] = DEFAULT_MS_SIGMAS,
    data_range: float = 1.0,
    k: Tuple[float, float] = (0.01, 0.03),
    alpha: float = 0.025,
    compensation: float = 200.0,
) -> jnp.ndarray:
    """kornia ``MS_SSIMLoss`` parity: mixed MS-SSIM + Gaussian-weighted L1 (Zhao et al.).

    img1/img2: (B, H, W, C) in [0, data_range]. Returns the scalar mean loss.

    kornia builds its Gaussian mask bank **triplicated per sigma** — shape
    ``(3*n_sigmas, 1, 33, 33)``, RGB-interleaved — and applies it with ``groups=C``.
    The resulting 15-slot channel stack maps slot ``j`` to input channel
    ``j // (3*n_sigmas // C)`` filtered at sigma ``j // 3``; the luminance term is
    the product of the three *coarsest slots* and the cs term the product over all
    slots. For the reference's 1-channel images that cubes both products relative to
    the textbook formula — preserved here exactly (golden-tested against the torch
    ground truth in ``tests/kornia_ref.py``).
    """
    c = img1.shape[-1]
    n_s = len(sigmas)
    if (3 * n_s) % c or 3 % c:
        raise ValueError(
            f"kornia's grouped MS-SSIM mask bank supports C in (1, 3); got C={c}"
        )
    kv, _ = _ms_ssim_kernels_1d(c, tuple(sigmas))
    bank = kv[:, 0, 0, :]  # (size, C*S) per-slot taps
    pad = int(2 * sigmas[-1])
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2

    hw_out = img1.shape[1:3]
    slot_channels = np.arange(c * n_s) // n_s  # channel-major slot grouping
    x = _pad_zeros(img1.astype(jnp.float32), pad)
    y = _pad_zeros(img2.astype(jnp.float32), pad)

    # all filtered maps: (B, H, W, C*n_s), channel-major grouping (c0s0, c0s1, ..)
    blur = lambda a: _gaussian_band_nhwc(a[..., slot_channels], bank, hw_out)
    mux = blur(x)
    muy = blur(y)
    mux2, muy2, muxy = mux * mux, muy * muy, mux * muy
    sigmax2 = blur(x * x) - mux2
    sigmay2 = blur(y * y) - muy2
    sigmaxy = blur(x * y) - muxy

    l_map = (2.0 * muxy + c1) / (mux2 + muy2 + c1)  # luminance per (channel, scale)
    cs_map = (2.0 * sigmaxy + c2) / (sigmax2 + sigmay2 + c2)

    b, h, w, _ = l_map.shape
    l_map = l_map.reshape(b, h, w, c, n_s)
    cs_map = cs_map.reshape(b, h, w, c, n_s)

    # kornia's grouped-conv slot layout: slot j -> (channel j // (3*n_s//C), sigma j//3)
    slots = np.arange(3 * n_s)
    slot_ch = slots // (3 * n_s // c)
    slot_sigma = slots // 3

    # luminance: product of the three coarsest slots (cubed for C=1)
    lm = jnp.prod(l_map[..., slot_ch[-3:], slot_sigma[-3:]], axis=-1)  # (B, H, W)
    # contrast-structure: product over all 3*n_s slots
    pics = jnp.prod(cs_map[..., slot_ch, slot_sigma], axis=-1)
    loss_ms_ssim = 1.0 - lm * pics  # (B, H, W)

    # L1 smoothed by the largest-sigma Gaussian; the final 3 masks map to input
    # channel j // (3 // C), averaged (for C=1: three identical maps)
    l1 = jnp.abs(img1.astype(jnp.float32) - img2.astype(jnp.float32))
    # the coarsest-sigma mask for each input channel (out channel ch*n_s + n_s-1)
    sel = np.arange(c) * n_s + (n_s - 1)
    smoothed = _gaussian_band_nhwc(
        _pad_zeros(l1, pad), bank[:, sel], hw_out
    )  # (B, H, W, C)
    l1_ch = np.arange(3) // (3 // c)
    gaussian_l1 = smoothed[..., l1_ch].mean(-1)

    loss_mix = alpha * loss_ms_ssim + (1.0 - alpha) * gaussian_l1 / data_range
    return compensation * loss_mix.mean()


@functools.lru_cache(maxsize=8)
def _ssim_kernel(num_channels: int, window_size: int, sigma: float) -> np.ndarray:
    k2 = gaussian_kernel_2d(window_size, sigma)
    return np.tile(k2[:, :, None, None], (1, 1, 1, num_channels)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _ssim_kernel_1d(
    num_channels: int, window_size: int, sigma: float
) -> Tuple[np.ndarray, np.ndarray]:
    g = gaussian_kernel_1d(window_size, sigma)
    bank = np.tile(g[:, None], (1, num_channels))
    return (
        bank[:, None, None, :].astype(np.float32),  # (size, 1, 1, C)
        bank[None, :, None, :].astype(np.float32),  # (1, size, 1, C)
    )


def ssim_index(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    *,
    window_size: int = 11,
    max_val: float = 1.0,
    sigma: float = 1.5,
    k: Tuple[float, float] = (0.01, 0.03),
    padding: str = "same",
) -> jnp.ndarray:
    """Per-pixel SSIM map, kornia ``kornia.metrics.ssim`` parity (Gaussian window).

    kornia filters through ``filter2d`` whose default border is **reflect**, so
    ``padding='same'`` reflect-pads the inputs before the valid conv (keeping the
    input resolution); ``padding='valid'`` crops the border instead.
    """
    c = img1.shape[-1]
    # separable 1-D convs (not the band-matmul form): the MXU's f32 accumulation
    # order drifts ~1.2e-5 relative on the division-heavy single-scale map, past
    # the 1e-5 golden bar; the 11-tap convs are cheap enough anyway
    kv, kh = (jnp.asarray(a) for a in _ssim_kernel_1d(c, window_size, sigma))
    c1 = (k[0] * max_val) ** 2
    c2 = (k[1] * max_val) ** 2

    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    pad = window_size // 2
    x = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    y = jnp.pad(y, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")

    blur = lambda a: _separable_gaussian_nhwc(a, kv, kh)
    mux = blur(x)
    muy = blur(y)
    mux2, muy2, muxy = mux * mux, muy * muy, mux * muy
    sigmax2 = blur(x * x) - mux2
    sigmay2 = blur(y * y) - muy2
    sigmaxy = blur(x * y) - muxy

    ssim_map = ((2.0 * muxy + c1) * (2.0 * sigmaxy + c2)) / (
        (mux2 + muy2 + c1) * (sigmax2 + sigmay2 + c2)
    )
    if padding == "valid":
        ssim_map = ssim_map[:, pad:-pad, pad:-pad, :]
    return ssim_map


def ssim_loss(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    *,
    window_size: int = 11,
    max_val: float = 1.0,
) -> jnp.ndarray:
    """kornia ``ssim_loss`` parity: mean of clamp((1 - SSIM)/2, 0, 1)
    (a008_loss.py:112-127 doubles it)."""
    s = ssim_index(img1, img2, window_size=window_size, max_val=max_val)
    return jnp.clip((1.0 - s) / 2.0, 0.0, 1.0).mean()


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val**2 / mse)


def psnr_loss(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """kornia ``PSNRLoss`` parity: negative PSNR (a008_loss.py:64-73)."""
    return -psnr(img1, img2, max_val)
