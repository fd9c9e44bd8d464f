"""Windowed SSIM for the photometric-consistency loss.

Reference parity: the reference's pytorch-ssim-style util (SURVEY.md §2.2,
"SSIM loss") — Gaussian-windowed SSIM per pixel, used masked inside the
rendered silhouette. Implemented as depthwise convolutions, which XLA fuses
and maps onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C1 = 0.01**2
_C2 = 0.03**2


def _gaussian_kernel(window_size: int, sigma: float, dtype) -> jnp.ndarray:
    half = (window_size - 1) / 2.0
    x = jnp.arange(window_size, dtype=dtype) - half
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)  # (K,)


def _window_mean(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian filter (exact: g2d = g (x) g).

    Two 1-D depthwise convs (2K taps) instead of one KxK (K^2 taps) —
    depthwise convs run on the VPU, so this is a ~K/2x win on TPU.
    """
    c = x.shape[-1]
    k = kernel.shape[0]
    ones_c = jnp.ones((1, 1, 1, c), x.dtype)
    kv = kernel[:, None, None, None] * ones_c  # (K,1,1,C)
    kh = kernel[None, :, None, None] * ones_c  # (1,K,1,C)
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, kv, (1, 1), [((k - 1) // 2, (k - 1) // 2), (0, 0)],
        dimension_numbers=dn, feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        y, kh, (1, 1), [(0, 0), ((k - 1) // 2, (k - 1) // 2)],
        dimension_numbers=dn, feature_group_count=c,
    )


def ssim(
    img_a: jnp.ndarray,
    img_b: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Per-pixel SSIM map between two images.

    Args:
      img_a, img_b: (B, H, W, C) in [0, 1].

    Returns:
      (B, H, W) SSIM map (mean over channels), values in [-1, 1].
    """
    kernel = _gaussian_kernel(window_size, sigma, img_a.dtype)
    mu_a = _window_mean(img_a, kernel)
    mu_b = _window_mean(img_b, kernel)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = _window_mean(img_a * img_a, kernel) - mu_aa
    var_b = _window_mean(img_b * img_b, kernel) - mu_bb
    cov = _window_mean(img_a * img_b, kernel) - mu_ab
    num = (2.0 * mu_ab + _C1) * (2.0 * cov + _C2)
    den = (mu_aa + mu_bb + _C1) * (var_a + var_b + _C2)
    return jnp.mean(num / den, axis=-1)


def ssim_loss(
    img_a: jnp.ndarray,
    img_b: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    window_size: int = 11,
) -> jnp.ndarray:
    """Masked DSSIM loss: mean over masked pixels of (1 - SSIM) / 2."""
    s = ssim(img_a, img_b, window_size=window_size)
    d = (1.0 - s) * 0.5
    if mask is None:
        return jnp.mean(d)
    return jnp.sum(d * mask) / (jnp.sum(mask) + 1e-6)
