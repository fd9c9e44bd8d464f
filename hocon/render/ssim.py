"""Windowed SSIM for the photometric-consistency loss.

Reference parity: the reference's pytorch-ssim-style util (SURVEY.md §2.2,
"SSIM loss") — Gaussian-windowed SSIM per pixel, used masked inside the
rendered silhouette.

TPU mapping: the separable Gaussian blur is computed as two BANDED-MATRIX
MATMULS (columns: X @ G_w^T, rows: G_h @ X) instead of depthwise
convolutions. Depthwise NHWC convs put the channel dim (C=3) in the lane
axis — 3 of 128 lanes busy; the banded matmuls put W in the lanes and run
on the MXU, which is idle in this phase of the step (measured 7.8 ms ->
~1 ms fwd+bwd for 5 blurred fields at 16x256^2). The band matrix
reproduces zero-padded 'SAME' convolution exactly, so the result is
bit-comparable to the conv formulation (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01**2
_C2 = 0.03**2


@functools.lru_cache(maxsize=16)
def _band_matrix_np(n: int, window_size: int, sigma: float) -> np.ndarray:
    """(n, n) banded Gaussian-blur matrix == zero-padded SAME conv."""
    half = (window_size - 1) / 2.0
    x = np.arange(window_size, dtype=np.float64) - half
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g /= g.sum()
    m = np.zeros((n, n), np.float64)
    r = (window_size - 1) // 2
    for t in range(window_size):
        off = t - r
        # Explicit index arithmetic (writing through np.diagonal's view is
        # deprecated and will break on a future NumPy).
        rows = np.arange(max(0, -off), min(n, n - off))
        m[rows, rows + off] += g[t]
    return m.astype(np.float32)


def _window_mean_cf(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian filter via banded matmuls (exact: g2d = g (x) g).

    x: CHANNELS-FIRST (B, C, H, W) so both matmuls have large M/N/K
    ((B*C*H, W) @ (W, W), then (H, H) @ (H, W) batched over B*C) — full MXU
    tiles, W in the lane axis. Precision HIGHEST keeps the moments exact in
    f32 (the variance terms cancel catastrophically in bf16).
    """
    h, w = x.shape[-2], x.shape[-1]
    gw = jnp.asarray(_band_matrix_np(w, window_size, sigma), x.dtype)
    gh = jnp.asarray(_band_matrix_np(h, window_size, sigma), x.dtype)
    y = jnp.einsum("...hw,vw->...hv", x, gw,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("...hw,uh->...uw", y, gh,
                      precision=jax.lax.Precision.HIGHEST)


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
    a = jnp.moveaxis(img_a, -1, 1)  # (B, C, H, W) — lanes = W
    b = jnp.moveaxis(img_b, -1, 1)
    mu_a = _window_mean_cf(a, window_size, sigma)
    mu_b = _window_mean_cf(b, window_size, sigma)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = _window_mean_cf(a * a, window_size, sigma) - mu_aa
    var_b = _window_mean_cf(b * b, window_size, sigma) - mu_bb
    cov = _window_mean_cf(a * b, window_size, sigma) - mu_ab
    num = (2.0 * mu_ab + _C1) * (2.0 * cov + _C2)
    den = (mu_aa + mu_bb + _C1) * (var_a + var_b + _C2)
    return jnp.mean(num / den, axis=1)  # mean over channels -> (B, H, W)


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
