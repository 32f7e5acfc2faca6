"""Metric / schedule / init math.

Pure-JAX equivalents of the reference ``MathHelpers`` (MipHelpers.cs:669-852):

- ``mse_to_psnr`` / ``psnr_to_mse``   (MipHelpers.cs:672-674)
- ``glorot_uniform``                  (MipHelpers.cs:675)
- ``compute_avg_error``               (MipHelpers.cs:677-684)
- ``compute_ssim``                    (MipHelpers.cs:685-736) — vectorized
  separable-Gaussian SSIM instead of the reference's O(HWk^2) scalar convolve
- ``linear_to_srgb`` / ``srgb_to_linear`` (MipHelpers.cs:755-757)
- ``learning_rate_decay``             (MipHelpers.cs:758-773)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LN10 = 2.3025850929940456840179914546844


def mse_to_psnr(mse):
    return -10.0 / _LN10 * jnp.log(mse)


def psnr_to_mse(psnr):
    return jnp.exp(-0.1 * _LN10 * psnr)


def glorot_uniform(key: jax.Array, fan_in: int, fan_out: int, shape):
    """U(-lim, lim), lim = sqrt(6/(fan_in+fan_out)) (MipHelpers.cs:675)."""
    lim = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        key, shape, minval=-lim, maxval=lim, dtype=jnp.float32
    )


def compute_avg_error(psnr, ssim, lpips):
    """Geometric mean of MSE, sqrt(DSSIM), LPIPS (MipHelpers.cs:677-684)."""
    mse = psnr_to_mse(psnr)
    dssim = jnp.sqrt(1.0 - ssim)
    return jnp.exp(jnp.mean(jnp.log(jnp.asarray([mse, dssim, lpips]))))


def linear_to_srgb(linear):
    return jnp.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * jnp.maximum(linear, 1e-10) ** (1.0 / 2.4) - 0.055,
    )


def srgb_to_linear(srgb):
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        (jnp.maximum(srgb, 0.0) / 1.055 + 0.055 / 1.055) ** 2.4,
    )


def learning_rate_decay(
    step,
    lr_init: float,
    lr_final: float,
    max_steps: int,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
):
    """Log-lerp LR with sine warmup delay (MipHelpers.cs:758-773).

    jit-safe in ``step`` (traced int or float).
    """
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_progress = jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * delay_progress
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(np.log(lr_init) * (1.0 - t) + np.log(lr_final) * t)
    return delay_rate * log_lerp


def _gaussian_filter_1d(size: int, sigma: float) -> np.ndarray:
    half = size // 2
    x = np.arange(size, dtype=np.float64) - half
    f = np.exp(-(x**2) / (2.0 * sigma**2))
    return (f / f.sum()).astype(np.float32)


def compute_ssim(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    return_map: bool = False,
):
    """SSIM with an 11x1/1x11 separable Gaussian (MipHelpers.cs:685-736).

    The reference uses a full 2D kernel and a naive scalar convolve
    (VectorImage.Convolve, MipHelpers.cs:920-944); a 2D Gaussian is separable
    so the separable form is numerically identical and TPU-friendly (two
    depthwise convs = two small matmuls per axis).

    Args:
      img0/img1: [H, W, C] in [0, max_val].
    """
    filt = jnp.asarray(_gaussian_filter_1d(filter_size, filter_sigma))
    hw = filter_size // 2

    def blur(img):
        # Same-size output with zero padding at borders, matching the
        # reference convolve's implicit zero-extension.
        def conv_axis(x, axis):
            x = jnp.moveaxis(x, axis, -1)  # [..., N]
            pad = [(0, 0)] * (x.ndim - 1) + [(hw, hw)]
            xp = jnp.pad(x, pad)
            n = x.shape[-1]
            # im2col over the last axis: [..., N, K] @ [K] -> [..., N]
            idx = jnp.arange(n)[:, None] + jnp.arange(filter_size)[None, :]
            out = jnp.einsum("...nk,k->...n", xp[..., idx], filt)
            return jnp.moveaxis(out, -1, axis)

        return conv_axis(conv_axis(img, 0), 1)

    mu0 = blur(img0)
    mu1 = blur(img1)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    sigma00 = jnp.maximum(blur(img0 * img0) - mu00, 0.0)
    sigma11 = jnp.maximum(blur(img1 * img1) - mu11, 0.0)
    sigma01 = jnp.maximum(blur(img0 * img1) - mu01, 0.0)

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else jnp.mean(ssim_map)
