"""Evaluation: chunked full-image rendering + image metrics.

The reference declares eval math (PSNR/SSIM/avg-error, MipHelpers.cs:669-736)
but never calls it, and its test-split init throws (Dataset.cs:107-110).
This module implements the working version (SURVEY.md §5.5): chunked renders
(``render_chunk_size`` rays at a time through one jit'd forward), PSNR, SSIM
and avg-error per the cited formulas, and sRGB conversion.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.models import mipnerf
from nerf_or_nothing_tpu.ops.math_utils import (
    compute_avg_error,
    compute_ssim,
    mse_to_psnr,
)
from nerf_or_nothing_tpu.rays import Rays


def make_render_fn(cfg: Config, mlp_apply=None):
    """jit'd deterministic forward returning the fine level's rgb/dist/acc."""

    @jax.jit
    def render_fn(params, key, rays: Rays):
        results = mipnerf.render_rays(
            params, cfg, key, rays,
            randomized=False, white_bkgd=cfg.white_bkgd,
            mlp_apply=mlp_apply,
        )
        fine = results[-1]
        return fine.rgb, fine.distance, fine.acc

    return render_fn


def render_image(
    render_fn,
    params,
    rays: Rays,
    height: int,
    width: int,
    chunk: int = 8192,
    key: Optional[jax.Array] = None,
):
    """Render a full image in fixed-size chunks (static shapes -> one compile).

    Args:
      rays: flattened leaves [H*W, C].
    Returns:
      rgb [H, W, 3], distance [H, W], acc [H, W].
    """
    key = jax.random.PRNGKey(0) if key is None else key
    n = rays.origins.shape[0]
    rgbs, dists, accs = [], [], []
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        sl = slice(start, end)
        chunk_rays = Rays(*[x[sl] for x in rays])
        pad = chunk - (end - start)
        if pad:
            chunk_rays = Rays(
                *[jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)]) for x in
                  chunk_rays]
            )
        rgb, dist, acc = render_fn(params, key, chunk_rays)
        rgbs.append(np.asarray(rgb[: end - start]))
        dists.append(np.asarray(dist[: end - start]))
        accs.append(np.asarray(acc[: end - start]))
    rgb = np.concatenate(rgbs).reshape(height, width, 3)
    dist = np.concatenate(dists).reshape(height, width)
    acc = np.concatenate(accs).reshape(height, width)
    return rgb, dist, acc


def evaluate_image(
    pred: np.ndarray, gt: np.ndarray, lpips: Optional[float] = None
) -> dict:
    """PSNR / SSIM / avg-error for one rendered image vs ground truth.

    avg_error needs an LPIPS value from an external network (the reference
    has none in-repo either, MipHelpers.cs:677-684); omitted when absent.
    """
    pred = jnp.asarray(np.clip(pred, 0.0, 1.0))
    gt = jnp.asarray(gt)
    mse = jnp.mean((pred - gt) ** 2)
    psnr = float(mse_to_psnr(mse))
    ssim = float(compute_ssim(pred, gt, max_val=1.0))
    out = {"mse": float(mse), "psnr": psnr, "ssim": ssim}
    if lpips is not None:
        out["lpips"] = lpips
        out["avg_error"] = float(compute_avg_error(psnr, ssim, lpips))
    return out


def evaluate_dataset(
    cfg: Config,
    params,
    dataset,
    max_images: Optional[int] = None,
    mlp_apply=None,
) -> dict:
    """Mean metrics over (a prefix of) a test dataset."""
    render_fn = make_render_fn(cfg, mlp_apply=mlp_apply)
    n = dataset.num_images if max_images is None else min(
        max_images, dataset.num_images
    )
    metrics = []
    for i in range(n):
        rays, gt = dataset.image_rays(i)
        rays = Rays(*[jnp.asarray(x) for x in rays])
        h, w = dataset.image_dims(i)  # per-image: Multicam mixes resolutions
        rgb, _, _ = render_image(
            render_fn, params, rays, h, w, cfg.render_chunk_size
        )
        metrics.append(evaluate_image(rgb, np.asarray(gt).reshape(h, w, 3)))
    return {
        k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]
    }
