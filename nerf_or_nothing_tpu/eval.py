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
    linear_to_srgb,
    mse_to_psnr,
)
from nerf_or_nothing_tpu.rays import Rays


def to_display(cfg: Config, img: np.ndarray) -> np.ndarray:
    """Model/dataset color -> display space.

    With ``cfg.linear_color`` the model trains on linearized pixels
    (srgb_to_linear at dataset load), so rendered radiance AND stored
    ground truth are re-encoded with the reference's ``linear_to_srgb``
    (MipHelpers.cs:755-757) before metrics or PNG export. Identity
    otherwise."""
    if cfg.linear_color:
        return np.asarray(linear_to_srgb(jnp.asarray(img)))
    return np.asarray(img)


def make_render_fn(cfg: Config, mlp_apply=None, mesh=None):
    """jit'd deterministic forward returning the fine level's rgb/dist/acc.

    With ``mesh``, the forward runs data-parallel under ``shard_map``:
    params replicated, rays sharded over the 'batch' axis — full-image
    renders then use every chip of the mesh (the chunked driver in
    ``render_image`` feeds batch-sharded chunks). Required for the Pallas
    kernels, which GSPMD cannot auto-partition.
    """

    def render_fn(params, key, rays: Rays):
        results = mipnerf.render_rays(
            params, cfg, key, rays,
            randomized=False, white_bkgd=cfg.white_bkgd,
            mlp_apply=mlp_apply, inference=True,
        )
        fine = results[-1]
        return fine.rgb, fine.distance, fine.acc

    if mesh is None:
        return jax.jit(render_fn)

    from jax.sharding import PartitionSpec as P

    from nerf_or_nothing_tpu.parallel.mesh import BATCH_AXIS

    sharded = jax.shard_map(
        render_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(BATCH_AXIS)),
        out_specs=P(BATCH_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)


def render_image(
    render_fn,
    params,
    rays: Rays,
    height: int,
    width: int,
    chunk: int = 8192,
    key: Optional[jax.Array] = None,
    mesh=None,
):
    """Render a full image in fixed-size chunks (static shapes -> one compile).

    Args:
      rays: flattened leaves [H*W, C].
      mesh: when given (with a mesh-built render_fn), each chunk is placed
        batch-sharded across the mesh before the sharded forward.
    Returns:
      rgb [H, W, 3], distance [H, W], acc [H, W].
    """
    key = jax.random.PRNGKey(0) if key is None else key
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nerf_or_nothing_tpu.parallel.mesh import BATCH_AXIS

        n_dev = mesh.devices.size
        chunk = ((chunk + n_dev - 1) // n_dev) * n_dev
        batch_sharding = NamedSharding(mesh, P(BATCH_AXIS))
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
        if batch_sharding is not None:
            chunk_rays = Rays(
                *[jax.device_put(x, batch_sharding) for x in chunk_rays]
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

    ``avg_error`` (MipHelpers.cs:677-684) takes an LPIPS value the
    reference cannot produce (no LPIPS network in-repo — a dead limb
    there). Here the slot is LIVE: pass a real LPIPS as ``lpips`` if one
    is available; otherwise the self-contained deterministic perceptual
    distance (``ops.perceptual``, random-feature LPIPS architecture) fills
    it, reported as ``lpips_proxy`` to keep the provenance explicit.
    """
    pred = jnp.asarray(np.clip(pred, 0.0, 1.0))
    gt = jnp.asarray(gt)
    mse = jnp.mean((pred - gt) ** 2)
    psnr = float(mse_to_psnr(mse))
    ssim = float(compute_ssim(pred, gt, max_val=1.0))
    out = {"mse": float(mse), "psnr": psnr, "ssim": ssim}
    if lpips is not None:
        out["lpips"] = lpips
    else:
        from nerf_or_nothing_tpu.ops.perceptual import perceptual_distance

        lpips = float(perceptual_distance(pred, gt))
        out["lpips_proxy"] = lpips
    out["avg_error"] = float(compute_avg_error(psnr, ssim, lpips))
    return out


def evaluate_dataset(
    cfg: Config,
    params,
    dataset,
    max_images: Optional[int] = None,
    mlp_apply=None,
    mesh=None,
) -> dict:
    """Mean metrics over (a prefix of) a test dataset.

    With ``mesh``, rendering is data-parallel over the mesh's 'batch' axis.
    """
    render_fn = make_render_fn(cfg, mlp_apply=mlp_apply, mesh=mesh)
    n = dataset.num_images if max_images is None else min(
        max_images, dataset.num_images
    )
    metrics = []
    for i in range(n):
        rays, gt = dataset.image_rays(i)
        rays = Rays(*[jnp.asarray(x) for x in rays])
        h, w = dataset.image_dims(i)  # per-image: Multicam mixes resolutions
        rgb, _, _ = render_image(
            render_fn, params, rays, h, w, cfg.render_chunk_size, mesh=mesh
        )
        metrics.append(evaluate_image(
            to_display(cfg, rgb),
            to_display(cfg, np.asarray(gt).reshape(h, w, 3)),
        ))
    return {
        k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]
    }
