"""Stratified and hierarchical (PDF) ray sampling.

Pure-JAX oracle for the reference sampling stack:

- ``sample_along_rays``  <- SampleAlongRay  (MipHelpers.cs:611-631)
- ``sorted_piecewise_constant_pdf`` <- SortedPiecewiseConstantPDF
  (MipHelpers.cs:774-851)
- ``resample_along_rays`` <- ResampleAlongRay (MipHelpers.cs:634-666),
  including the blurpool (pad -> 2-tap max -> 2-tap avg + padding).

All functions are batched over rays, use ``jax.random`` keys (deterministic
per ray per level per step; the reference shares one mutable ``Random`` /
cuRAND state — SURVEY.md §7 "PRNG discipline"), and are jit-safe with static
shapes. Inverse-CDF inversion is a gather-free masked compare-and-reduce
over the bin axis (see ``sorted_piecewise_constant_pdf``) — a vmapped
searchsorted lowers to serialized gathers on TPU and measured ~26x slower.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_or_nothing_tpu.config import RayShape
from nerf_or_nothing_tpu.ops.ipe import cast_rays


def sample_along_rays(
    key: jax.Array,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    radii: jnp.ndarray,
    num_samples: int,
    near: jnp.ndarray,
    far: jnp.ndarray,
    randomized: bool,
    lin_disp: bool,
    ray_shape: RayShape,
    diag: bool = True,
):
    """Stratified sampling along each ray (MipHelpers.cs:611-631).

    Linspace in t (or linear in disparity), then per-bin jitter between
    adjacent midpoints: t_vals <- [t0, mid_0..mid_{S-1}] + U*(next - cur),
    exactly the reference's shifted-midpoint scheme (:625-629).

    Args:
      origins/directions: [R, 3]; radii/near/far: [R, 1].
    Returns:
      t_vals [R, S+1], (means [R, S, 3], covs [R, S, 3]).
    """
    num_rays = origins.shape[0]
    dtype = origins.dtype
    t = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=dtype)
    if lin_disp:
        t_vals = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        t_vals = near * (1.0 - t) + far * t  # [R, S+1]

    if randomized:
        mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        # Shifted sequence [t_0, mid_0, ..., mid_{S-1}]; jitter each of the
        # first S entries toward its successor (the reference updates in
        # ascending order against already-jittered values; with U in [0,1)
        # the sequence stays sorted and matches the same distribution family).
        shifted = jnp.concatenate([t_vals[..., :1], mids], axis=-1)
        upper = jnp.concatenate([mids, t_vals[..., -1:]], axis=-1)
        u = jax.random.uniform(key, (num_rays, num_samples + 1), dtype=dtype)
        t_vals = shifted + (upper - shifted) * u
    means, covs = cast_rays(t_vals, origins, directions, radii, ray_shape,
                            diag)
    return t_vals, (means, covs)


def sorted_piecewise_constant_pdf(
    key: jax.Array,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    randomized: bool,
) -> jnp.ndarray:
    """Stratified inverse-CDF sampling (MipHelpers.cs:774-851).

    Args:
      bins: [R, B+1] sorted t boundaries; weights: [R, B] >= 0.
    Returns:
      [R, num_samples] sorted samples.
    """
    dtype = bins.dtype
    eps = jnp.asarray(1e-5, dtype)
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [
            jnp.zeros_like(cdf[..., :1]),
            cdf,
            jnp.ones_like(cdf[..., :1]),
        ],
        axis=-1,
    )  # [R, B+1]

    if randomized:
        s = 1.0 / num_samples
        u = jnp.arange(num_samples, dtype=dtype) * s
        u = u + jax.random.uniform(
            key, (*cdf.shape[:-1], num_samples), dtype=dtype, maxval=s - 1e-7
        )
        u = jnp.minimum(u, 1.0 - 1e-7)
    else:
        # Deterministic low-discrepancy samples spanning [0, 1-eps]
        # (canonical mip-NeRF; the reference ignores `randomized` here).
        u = jnp.linspace(0.0, 1.0 - 1e-7, num_samples, dtype=dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))

    # Invert the CDF: for each u find the bracketing (cdf[i], cdf[i+1]).
    # Gather-free masked reduction over the bin axis — a [B+1, N] compare +
    # reduce per ray vectorizes perfectly on the VPU, whereas a vmapped
    # searchsorted lowers to serialized gathers on TPU (measured 17 ms for
    # 1024x128 vs <1 ms for this form; same semantics as the reference's
    # binary search at MipHelpers.cs:822-848: largest i with cdf[i] <= u).
    mask = u[..., None, :] >= cdf[..., :, None]  # [R, B+1, N]
    neg = jnp.asarray(-jnp.inf, dtype)
    pos = jnp.asarray(jnp.inf, dtype)

    def masked_max(x):
        return jnp.max(jnp.where(mask, x[..., :, None], neg), axis=-2)

    def masked_min(x):
        return jnp.min(jnp.where(mask, pos, x[..., :, None]), axis=-2)

    bins_g0 = masked_max(bins)
    bins_g1 = masked_min(bins)
    cdf_g0 = masked_max(cdf)
    cdf_g1 = masked_min(cdf)

    denom = cdf_g1 - cdf_g0
    t = jnp.where(denom > 0, (u - cdf_g0) / denom, 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    return bins_g0 + t * (bins_g1 - bins_g0)


def resample_along_rays(
    key: jax.Array,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    radii: jnp.ndarray,
    t_vals: jnp.ndarray,
    weights: jnp.ndarray,
    randomized: bool,
    ray_shape: RayShape,
    resample_padding: float,
    stop_grad: bool = True,
    diag: bool = True,
):
    """Hierarchical resampling from coarse weights (MipHelpers.cs:634-666).

    Blurpool: pad weights on both ends, 2-tap max, then 2-tap average plus
    ``resample_padding`` (:646-661); then inverse-CDF draw of S+1 new
    t boundaries.

    Args:
      t_vals: [R, S+1]; weights: [R, S].
    """
    # Blurpool (maxpool then avgpool over the padded weight histogram).
    w_pad = jnp.concatenate(
        [weights[..., :1], weights, weights[..., -1:]], axis=-1
    )  # [R, S+2]
    w_max = jnp.maximum(w_pad[..., :-1], w_pad[..., 1:])  # [R, S+1]
    w_blur = 0.5 * (w_max[..., :-1] + w_max[..., 1:]) + resample_padding

    if stop_grad:
        w_blur = jax.lax.stop_gradient(w_blur)
        t_vals = jax.lax.stop_gradient(t_vals)

    new_t_vals = sorted_piecewise_constant_pdf(
        key, t_vals, w_blur, t_vals.shape[-1], randomized
    )
    means, covs = cast_rays(new_t_vals, origins, directions, radii, ray_shape,
                            diag)
    return new_t_vals, (means, covs)
