"""Volume rendering (alpha compositing) forward and hand-derived VJP.

Pure-JAX oracle for:

- ``volumetric_rendering``       <- VolumetricRendering (MipHelpers.cs:472-493)
  / CachedVolumetricRendering (:494-515)
- its custom VJP                 <- VolumetricRenderingGradient
  (MipHelpers.cs:517-610) and the fused CUDA reverse scan
  (accelerated_functions.cu:362-402)

Semantics (canonical mip-NeRF == the reference C# path with the sample-count
off-by-one fixed):
  alpha_i = 1 - exp(-sigma_i * (t_{i+1} - t_i) * ||d||)
  T_0 = 1,  T_{i+1} = T_i * (1 - alpha_i)
  w_i = alpha_i * T_i
  rgb = sum_i w_i c_i (+ (1-acc) if white background)
  distance = clip(sum_i w_i mid_i / acc, t_0, t_S)   [stop-gradient aux]

The custom VJP exists for two reasons: (a) parity testing against the
reference's hand-derived math — a property test asserts custom-VJP ==
jax.grad of the plain composite; (b) it avoids materializing the cumprod
residual chain that plain autodiff would save, which matters once rendering
runs inside the fused Pallas pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RenderResult(NamedTuple):
    rgb: jnp.ndarray        # [R, 3]
    distance: jnp.ndarray   # [R]
    acc: jnp.ndarray        # [R]
    weights: jnp.ndarray    # [R, S]


def _compute_alpha_weights(
    density: jnp.ndarray, t_vals: jnp.ndarray, dirs: jnp.ndarray
):
    """alpha/transmittance/weights from densities (MipHelpers.cs:480-486)."""
    d_norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)  # [R, 1]
    delta = (t_vals[..., 1:] - t_vals[..., :-1]) * d_norm   # [R, S]
    s = density * delta
    alpha = 1.0 - jnp.exp(-s)
    # T_i = prod_{j<i} (1 - alpha_j), exclusive.
    trans = jnp.exp(-jnp.cumsum(s[..., :-1], axis=-1))
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans], axis=-1)
    weights = alpha * trans
    return alpha, trans, weights


def volumetric_rendering(
    rgb: jnp.ndarray,
    density: jnp.ndarray,
    t_vals: jnp.ndarray,
    dirs: jnp.ndarray,
    white_bkgd: bool,
) -> RenderResult:
    """Composite samples along each ray (MipHelpers.cs:472-493).

    Args:
      rgb: [R, S, 3] activated colors; density: [R, S] activated sigma;
      t_vals: [R, S+1]; dirs: [R, 3] (unnormalized — its norm scales delta).
    """
    alpha, trans, weights = _compute_alpha_weights(density, t_vals, dirs)
    comp_rgb = jnp.einsum("...s,...sc->...c", weights, rgb)
    acc = jnp.sum(weights, axis=-1)
    mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
    # Distance is an aux output (never differentiated in the reference).
    # Safe divide instead of generate-NaN-then-sanitize: keeps the
    # check_numerics (checkify) sanitizer quiet on benign empty-space rays;
    # acc==0 implies the numerator is 0 too, so the result (clamped to t0)
    # is identical.
    distance = jax.lax.stop_gradient(
        jnp.clip(
            jnp.sum(weights * mids, axis=-1) / jnp.maximum(acc, 1e-10),
            t_vals[..., 0],
            t_vals[..., -1],
        )
    )
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return RenderResult(comp_rgb, distance, acc, weights)


# ----------------------------------------------------------------------------
# Custom-VJP variant: the reference's hand-derived backward as one reverse scan
# ----------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def composite(rgb, density, t_vals, dirs, white_bkgd: bool):
    """Differentiable (rgb, acc, weights) composite with hand-written VJP."""
    alpha, trans, weights = _compute_alpha_weights(density, t_vals, dirs)
    comp_rgb = jnp.einsum("...s,...sc->...c", weights, rgb)
    acc = jnp.sum(weights, axis=-1)
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, acc, weights


def _composite_fwd(rgb, density, t_vals, dirs, white_bkgd):
    alpha, trans, weights = _compute_alpha_weights(density, t_vals, dirs)
    comp_rgb = jnp.einsum("...s,...sc->...c", weights, rgb)
    acc = jnp.sum(weights, axis=-1)
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return (comp_rgb, acc, weights), (
        rgb, density, t_vals, dirs, alpha, trans, weights,
    )


def _composite_bwd(white_bkgd, res, grads):
    """Hand-derived reverse pass (MipHelpers.cs:517-610).

    dL/dw_i  = g_rgb . c_i  (- sum(g_rgb) if white bkgd)  + g_acc + g_w_i
    dL/dc_i  = g_rgb * w_i
    backprop through w_i = alpha_i T_i and T_{i+1} = T_i (1 - alpha_i):
      dL/dalpha_i = dL/dw_i T_i - (sum_{j>i} dL/dw_j w_j) / (1 - alpha_i)
    (the reverse recurrence dL/dT telescopes into a reversed cumsum — this is
    the vectorized form of the reference's reverse scan at :572-578 and
    accelerated_functions.cu:379-401)
      dL/dsigma_i = dL/dalpha_i * exp(-s_i) * delta_i
    """
    rgb, density, t_vals, dirs, alpha, trans, weights = res
    g_rgb, g_acc, g_weights = grads

    d_norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    delta = (t_vals[..., 1:] - t_vals[..., :-1]) * d_norm

    dl_dc = g_rgb[..., None, :] * weights[..., None]  # [R, S, 3]

    dl_dw = jnp.einsum("...c,...sc->...s", g_rgb, rgb)
    if white_bkgd:
        dl_dw = dl_dw - jnp.sum(g_rgb, axis=-1, keepdims=True)
    dl_dw = dl_dw + g_acc[..., None] + g_weights

    # suffix_i = sum_{j>i} dL/dw_j * w_j (exclusive reversed cumsum).
    wdw = dl_dw * weights
    suffix = jnp.cumsum(wdw[..., ::-1], axis=-1)[..., ::-1] - wdw
    one_minus_alpha = jnp.maximum(1.0 - alpha, 1e-10)
    dl_dalpha = dl_dw * trans - suffix / one_minus_alpha
    dl_dsigma = dl_dalpha * (1.0 - alpha) * delta

    # t_vals and dirs are treated as non-differentiable inputs (the reference
    # never backprops into sampling; StopLevelGrad covers the level carry).
    return (dl_dc, dl_dsigma, jnp.zeros_like(t_vals), jnp.zeros_like(dirs))


composite.defvjp(_composite_fwd, _composite_bwd)
