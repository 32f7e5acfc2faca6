"""Self-contained perceptual image distance (the LPIPS input slot).

The reference's ``ComputeAvgError`` (MipHelpers.cs:677-684) takes an LPIPS
value as its third input, but ships no LPIPS network — the limb is dead in
the reference. Rather than replicate a dead limb or pull a torch VGG
checkpoint (no network egress, and a 500 MB dependency for one scalar),
this module implements a SMALL, fully deterministic perceptual distance
with the LPIPS *architecture* but fixed random filters:

  multi-scale conv features -> channel-unit-normalize -> squared feature
  difference -> spatial + channel mean -> sum over scales.

Random-filter perceptual metrics are a published, well-replicated result:
untrained (randomly initialized) VGG features correlate with human
perceptual judgments nearly as well as trained ones (Amir & Weiss,
"Understanding and Simplifying Perceptual Distances", CVPR 2021; also the
"randomly initialized networks are good perceptual priors" line of work).
The filters here are drawn once from a FIXED PRNG key, so the metric is a
pure deterministic function of the two images — reproducible across
machines with no weights file.

This is NOT the LPIPS trained metric — values are not comparable to
published LPIPS numbers, and we report it as ``lpips_proxy``. It fills the
``avg_error`` formula's third slot with a working perceptual term so the
reference's metric surface is fully live (docs/PARITY.md "avg_error").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Fixed architecture: 3 scales, 3x3 filters, modest widths — enough for
# structure/texture sensitivity while staying trivially cheap on TPU.
_WIDTHS = (16, 32, 32)
_SEED = 1905  # fixed forever; changing it changes the metric


@functools.lru_cache(maxsize=1)
def _filters():
    """He-scaled Gaussian conv stacks, drawn once from the fixed seed.

    Built with numpy (concrete host arrays, never traced values): this
    function is first reached INSIDE the jit trace of
    ``perceptual_distance``, and caching jax values created there would
    leak tracers into later calls."""
    import numpy as np

    rng = np.random.default_rng(_SEED)
    banks = []
    c_in = 3
    for w in _WIDTHS:
        fan_in = 3 * 3 * c_in
        f = rng.standard_normal((3, 3, c_in, w)) * np.sqrt(2.0 / fan_in)
        banks.append(f.astype(np.float32))
        c_in = w
    return tuple(banks)


def _normalize_channels(feat, eps=1e-10):
    """Unit-normalize along the channel axis (LPIPS's 'unit ball')."""
    norm = jnp.sqrt(jnp.sum(feat * feat, axis=-1, keepdims=True))
    return feat / jnp.maximum(norm, eps)


def _conv(x, f):
    return jax.lax.conv_general_dilated(
        x, f, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


@jax.jit
def perceptual_distance(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Deterministic random-feature perceptual distance of two [H, W, 3]
    images in [0, 1]. Returns a non-negative scalar; 0 iff features match
    (identical images give exactly 0)."""
    x0 = img0[None].astype(jnp.float32) * 2.0 - 1.0
    x1 = img1[None].astype(jnp.float32) * 2.0 - 1.0
    total = 0.0
    for f in _filters():
        x0 = jax.nn.relu(_conv(x0, f))
        x1 = jax.nn.relu(_conv(x1, f))
        d = _normalize_channels(x0) - _normalize_channels(x1)
        total = total + jnp.mean(jnp.sum(d * d, axis=-1))
        x0 = _avg_pool2(x0)
        x1 = _avg_pool2(x1)
    return total
