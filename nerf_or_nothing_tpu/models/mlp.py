"""The mip-NeRF MLP: parameter pytree, init, and batched forward.

TPU-native re-design of the reference MLP (``ScratchNerf/MLP.cs``): the
reference evaluates one scalar sample at a time (``MLP.Call``,
``MLP.cs:87-111``) or one CUDA thread per output neuron
(``accelerated_functions.cu:36-90``); here the whole [num_rays*num_samples,
features] batch is a stack of MXU matmuls that XLA fuses, and the Pallas path
(``kernels/fused_mlp.py``) keeps all ~494k params resident in VMEM.

Architecture (MLP.cs:8-20, :66-78):
  trunk: net_depth=8 layers of net_width=256, ReLU, with the encoded position
         re-concatenated at every layer i where i % skip_layer == 0, i > 0;
  density head: 1 linear unit off the trunk (no activation here — the model
         applies softplus(raw + density_bias));
  view branch: concat(trunk_out, encoded_dir) -> net_depth_condition=1 layers
         of net_width_condition=128, ReLU -> 3 linear RGB units.

Parameters are a list of (kernel [in, out], bias [out]) in reference layer
order (trunk 0..D-1, density, view 0..Dc-1, rgb) so flat export for
cross-checking against the reference's ``allParams`` layout
(``MLP.cs:28-46``: all weights then all biases) is a transpose + concat.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.ops.math_utils import glorot_uniform

Params = List[Tuple[jnp.ndarray, jnp.ndarray]]


def layer_dims(cfg: Config) -> List[Tuple[int, int]]:
    """(fan_in, fan_out) per layer in reference order (MLP.cs:72-78)."""
    loc = cfg.location_features
    dims: List[Tuple[int, int]] = [(loc, cfg.net_width)]
    for i in range(1, cfg.net_depth):
        fan_in = (
            cfg.net_width + loc if i % cfg.skip_layer == 0 else cfg.net_width
        )
        dims.append((fan_in, cfg.net_width))
    dims.append((cfg.net_width, cfg.num_density_channels))
    dims.append(
        (cfg.net_width + cfg.direction_features, cfg.net_width_condition)
    )
    for _ in range(1, cfg.net_depth_condition):
        dims.append((cfg.net_width_condition, cfg.net_width_condition))
    dims.append((cfg.net_width_condition, cfg.num_rgb_channels))
    return dims


def init_mlp(key: jax.Array, cfg: Config) -> Params:
    """Glorot-uniform weights, zero biases (MLP.cs:79-85, MipHelpers.cs:675)."""
    dims = layer_dims(cfg)
    keys = jax.random.split(key, len(dims))
    params: Params = []
    for k, (fan_in, fan_out) in zip(keys, dims):
        w = glorot_uniform(k, fan_in, fan_out, (fan_in, fan_out))
        b = jnp.zeros((fan_out,), jnp.float32)
        params.append((w, b))
    return params


def num_params(cfg: Config) -> int:
    return sum(i * o + o for i, o in layer_dims(cfg))


def apply_mlp(
    params: Params,
    cfg: Config,
    x: jnp.ndarray,
    dir_enc: jnp.ndarray,
    compute_dtype: Any = jnp.float32,
):
    """Batched forward (semantics of MLP.Call, MLP.cs:87-111).

    Args:
      params: as from ``init_mlp`` (f32 master copy).
      x: [..., S, location_features] IPE-encoded positions.
      dir_enc: [..., direction_features] PE-encoded direction (per ray,
        broadcast over samples — the reference encodes once per ray,
        MipNerfModel.cs:70).
    Returns:
      raw_rgb [..., S, 3], raw_density [..., S, 1] in f32 (heads accumulate
      and are cast back to f32 regardless of compute dtype).
    """
    dt = compute_dtype

    def dense(i: int, h: jnp.ndarray) -> jnp.ndarray:
        w, b = params[i]
        return (
            jnp.dot(h, w.astype(dt), preferred_element_type=jnp.float32)
            + b
        )

    inputs = x.astype(dt)
    h = inputs
    for i in range(cfg.net_depth):
        if i % cfg.skip_layer == 0 and i > 0:
            h = jnp.concatenate([h, inputs], axis=-1)
        h = jax.nn.relu(dense(i, h)).astype(dt)

    raw_density = dense(cfg.net_depth, h)  # [..., S, 1], f32

    d = jnp.broadcast_to(
        dir_enc[..., None, :].astype(dt), (*h.shape[:-1], dir_enc.shape[-1])
    )
    h = jnp.concatenate([h, d], axis=-1)
    for i in range(cfg.net_depth_condition):
        h = jax.nn.relu(dense(cfg.net_depth + 1 + i, h)).astype(dt)
    raw_rgb = dense(cfg.net_depth + 1 + cfg.net_depth_condition, h)

    return raw_rgb.astype(jnp.float32), raw_density.astype(jnp.float32)


# ----------------------------------------------------------------------------
# Flat import/export in the reference's allParams layout (MLP.cs:28-63):
# all weight matrices (row-major, [out, in]) then all bias vectors.
# ----------------------------------------------------------------------------


def export_flat(params: Params) -> np.ndarray:
    ws = [np.asarray(w).T.reshape(-1) for w, _ in params]
    bs = [np.asarray(b).reshape(-1) for _, b in params]
    return np.concatenate(ws + bs)


def import_flat(flat: np.ndarray, cfg: Config) -> Params:
    dims = layer_dims(cfg)
    params: Params = []
    off = 0
    mats = []
    for fan_in, fan_out in dims:
        n = fan_in * fan_out
        mats.append(
            jnp.asarray(
                flat[off : off + n].reshape(fan_out, fan_in).T, jnp.float32
            )
        )
        off += n
    for (fan_in, fan_out), w in zip(dims, mats):
        b = jnp.asarray(flat[off : off + fan_out], jnp.float32)
        off += fan_out
        params.append((w, b))
    assert off == flat.size, (off, flat.size)
    return params


def layer_sizes(cfg: Config) -> List[int]:
    """Flat per-tensor sizes, weights then biases (AcceleratedMLP.cpp:131-154).

    Exposed for optimizer-state cross-checks against the reference's
    24-tensor scheme.
    """
    dims = layer_dims(cfg)
    return [i * o for i, o in dims] + [o for _, o in dims]
