"""nerf_or_nothing_tpu — a TPU-native MipNeRF training/rendering framework.

Brand-new JAX/XLA/Pallas implementation of everything the reference
(SimonMacLean/NeRF-or-nothing, "ScratchNerf") does — integrated positional
encoding over conical frustums, hierarchical coarse/fine sampling, the
8x256 skip MLP with view-conditioned color branch, volume rendering with a
hand-derived backward, and a fused Adam step — re-designed for TPU: batched
MXU matmuls, fused Pallas kernels on the hot path, and data-parallel scaling
over a `jax.sharding.Mesh` with gradient all-reduce on ICI.

See SURVEY.md at the repo root for the reference structural analysis.
"""

__version__ = "0.1.0"

from nerf_or_nothing_tpu.config import Config, DatasetType, RayShape
from nerf_or_nothing_tpu.rays import Rays

__all__ = ["Config", "DatasetType", "RayShape", "Rays", "__version__"]
