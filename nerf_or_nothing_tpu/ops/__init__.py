"""Pure-JAX oracle ops (the semantic reference for the Pallas kernels)."""

from nerf_or_nothing_tpu.ops.ipe import (
    cast_rays,
    conical_frustum_to_gaussian,
    cylinder_to_gaussian,
    expected_sin,
    integrated_pos_enc,
    lift_gaussian,
    pos_enc,
)
from nerf_or_nothing_tpu.ops.render import (
    RenderResult,
    composite,
    volumetric_rendering,
)
from nerf_or_nothing_tpu.ops.sampling import (
    resample_along_rays,
    sample_along_rays,
    sorted_piecewise_constant_pdf,
)
