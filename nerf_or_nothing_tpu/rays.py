"""Ray batch pytree and camera -> ray generation.

TPU-native equivalent of the reference's SoA ``Rays`` struct
(``ScratchNerf/MipNerfModel.cs:221-230``) and the pinhole ray generator
(``ScratchNerf/Dataset.cs:111-176``) including the mip radius (2/sqrt(12) x
adjacent-pixel-direction spacing, ``Dataset.cs:144-153``) and the LLFF NDC
conversion (``Dataset.cs:268-308``).

Everything is a flat struct-of-arrays pytree so it shards cleanly over a
``Mesh`` 'batch' axis and feeds jit'd code with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Rays(NamedTuple):
    """A batch of rays; every leaf has leading shape [..., num_rays].

    Field-for-field the reference SoA form (``MipNerfModel.cs:221-230``):
    origins/directions/viewdirs [N,3], radii/near/far/loss_mult [N,1].
    """

    origins: jnp.ndarray
    directions: jnp.ndarray
    viewdirs: jnp.ndarray
    radii: jnp.ndarray
    near: jnp.ndarray
    far: jnp.ndarray
    loss_mult: jnp.ndarray

    @property
    def num_rays(self) -> int:
        return self.origins.shape[-2]


def flatten_rays(r: "Rays") -> "Rays":
    """Collapse grid leaves [..., C] to a flat ray list [N, C] (numpy)."""
    import numpy as np

    return Rays(*[
        np.asarray(x).reshape(-1, np.asarray(x).shape[-1]) for x in r
    ])


def generate_rays(
    pix_to_cam: np.ndarray,
    cam_to_world: np.ndarray,
    width: int,
    height: int,
    near: float,
    far: float,
) -> Rays:
    """Pinhole camera rays for one pose, reference semantics.

    Per-pixel camera-space direction ``((x - w/2 + 0.5)/f, -(y - h/2 + 0.5)/f,
    -1)`` rotated into world space (``Dataset.cs:119-143``); mip radius is
    ``2/sqrt(12)`` times the x-spacing between adjacent pixel directions
    (``Dataset.cs:144-153``).

    Args:
      pix_to_cam: [3,3] inverse intrinsics (maps (x+0.5, y+0.5, 1) pixel
        coords to camera dirs).
      cam_to_world: [3,4] or [4,4] camera-to-world pose.
    Returns:
      Rays with leaves shaped [height, width, C].
    """
    x, y = np.meshgrid(
        np.arange(width, dtype=np.float32),
        np.arange(height, dtype=np.float32),
        indexing="xy",
    )
    pix = np.stack([x + 0.5, y + 0.5, np.ones_like(x)], axis=-1)  # [H,W,3]
    cam_dirs = pix @ pix_to_cam.T  # [H,W,3]
    rot = cam_to_world[:3, :3]
    directions = cam_dirs @ rot.T
    origins = np.broadcast_to(cam_to_world[:3, -1], directions.shape)
    viewdirs = directions / np.linalg.norm(directions, axis=-1, keepdims=True)

    # Distance between this pixel's direction and its x-neighbor's; the last
    # column reuses its left neighbor (Dataset.cs:149-151). NB: dx has W-1
    # columns, so the left neighbor of the appended column is dx[:, -1:]
    # (a -2:-1 slice would be empty at W=2 and yield a ragged ray grid).
    dx = np.sqrt(np.sum((directions[:, :-1, :] - directions[:, 1:, :]) ** 2, -1))
    dx = np.concatenate([dx, dx[:, -1:]], axis=1)
    radii = (dx * 2.0 / np.sqrt(12.0))[..., None]

    ones = np.ones_like(radii)
    return Rays(
        origins=jnp.asarray(origins, jnp.float32),
        directions=jnp.asarray(directions, jnp.float32),
        viewdirs=jnp.asarray(viewdirs, jnp.float32),
        radii=jnp.asarray(radii, jnp.float32),
        near=jnp.asarray(ones * near, jnp.float32),
        far=jnp.asarray(ones * far, jnp.float32),
        loss_mult=jnp.asarray(ones, jnp.float32),
    )


def pinhole_pix_to_cam(focal: float, width: int, height: int) -> np.ndarray:
    """Inverse intrinsics for a centered pinhole camera (Dataset.cs:121-128).

    Maps (x+0.5, y+0.5, 1) to ((x - w/2 + 0.5)/f, -(y - h/2 + 0.5)/f, -1).
    """
    return np.array(
        [
            [1.0 / focal, 0, -0.5 * width / focal],
            [0, -1.0 / focal, 0.5 * height / focal],
            [0, 0, -1.0],
        ],
        dtype=np.float32,
    )


def convert_to_ndc(
    origins: np.ndarray,
    directions: np.ndarray,
    focal: float,
    width: int,
    height: int,
    near: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Shift rays to the z=-near plane and map to NDC (Dataset.cs:295-308).

    Standard NeRF NDC warp for forward-facing (LLFF) scenes.
    """
    t = -(near + origins[..., 2]) / directions[..., 2]
    origins = origins + t[..., None] * directions

    dx, dy, dz = np.moveaxis(directions, -1, 0)
    ox, oy, oz = np.moveaxis(origins, -1, 0)

    o0 = -((2 * focal) / width) * (ox / oz)
    o1 = -((2 * focal) / height) * (oy / oz)
    o2 = 1 + 2 * near / oz
    d0 = -((2 * focal) / width) * (dx / dz - ox / oz)
    d1 = -((2 * focal) / height) * (dy / dz - oy / oz)
    d2 = -2 * near / oz

    origins = np.stack([o0, o1, o2], -1)
    directions = np.stack([d0, d1, d2], -1)
    return origins, directions


def ndc_radii(origins: np.ndarray) -> np.ndarray:
    """Radii from origin-plane spacing in NDC (Dataset.cs:277-292).

    After the NDC warp, ray origins (not directions) carry the pixel-grid
    spacing, so the cone radius derives from adjacent-origin distances:
    radius = sqrt(dx^2 + dy^2) / sqrt(12) with the last row/column reusing
    its neighbor's spacing.

    Args:
      origins: [H, W, 3] NDC-space origins for one image.
    """
    dx = np.sqrt(np.sum((origins[:, :-1, :] - origins[:, 1:, :]) ** 2, -1))
    dx = np.concatenate([dx, dx[:, -1:]], axis=1)
    dy = np.sqrt(np.sum((origins[:-1, :, :] - origins[1:, :, :]) ** 2, -1))
    dy = np.concatenate([dy, dy[-1:, :]], axis=0)
    return (np.sqrt(dx**2 + dy**2) / np.sqrt(12.0))[..., None]
