"""Analytic synthetic scene generator (Blender-format output).

The BASELINE configs target Blender scenes (lego etc.) which cannot be
downloaded in an offline environment, so this module renders a simple
analytic scene — Lambertian spheres on a white background, ray-traced
exactly — and writes it in the standard Blender-NeRF layout
(``transforms_{split}.json`` + RGBA PNGs). It gives the integration tests a
*consistent multi-view* dataset: a NeRF that works must drive PSNR well
above the ~11 dB floor that random-noise fixtures allow.

Also exposes ``render_rays_analytic`` so tests can compare a trained model
against ground truth along arbitrary rays.
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence, Tuple

import numpy as np

# Scene: unit-ish spheres inside the [near=2, far=6] shell around origin.
SPHERES = [
    # (center, radius, albedo rgb)
    (np.array([0.0, 0.0, 0.0]), 0.9, np.array([0.85, 0.15, 0.15])),
    (np.array([1.1, 0.8, -0.3]), 0.45, np.array([0.15, 0.65, 0.2])),
    (np.array([-1.0, 0.6, 0.4]), 0.5, np.array([0.2, 0.3, 0.85])),
    (np.array([0.2, -1.1, 0.5]), 0.4, np.array([0.9, 0.8, 0.2])),
]
LIGHT_DIR = np.array([0.5, 0.6, 0.62])
AMBIENT = 0.35


def render_rays_analytic(
    origins: np.ndarray, directions: np.ndarray
) -> np.ndarray:
    """Exact ray-traced RGB for rays (white background, Lambertian).

    Args:
      origins/directions: [N, 3] (directions need not be normalized).
    Returns:
      [N, 3] float32 in [0, 1].
    """
    o = np.asarray(origins, np.float64)
    d = np.asarray(directions, np.float64)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    rgb = np.ones((n, 3))
    light = LIGHT_DIR / np.linalg.norm(LIGHT_DIR)

    for center, radius, albedo in SPHERES:
        oc = o - center
        b = np.sum(oc * d, -1)
        c = np.sum(oc * oc, -1) - radius**2
        disc = b * b - c
        hit = disc > 0
        sq = np.sqrt(np.maximum(disc, 0.0))
        t = -b - sq
        hit &= (t > 1e-6) & (t < best_t)
        if not hit.any():
            continue
        p = o[hit] + t[hit, None] * d[hit]
        normal = (p - center) / radius
        lam = np.maximum(normal @ light, 0.0)
        shade = AMBIENT + (1.0 - AMBIENT) * lam
        rgb[hit] = albedo[None, :] * shade[:, None]
        best_t[hit] = t[hit]
    return rgb.astype(np.float32)


def _look_at(eye: np.ndarray) -> np.ndarray:
    """Camera-to-world looking from ``eye`` at the origin, -z forward
    (OpenGL/Blender convention)."""
    forward = eye / np.linalg.norm(eye)        # camera -z points at origin
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, forward)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    true_up = np.cross(forward, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = forward
    c2w[:3, 3] = eye
    return c2w


def camera_poses(n_views: int, distance: float = 4.0,
                 elevation: float = 0.45) -> List[np.ndarray]:
    poses = []
    for i in range(n_views):
        theta = 2.0 * np.pi * i / n_views
        eye = distance * np.array([
            np.cos(theta) * np.cos(elevation),
            np.sin(theta) * np.cos(elevation),
            np.sin(elevation),
        ])
        poses.append(_look_at(eye))
    return poses


def write_scene(
    root: str,
    n_train: int = 12,
    n_test: int = 3,
    size: int = 64,
    camera_angle_x: float = 0.8,
) -> str:
    """Write a Blender-format scene directory; returns ``root``."""
    from PIL import Image

    from nerf_or_nothing_tpu.rays import generate_rays, pinhole_pix_to_cam

    focal = 0.5 * size / np.tan(0.5 * camera_angle_x)
    pix_to_cam = pinhole_pix_to_cam(focal, size, size)

    def render_pose(c2w) -> np.ndarray:
        rays = generate_rays(pix_to_cam, c2w[:3], size, size, 2.0, 6.0)
        rgb = render_rays_analytic(
            np.asarray(rays.origins).reshape(-1, 3),
            np.asarray(rays.directions).reshape(-1, 3),
        )
        return rgb.reshape(size, size, 3)

    for split, n, offset in (("train", n_train, 0.0),
                             ("test", n_test, 0.33)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        poses = camera_poses(n)
        for i, c2w in enumerate(poses):
            # offset test azimuths so views differ from train
            if offset:
                theta = 2.0 * np.pi * (i + offset) / n
                eye = 4.0 * np.array([
                    np.cos(theta) * np.cos(0.45),
                    np.sin(theta) * np.cos(0.45),
                    np.sin(0.45),
                ])
                c2w = _look_at(eye)
            img = render_pose(c2w)
            rgba = np.concatenate(
                [img, np.ones_like(img[..., :1])], axis=-1
            )
            Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                os.path.join(root, split, f"r_{i}.png")
            )
            frames.append({
                "file_path": f"{split}/r_{i}",
                "transform_matrix": c2w.tolist(),
            })
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(
                {"camera_angle_x": camera_angle_x, "frames": frames}, f
            )
    return root
