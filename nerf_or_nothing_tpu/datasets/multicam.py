"""Multiscale Blender ("multicam") dataset — area-weighted multiscale loss.

The reference stubs this (``Multicam.LoadRenderings`` throws,
``ScratchNerf/Dataset.cs:209-212``); implemented here per the canonical
mip-NeRF multiscale convention (BASELINE config 4):

- ``metadata.json`` with per-split dicts: ``file_path``, ``cam2world``,
  ``width``, ``height``, ``focal``, ``pix2cam``, ``lossmult``, ``near``,
  ``far`` — one entry per (image, scale);
- images at multiple resolutions; rays are generated per image with that
  image's own intrinsics, flattened into one ray pool;
- ``loss_mult`` carries the area weight (4^scale), consumed by the
  multiscale loss (Program.cs:66-89 semantics).

If ``metadata.json`` is absent but ``transforms_{split}.json`` exists, the
4-scale pyramid is synthesized from a standard Blender scene by downsampling
(the canonical ``convert_blender_data`` preprocessing, done on the fly).
"""

from __future__ import annotations

import json
import os

import numpy as np

from nerf_or_nothing_tpu.datasets.base import Dataset
from nerf_or_nothing_tpu.datasets.blender import _load_image
from nerf_or_nothing_tpu.rays import Rays, generate_rays, pinhole_pix_to_cam


class Multicam(Dataset):
    NUM_SCALES = 4

    def _load(self) -> None:
        meta_path = os.path.join(self.data_dir, "metadata.json")
        if os.path.exists(meta_path):
            self._load_metadata(meta_path)
        else:
            self._load_synthesized()

    # -- path A: preprocessed multiscale metadata ---------------------------
    def _load_metadata(self, meta_path: str) -> None:
        split = "train" if self.split == "train" else "test"
        with open(meta_path) as f:
            meta = json.load(f)[split]

        per_image_rays = []
        pixels = []
        loss_mults = []
        for i in range(len(meta["file_path"])):
            img = _load_image(os.path.join(self.data_dir,
                                           meta["file_path"][i]))
            if img.shape[-1] == 4:
                rgb, a = img[..., :3], img[..., 3:]
                img = rgb * a + (1 - a) if self.cfg.white_bkgd else rgb * a
            w, h = int(meta["width"][i]), int(meta["height"][i])
            pix2cam = np.asarray(meta["pix2cam"][i], np.float32)
            c2w = np.asarray(meta["cam2world"][i], np.float32)
            r = generate_rays(
                pix2cam, c2w[:3], w, h,
                float(meta.get("near", [self.cfg.near] * (i + 1))[i]),
                float(meta.get("far", [self.cfg.far] * (i + 1))[i]),
            )
            lm = float(meta["lossmult"][i])
            per_image_rays.append(
                r._replace(loss_mult=np.full_like(np.asarray(r.radii), lm))
            )
            pixels.append(img.reshape(-1, 3))
            loss_mults.append(lm)
        # Render-path intrinsics: the sharpest (largest) camera of the set.
        i0 = int(np.argmax(np.asarray(meta["width"], np.float64)))
        self._path_cam = (
            np.asarray(meta["pix2cam"][i0], np.float32),
            int(meta["height"][i0]), int(meta["width"][i0]),
        )
        self._pose_radius = float(np.mean([
            np.linalg.norm(np.asarray(c, np.float32)[:3, 3])
            for c in meta["cam2world"]
        ]))
        self._set_flat(per_image_rays, pixels)

    # -- path B: synthesize the pyramid from transforms_{split}.json --------
    def _load_synthesized(self) -> None:
        split = "train" if self.split == "train" else "test"
        with open(os.path.join(self.data_dir,
                               f"transforms_{split}.json")) as f:
            meta = json.load(f)
        camera_angle_x = float(meta["camera_angle_x"])

        per_image_rays = []
        pixels = []
        for frame in meta["frames"]:
            fname = os.path.join(self.data_dir, frame["file_path"] + ".png")
            base = _load_image(fname)
            c2w = np.asarray(frame["transform_matrix"], np.float32)
            for scale in range(self.NUM_SCALES):
                factor = 2**scale
                img = base if factor == 1 else _downsample(base, factor)
                if img.shape[-1] == 4:
                    rgb, a = img[..., :3], img[..., 3:]
                    img = (rgb * a + (1 - a)) if self.cfg.white_bkgd else rgb * a
                h, w = img.shape[:2]
                focal = 0.5 * w / np.tan(0.5 * camera_angle_x)
                r = generate_rays(
                    pinhole_pix_to_cam(focal, w, h), c2w[:3], w, h,
                    self.cfg.near, self.cfg.far,
                )
                # Area weight: a pixel at scale s covers 4^s base pixels.
                lm = float(4**scale)
                per_image_rays.append(
                    r._replace(
                        loss_mult=np.full_like(np.asarray(r.radii), lm)
                    )
                )
                pixels.append(img.reshape(-1, 3))
        h0, w0 = per_image_rays[0].radii.shape[:2]
        focal0 = 0.5 * w0 / np.tan(0.5 * camera_angle_x)
        self._path_cam = (pinhole_pix_to_cam(focal0, w0, h0), h0, w0)
        self._pose_radius = float(np.mean([
            np.linalg.norm(
                np.asarray(f["transform_matrix"], np.float32)[:3, 3]
            )
            for f in meta["frames"]
        ]))
        self._set_flat(per_image_rays, pixels)

    def render_path_rays(self, n_frames: int = 40, phi_deg: float = -30.0):
        """Novel-view orbit at the set's sharpest-camera intrinsics
        (Config.RenderPath for the multiscale loader; same sweep as
        ``Blender.render_path_rays``). Returns [(rays [H*W, C], (H, W)),
        ...] — the ``image_rays`` contract."""
        from nerf_or_nothing_tpu.datasets.blender import orbit_pose
        from nerf_or_nothing_tpu.rays import flatten_rays

        pix_to_cam, h, w = self._path_cam
        out = []
        for theta in np.linspace(-180.0, 180.0, n_frames, endpoint=False):
            c2w = orbit_pose(theta, phi_deg, self._pose_radius)
            r = generate_rays(
                pix_to_cam, c2w[:3], w, h, self.cfg.near, self.cfg.far
            )
            out.append((flatten_rays(r), (h, w)))
        return out

    # -- shared -------------------------------------------------------------
    def _linearize(self) -> None:
        super()._linearize()
        from nerf_or_nothing_tpu.ops.math_utils import srgb_to_linear

        self._per_image_pixels = [
            np.asarray(srgb_to_linear(p), np.float32)
            for p in self._per_image_pixels
        ]

    def _set_flat(self, per_image_rays, pixels) -> None:
        # Mixed resolutions -> flatten each image's grid before stacking.
        flat = [
            Rays(*[np.asarray(x).reshape(-1, np.asarray(x).shape[-1])
                   for x in r])
            for r in per_image_rays
        ]
        self.rays = Rays(*[
            np.concatenate([getattr(r, f) for r in flat])[None]
            for f in Rays._fields
        ])
        self.images = np.concatenate(pixels)[None, :, None, :]
        # Keep per-image ray grids for eval.
        self._per_image_rays = per_image_rays
        self._per_image_pixels = pixels

    def _flatten(self) -> None:
        # images is already the flattened pool [1, P, 1, 3]; rays [1, P, C].
        import jax

        self.num_images = len(self._per_image_pixels)
        # Mixed resolutions: height/width are only meaningful per image (see
        # image_dims); expose image 0's dims as the representative default.
        self.height, self.width = self.image_dims(0)
        flat_rays = Rays(*[x[0] for x in self.rays])
        flat_pixels = self.images.reshape(-1, 3)
        p, num_p = jax.process_index(), jax.process_count()
        if num_p > 1:
            flat_rays = Rays(*[x[p::num_p] for x in flat_rays])
            flat_pixels = flat_pixels[p::num_p]
        self._flat_rays = flat_rays
        self._flat_pixels = flat_pixels
        self.pool_size = flat_pixels.shape[0]

    def image_rays(self, index: int):
        r = self._per_image_rays[index]
        flat = Rays(*[np.asarray(x).reshape(-1, np.asarray(x).shape[-1])
                      for x in r])
        return flat, self._per_image_pixels[index]

    def image_dims(self, index: int):
        # Per-image ray grids keep their [H, W, C] shape; read dims off them
        # (each scale of the pyramid has its own resolution).
        h, w = np.asarray(self._per_image_rays[index].radii).shape[:2]
        return h, w


def _downsample(img: np.ndarray, factor: int) -> np.ndarray:
    """Box-filter downsample (canonical multiscale preprocessing)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    img = img[: h2 * factor, : w2 * factor]
    return img.reshape(h2, factor, w2, factor, -1).mean(axis=(1, 3))
