"""Native C++ ray loader vs the reference 64-byte record format."""

import os

import numpy as np
import pytest

from nerf_or_nothing_tpu.datasets import bin_dump
from nerf_or_nothing_tpu.datasets.native_loader import (
    NativeRayLoader,
    native_available,
)
from nerf_or_nothing_tpu.rays import Rays

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain / native lib"
)


def write_records(path, n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rays = Rays(
        rng.normal(size=(n, 3)).astype(np.float32),
        d,
        (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32),
        rng.uniform(0.001, 0.01, size=(n, 1)).astype(np.float32),
        np.full((n, 1), 2.0, np.float32),
        np.full((n, 1), 6.0, np.float32),
        np.ones((n, 1), np.float32),
        )
    pixels = rng.uniform(size=(n, 3)).astype(np.float32)
    bin_dump.write_bin_dump(path, rays, pixels)
    return rays, pixels


def test_native_loader_batches(tmp_path):
    path = str(tmp_path / "rays.bin")
    rays, pixels = write_records(path, 257)
    loader = NativeRayLoader(path, batch_size=64, seed=1)
    assert loader.num_records == 257
    batch_rays, batch_pixels = next(loader)
    assert batch_pixels.shape == (64, 3)
    # every returned row must be an exact record from the file
    # (match via pixel values, which are unique with high probability)
    for i in range(0, 64, 7):
        dists = np.abs(pixels - batch_pixels[i]).sum(axis=1)
        j = int(np.argmin(dists))
        assert dists[j] == 0.0
        np.testing.assert_array_equal(batch_rays.origins[i], rays.origins[j])
        np.testing.assert_array_equal(batch_rays.radii[i], rays.radii[j])
    loader.close()


def test_native_loader_deterministic_seed(tmp_path):
    path = str(tmp_path / "rays.bin")
    write_records(path, 100)
    a = NativeRayLoader(path, batch_size=32, seed=42, workers=1)
    b = NativeRayLoader(path, batch_size=32, seed=42, workers=1)
    ra, pa = next(a)
    rb, pb = next(b)
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(ra.origins, rb.origins)
    a.close(); b.close()


def test_native_loader_striping(tmp_path):
    """Host stripes must draw from disjoint record sets."""
    path = str(tmp_path / "rays.bin")
    rays, pixels = write_records(path, 64)
    # Mark records by lossmult = record index (post-hoc edit of the file).
    rec = np.fromfile(path, dtype="<f4").reshape(64, 16)
    rec[:, 12] = np.arange(64, dtype=np.float32)
    rec.tofile(path)

    l0 = NativeRayLoader(path, 128, seed=0, stripe_index=0, stripe_count=2)
    l1 = NativeRayLoader(path, 128, seed=0, stripe_index=1, stripe_count=2)
    _, _ = next(l0), next(l1)  # warm
    r0, _ = next(l0)
    r1, _ = next(l1)
    assert (r0.loss_mult.astype(int) % 2 == 0).all()
    assert (r1.loss_mult.astype(int) % 2 == 1).all()
    l0.close(); l1.close()


def test_bin_dataset_uses_native_loader(tmp_path):
    """create_dataset(BIN) serves train batches through the C++ loader and
    the batches drive a real train step (the loader integration the factory
    path was missing)."""
    import jax.numpy as jnp

    from nerf_or_nothing_tpu.config import DatasetType, tiny_config
    from nerf_or_nothing_tpu.datasets.base import create_dataset
    from nerf_or_nothing_tpu.train import (
        init_train_state,
        make_jitted_train_step,
    )

    path = str(tmp_path / "rays.bin")
    write_records(path, 512)
    cfg = tiny_config(
        batch_size=32, num_samples=8, net_depth=2, net_width=16,
        net_width_condition=8, max_deg_point=4,
        dataset_loader=DatasetType.BIN,
    )
    ds = create_dataset("train", path, cfg)
    assert ds._native is not None, "native loader should be active"
    state = init_train_state(cfg)
    step = make_jitted_train_step(cfg)
    for _ in range(2):
        rays, pixels = next(ds)
        assert pixels.shape == (32, 3)
        state, stats = step(
            state, Rays(*[jnp.asarray(x) for x in rays]), jnp.asarray(pixels)
        )
    assert np.isfinite(float(stats.loss))


def test_bin_dataset_numpy_fallback(tmp_path, monkeypatch):
    """With the native loader disabled, the factory path falls back to the
    NumPy gather loader transparently."""
    from nerf_or_nothing_tpu.config import Config, DatasetType
    from nerf_or_nothing_tpu.datasets import bin_dump
    from nerf_or_nothing_tpu.datasets.base import create_dataset

    monkeypatch.setattr(bin_dump, "USE_NATIVE", False)
    path = str(tmp_path / "rays.bin")
    write_records(path, 256)
    cfg = Config(dataset_loader=DatasetType.BIN, batch_size=16)
    ds = create_dataset("train", path, cfg)
    assert ds._native is None
    rays, pixels = next(ds)
    assert pixels.shape == (16, 3)


def test_native_loader_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        NativeRayLoader(str(tmp_path / "nope.bin"), 8)


def test_native_loader_throughput_smoke(tmp_path):
    """Ring prefetch: drawing many batches terminates promptly."""
    path = str(tmp_path / "rays.bin")
    write_records(path, 4096)
    loader = NativeRayLoader(path, batch_size=1024, workers=2)
    for _ in range(50):
        rays, pixels = next(loader)
    assert pixels.shape == (1024, 3)
    loader.close()
