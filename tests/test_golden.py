"""Golden-step regression tests (SURVEY.md §4 "Golden").

Fixed-seed tiny end-to-end training steps with stored golden losses. The
goldens pin the *semantics* — any change to sampling, encoding, the MLP, the
loss, or Adam that alters the math shows up as a golden mismatch here before
it shows up as a silent quality regression in long training runs.

Goldens were produced by this implementation on the CPU backend (f32,
randomized=False) and are platform-stable to ~1e-5.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_or_nothing_tpu.config import tiny_config
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import init_train_state, make_jitted_train_step

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "train_losses.json")


def golden_setup():
    cfg = tiny_config(
        batch_size=32, num_samples=16, net_depth=3, net_width=32,
        net_width_condition=16, max_deg_point=6, num_levels=2,
        randomized=False, lr_delay_steps=0, seed=42,
        donate_params=False, use_pallas=False,
    )
    rng = np.random.default_rng(1234)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    ones = np.ones((32, 1), np.float32)
    rays = Rays(
        jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32) * 0.1),
        jnp.asarray(d),
        jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
        jnp.asarray(ones * 0.005), jnp.asarray(ones * 2.0),
        jnp.asarray(ones * 6.0), jnp.asarray(ones),
    )
    pixels = jnp.asarray(rng.uniform(size=(32, 3)).astype(np.float32))
    return cfg, rays, pixels


def run_steps(n=5):
    cfg, rays, pixels = golden_setup()
    state = init_train_state(cfg)
    step = make_jitted_train_step(cfg)
    losses = []
    for _ in range(n):
        state, stats = step(state, rays, pixels)
        losses.append(float(stats.loss))
    return losses


def test_golden_losses():
    losses = run_steps()
    if not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump({"losses": losses}, f, indent=2)
        raise AssertionError(
            f"golden file created at {GOLDEN_PATH}; rerun to validate"
        )
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)["losses"]
    np.testing.assert_allclose(losses, golden, rtol=2e-4, atol=2e-5)


if __name__ == "__main__":
    print(run_steps())
