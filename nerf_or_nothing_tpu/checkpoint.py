"""Checkpoint / resume.

The reference declares ``Config.SaveEvery`` but ships zero serialization code
(``TrainState.cs:61``, SURVEY.md §5.4) — parameters live only in device
memory. This implements the capability properly: atomic ``.npz`` snapshots of
{params, adam mu/nu, step, PRNG key}, latest-k retention, and resume that
restores the LR-schedule position (the step lives in the state). The flat
reference layout (all weights then all biases, MLP.cs:28-46) is available via
``models.mlp.export_flat`` for cross-checking; the checkpoint itself stores
structured arrays.

Orbax is avoided deliberately: the whole state is ~6 MB (3 x ~494k f32), a
single host-side npz is simpler, dependency-free, and fast. Multi-host: only
process 0 writes (params are replicated under pure DP).
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Optional

import jax
import numpy as np

from nerf_or_nothing_tpu.train import TrainState

_CKPT_RE = re.compile(r"^checkpoint_(\d+)\.npz$")


def _flatten_state(state: TrainState) -> dict:
    out = {
        "step": np.asarray(state.step),
        "key": np.asarray(state.key),
    }
    for name, tree in (("params", state.params), ("mu", state.mu),
                       ("nu", state.nu)):
        for i, (w, b) in enumerate(tree):
            out[f"{name}/w{i}"] = np.asarray(w)
            out[f"{name}/b{i}"] = np.asarray(b)
    return out


def save_checkpoint(ckpt_dir: str, state: TrainState, keep: int = 3) -> str:
    """Atomic write of the full train state; prunes to the latest ``keep``."""
    if jax.process_index() != 0:
        return ""
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step)
    path = os.path.join(ckpt_dir, f"checkpoint_{step:09d}.npz")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **_flatten_state(state))
    os.replace(tmp, path)

    ckpts = sorted(
        f for f in os.listdir(ckpt_dir) if _CKPT_RE.match(f)
    )
    for old in ckpts[:-keep]:
        os.remove(os.path.join(ckpt_dir, old))
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(f for f in os.listdir(ckpt_dir) if _CKPT_RE.match(f))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Load a checkpoint into the structure of ``template`` (shape-checked)."""
    with np.load(path) as data:
        def tree(name):
            out = []
            i = 0
            while f"{name}/w{i}" in data:
                out.append((data[f"{name}/w{i}"], data[f"{name}/b{i}"]))
                i += 1
            return out

        params, mu, nu = tree("params"), tree("mu"), tree("nu")
        for (w, b), (tw, tb) in zip(params, template.params):
            if w.shape != tw.shape or b.shape != tb.shape:
                raise ValueError(
                    f"checkpoint shape mismatch: {w.shape} vs {tw.shape}"
                )
        import jax.numpy as jnp

        to_dev = lambda t: [(jnp.asarray(w), jnp.asarray(b)) for w, b in t]
        return TrainState(
            step=jnp.asarray(data["step"]),
            params=to_dev(params),
            mu=to_dev(mu),
            nu=to_dev(nu),
            key=jnp.asarray(data["key"]),
        )


def maybe_restore(ckpt_dir: str, template: TrainState) -> TrainState:
    """Resume from the newest checkpoint if one exists, else the template."""
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return template
    return restore_checkpoint(path, template)
