"""True multi-process "multi-host" test: 2 processes x 4 virtual CPU devices.

Exercises the real multi-host code paths — ``jax.distributed.initialize``,
per-process data striping, ``make_array_from_process_local_data`` batch
assembly, cross-process gradient psum — that the in-process 8-device tests
cannot reach (SURVEY.md §4 "fake multi-host via multiprocess on localhost").
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import jax.numpy as jnp
import numpy as np
from nerf_or_nothing_tpu.config import tiny_config
from nerf_or_nothing_tpu.parallel import mesh as mesh_lib
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import init_train_state

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

cfg = tiny_config(batch_size=32, num_samples=8, net_depth=2, net_width=16,
                  net_width_condition=8, max_deg_point=4, randomized=False,
                  donate_params=False)
mesh = mesh_lib.create_mesh()
state = mesh_lib.replicate_state(mesh, init_train_state(cfg))

# each process contributes its local half of the global batch
pid = jax.process_index()
rng = np.random.default_rng(100 + pid)
R_local = cfg.batch_size // 2
d = rng.normal(size=(R_local, 3)).astype(np.float32)
ones = np.ones((R_local, 1), np.float32)
rays = Rays(np.zeros((R_local, 3), np.float32), d,
            d / np.linalg.norm(d, axis=-1, keepdims=True),
            ones * 0.005, ones * 2.0, ones * 6.0, ones)
pixels = rng.uniform(size=(R_local, 3)).astype(np.float32)
sh_rays, sh_pixels = mesh_lib.shard_batch(mesh, rays, pixels)

step = mesh_lib.make_sharded_train_step(cfg, mesh)
for _ in range(2):
    state, stats = step(state, sh_rays, sh_pixels)
loss = float(stats.loss)
w0 = np.asarray(state.params[0][0].addressable_shards[0].data)
print(f"RESULT {jax.process_index()} {loss:.8f} {float(np.sum(w0)):.8f}",
      flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_agrees():
    port = _free_port()
    env_base = dict(os.environ)
    env_base["COORD"] = f"127.0.0.1:{port}"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env_base.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in (0, 1):
        env = dict(env_base, PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=150)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, wsum = line.split()
                results[int(pid)] = (float(loss), float(wsum))
    assert set(results) == {0, 1}, results
    # both processes observe the same pmean'd loss and identical params
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)


RECOVERY_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import jax.numpy as jnp
import numpy as np
from nerf_or_nothing_tpu import checkpoint as ckpt_lib
from nerf_or_nothing_tpu.config import tiny_config
from nerf_or_nothing_tpu.parallel import mesh as mesh_lib
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import init_train_state

cfg = tiny_config(batch_size=32, num_samples=8, net_depth=2, net_width=16,
                  net_width_condition=8, max_deg_point=4, randomized=False,
                  donate_params=False)
mesh = mesh_lib.create_mesh()
state = init_train_state(cfg)
ckpt_dir = os.environ["CKPT_DIR"]
if os.environ.get("RESUME") == "1":
    state = ckpt_lib.maybe_restore(ckpt_dir, state)
state = mesh_lib.replicate_state(mesh, state)

pid = jax.process_index()
rng = np.random.default_rng(100 + pid)
R_local = cfg.batch_size // 2
d = rng.normal(size=(R_local, 3)).astype(np.float32)
ones = np.ones((R_local, 1), np.float32)
rays = Rays(np.zeros((R_local, 3), np.float32), d,
            d / np.linalg.norm(d, axis=-1, keepdims=True),
            ones * 0.005, ones * 2.0, ones * 6.0, ones)
pixels = rng.uniform(size=(R_local, 3)).astype(np.float32)
sh_rays, sh_pixels = mesh_lib.shard_batch(mesh, rays, pixels)
step = mesh_lib.make_sharded_train_step(cfg, mesh)
for _ in range(int(os.environ["STEPS"])):
    state, stats = step(state, sh_rays, sh_pixels)
if os.environ.get("SAVE") == "1":
    # gather to host then save from process 0 only (params are replicated)
    host_state = jax.tree.map(lambda x: np.asarray(x), state)
    ckpt_lib.save_checkpoint(ckpt_dir, host_state)
w0 = np.asarray(state.params[0][0].addressable_shards[0].data)
print(f"RESULT {jax.process_index()} {int(state.step)} {float(np.sum(w0)):.8f}",
      flush=True)
"""


def _run_pair(env_extra, repo, port):
    env_base = dict(os.environ)
    env_base["COORD"] = f"127.0.0.1:{port}"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update(env_extra)
    procs = []
    for pid in (0, 1):
        env = dict(env_base, PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", RECOVERY_WORKER], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=150)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, step_n, wsum = line.split()
                results[int(pid)] = (int(step_n), float(wsum))
    return results


def test_cli_two_process_training(tmp_path):
    """A pod-slice user must be able to start a multi-host run from the CLI
    (VERDICT r2 item 3): launch ``python -m nerf_or_nothing_tpu.run train``
    as 2 processes with --coordinator/--num-processes/--process-id and
    verify both train, process 0 checkpoints, and the loss is finite."""
    from test_datasets import write_blender_scene

    data_dir = str(tmp_path / "scene")
    ckpt_dir = str(tmp_path / "ckpt")
    write_blender_scene(data_dir, n_frames=2, size=16)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env_base = dict(os.environ)
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env_base.pop("JAX_PLATFORMS", None)
    args = [
        sys.executable, "-m", "nerf_or_nothing_tpu.run", "train",
        "--platform=cpu",
        f"--coordinator=127.0.0.1:{port}", "--num-processes=2",
        f"--data-dir={data_dir}", f"--checkpoint-dir={ckpt_dir}",
        "--dataset-loader=blender", "--batch-size=32", "--num-samples=8",
        "--num-levels=1", "--net-depth=2", "--net-width=16",
        "--net-width-condition=8", "--max-deg-point=4", "--use-pallas=0",
        "--max-steps=4", "--save-every=4", "--print-every=2",
        "--test-render-interval=0", "--donate-params=0",
    ]
    procs = [
        subprocess.Popen(
            args + [f"--process-id={pid}"], env=env_base, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"CLI worker failed:\n{out}\n{err}"
        outs.append(out)
    # process 0 wrote a checkpoint; process 1 did not duplicate it
    ckpts = [f for f in os.listdir(ckpt_dir) if f.startswith("checkpoint_")]
    assert ckpts, os.listdir(ckpt_dir)
    # process 0 logged finite losses
    assert any("loss" in line for line in outs[0].splitlines()), outs[0]


def test_checkpoint_restart_recovery(tmp_path):
    """Fail-stop recovery (SURVEY.md §5.3): a 2-process job that dies after
    3 steps and restarts from its checkpoint must reproduce the
    uninterrupted 6-step run exactly."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_a = str(tmp_path / "a")
    ckpt_b = str(tmp_path / "b")

    # uninterrupted 6-step run
    r_full = _run_pair(
        {"CKPT_DIR": ckpt_a, "STEPS": "6", "SAVE": "0"}, repo, _free_port()
    )
    # 3 steps -> "crash" (clean exit after checkpoint) -> restart -> 3 more
    _run_pair({"CKPT_DIR": ckpt_b, "STEPS": "3", "SAVE": "1"},
              repo, _free_port())
    r_resumed = _run_pair(
        {"CKPT_DIR": ckpt_b, "STEPS": "3", "SAVE": "0", "RESUME": "1"},
        repo, _free_port(),
    )
    assert r_full[0][0] == 6 and r_resumed[0][0] == 6
    assert r_full[0][1] == pytest.approx(r_resumed[0][1], rel=1e-6)
    assert r_resumed[0][1] == pytest.approx(r_resumed[1][1], rel=1e-6)


KILL_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import numpy as np
from nerf_or_nothing_tpu import checkpoint as ckpt_lib
from nerf_or_nothing_tpu.config import tiny_config
from nerf_or_nothing_tpu.parallel import mesh as mesh_lib
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import init_train_state

cfg = tiny_config(batch_size=32, num_samples=8, net_depth=2, net_width=16,
                  net_width_condition=8, max_deg_point=4, randomized=False,
                  donate_params=False)
mesh = mesh_lib.create_mesh()
state = init_train_state(cfg)
ckpt_dir = os.environ["CKPT_DIR"]
state = ckpt_lib.maybe_restore(ckpt_dir, state)
state = mesh_lib.replicate_state(mesh, state)

pid = jax.process_index()
rng = np.random.default_rng(100 + pid)
R_local = cfg.batch_size // 2
d = rng.normal(size=(R_local, 3)).astype(np.float32)
ones = np.ones((R_local, 1), np.float32)
rays = Rays(np.zeros((R_local, 3), np.float32), d,
            d / np.linalg.norm(d, axis=-1, keepdims=True),
            ones * 0.005, ones * 2.0, ones * 6.0, ones)
pixels = rng.uniform(size=(R_local, 3)).astype(np.float32)
sh_rays, sh_pixels = mesh_lib.shard_batch(mesh, rays, pixels)
step = mesh_lib.make_sharded_train_step(cfg, mesh)

total = int(os.environ["TOTAL_STEPS"])
progress = os.environ["PROGRESS_FILE"]
# The same batch every step: the end state depends only on the step count,
# so a restart from ANY completed checkpoint converges to the same params.
while int(state.step) < total:
    state, stats = step(state, sh_rays, sh_pixels)
    host_state = jax.tree.map(lambda x: np.asarray(x), state)
    ckpt_lib.save_checkpoint(ckpt_dir, host_state)  # process 0 only
    with open(progress, "w") as f:
        f.write(str(int(state.step)))
w0 = np.asarray(state.params[0][0].addressable_shards[0].data)
print(f"RESULT {jax.process_index()} {int(state.step)} {float(np.sum(w0)):.8f}",
      flush=True)
"""


def test_kill9_mid_training_recovery(tmp_path):
    """REAL fault injection (SURVEY.md §5.3, VERDICT r3 #4): SIGKILL one of
    two processes MID-training (no clean exit, no final checkpoint), tear
    down the survivor, restart both from the last complete atomic
    checkpoint, and require the exact end state of an uninterrupted run."""
    import signal
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_ref = str(tmp_path / "ref")
    ckpt_fault = str(tmp_path / "fault")
    TOTAL = 6

    def launch(ckpt_dir, port):
        env_base = dict(os.environ)
        env_base["COORD"] = f"127.0.0.1:{port}"
        env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env_base.pop("JAX_PLATFORMS", None)
        env_base["CKPT_DIR"] = ckpt_dir
        env_base["TOTAL_STEPS"] = str(TOTAL)
        procs, progress = [], []
        for pid in (0, 1):
            pf = str(tmp_path / f"progress_{port}_{pid}")
            env = dict(env_base, PROC_ID=str(pid), PROGRESS_FILE=pf)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", KILL_WORKER], env=env, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
            progress.append(pf)
        return procs, progress

    def collect(procs):
        results = {}
        for p in procs:
            out, err = p.communicate(timeout=150)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            for line in out.splitlines():
                if line.startswith("RESULT"):
                    _, pid, step_n, wsum = line.split()
                    results[int(pid)] = (int(step_n), float(wsum))
        return results

    # 1) uninterrupted run
    r_ref = collect(launch(ckpt_ref, _free_port())[0])
    assert r_ref[0][0] == TOTAL

    # 2) faulted run: SIGKILL process 1 once it passes step 2
    procs, progress = launch(ckpt_fault, _free_port())
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            if int(open(progress[1]).read() or 0) >= 2:
                break
        except FileNotFoundError:
            pass
        if procs[1].poll() is not None:  # finished before we could kill it
            break
        time.sleep(0.05)
    assert procs[1].poll() is None, "worker 1 exited before the kill"
    procs[1].kill()  # SIGKILL, mid-training, no cleanup
    procs[1].wait(timeout=30)
    assert procs[1].returncode == -signal.SIGKILL
    # the survivor is now blocked in a collective against a dead peer;
    # tear it down too (the realistic whole-job failure)
    time.sleep(1.0)
    procs[0].kill()
    procs[0].wait(timeout=30)

    # a complete checkpoint must exist (atomic writes: never a partial one)
    ckpts = [f for f in os.listdir(ckpt_fault) if f.startswith("checkpoint_")]
    assert ckpts, "no checkpoint survived the crash"
    for f in ckpts:  # every surviving file is loadable
        np.load(os.path.join(ckpt_fault, f)).close()

    # 3) restart both processes; they resume and reproduce the reference run
    r_rec = collect(launch(ckpt_fault, _free_port())[0])
    assert r_rec[0][0] == TOTAL and r_rec[1][0] == TOTAL
    assert r_rec[0][1] == pytest.approx(r_ref[0][1], rel=1e-6)
    assert r_rec[1][1] == pytest.approx(r_rec[0][1], rel=1e-6)
