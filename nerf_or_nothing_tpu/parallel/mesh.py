"""Device mesh setup and sharded training step.

Everything here is new TPU-native design — the reference is strictly
single-GPU/single-process (one ``cudaSetDevice(0)``,
``AcceleratedMipNeRF.cpp:10``; no NCCL/MPI anywhere — SURVEY.md §2.11).

Design (SURVEY.md §5.8, BASELINE north star):
- one global ``Mesh`` with a single ``'batch'`` (data) axis over all chips —
  the ~494k-param (2 MB) model makes pure data parallelism optimal; ICI
  within a slice, DCN across slices;
- rays + target pixels sharded ``P('batch')``; params + Adam state
  replicated ``P()``;
- the train step runs under ``shard_map`` so the gradient all-reduce is an
  explicit per-step ``psum`` over ICI, emitted per level; measured schedule
  (benchmarks/analyze_overlap.py): XLA combines them into one ~2.19 MB
  synchronous all-reduce costing ~1% of the step — see docs/PERF.md;
- multi-host: ``jax.distributed.initialize`` + per-host data striping
  (each process feeds its local devices its own ray stripe;
  ``make_array_from_process_local_data`` assembles the global batch).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.rays import Rays
from nerf_or_nothing_tpu.train import TrainState, make_train_step

BATCH_AXIS = "batch"


def create_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over (a prefix of) all global devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` wrapper (no-op in single-process runs)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def shard_batch(mesh: Mesh, rays: Rays, pixels) -> tuple:
    """Place a (host-local) batch onto the mesh, sharded over 'batch'.

    In multi-host runs each process passes its local stripe;
    ``make_array_from_process_local_data`` assembles the global array.
    """
    sharding = NamedSharding(mesh, P(BATCH_AXIS))
    if jax.process_count() > 1:
        put = partial(jax.make_array_from_process_local_data, sharding)
    else:
        put = partial(jax.device_put, device=sharding)
    return Rays(*[put(np.asarray(x)) for x in rays]), put(np.asarray(pixels))


def shard_batch_stack(mesh: Mesh, rays_stack: Rays, pixels_stack) -> tuple:
    """Place a [K, batch, ...] stack of batches onto the mesh, sharded over
    'batch' along axis 1 (the per-step ray axis; K stays whole on every
    chip — it is the scan axis of the multi-step program)."""
    sharding = NamedSharding(mesh, P(None, BATCH_AXIS))
    if jax.process_count() > 1:
        put = partial(jax.make_array_from_process_local_data, sharding)
    else:
        put = partial(jax.device_put, device=sharding)
    return (
        Rays(*[put(np.asarray(x)) for x in rays_stack]),
        put(np.asarray(pixels_stack)),
    )


def replicate_state(mesh: Mesh, state: TrainState) -> TrainState:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


MODEL_AXIS = "model"


def create_mesh_2d(dp: int, mp: int) -> Mesh:
    """2-D ('batch', 'model') mesh: data parallelism x tensor parallelism."""
    devices = np.asarray(jax.devices()[: dp * mp]).reshape(dp, mp)
    return Mesh(devices, (BATCH_AXIS, MODEL_AXIS))


def make_tensor_parallel_train_step(cfg: Config, mesh: Mesh):
    """2-D data x tensor parallel train step via GSPMD sharding annotations.

    Rays/pixels are sharded over 'batch'; every MLP weight matrix is sharded
    over its OUTPUT dimension on 'model' (biases and Adam moments likewise),
    and XLA's SPMD partitioner inserts the collectives (all-gathers on the
    activation path, reduce-scatters on the gradient path).

    This is an OPTION, not the default: at the reference's 494k parameters
    (2 MB) pure data parallelism is optimal (SURVEY.md §5.8) — tensor
    parallelism pays off only for much wider MLPs that blow past VMEM/HBM
    per chip, so this path uses the plain XLA MLP (the Pallas kernels
    assume whole weights resident per chip by design).

    Returns fn(state, rays, pixels) -> (state, stats), plus the shardings
    needed to place the inputs (state_sharding, batch_sharding).
    """
    cfg = cfg.replace(use_pallas=False)
    step_fn = make_train_step(cfg)  # no axis_name: GSPMD handles reductions

    from nerf_or_nothing_tpu.models.mlp import layer_dims

    w_sh = NamedSharding(mesh, P(None, MODEL_AXIS))
    b_sh = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    mp = mesh.shape[MODEL_AXIS]
    # Narrow heads (density 1-wide, rgb 3-wide) stay replicated; only
    # layers whose fan-out divides the model axis shard.
    params_sh = [
        (w_sh, b_sh) if o % mp == 0 else (rep, rep)
        for _, o in layer_dims(cfg)
    ]
    state_sh = TrainState(
        step=rep, params=params_sh, mu=params_sh, nu=params_sh, key=rep
    )
    batch_sh = NamedSharding(mesh, P(BATCH_AXIS))
    rays_sh = Rays(*([batch_sh] * len(Rays._fields)))

    step = jax.jit(
        step_fn,
        in_shardings=(state_sh, rays_sh, batch_sh),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,) if cfg.donate_params else (),
    )
    return step, state_sh, batch_sh


def make_sharded_train_step(cfg: Config, mesh: Mesh, mlp_apply=None):
    """The distributed train step: data-parallel shard_map + psum on ICI.

    Returns fn(state, rays, pixels) -> (state, stats); params/opt-state
    replicated, batch sharded, gradients pmean'd over the 'batch' axis
    inside the backward (overlappable by the XLA scheduler), stats pmean'd.
    """
    step_fn = make_train_step(cfg, mlp_apply=mlp_apply, axis_name=BATCH_AXIS)

    # Pytree-prefix specs: the whole state is replicated, the whole batch is
    # sharded along its leading (ray) dimension.
    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(
        sharded, donate_argnums=(0,) if cfg.donate_params else ()
    )


def make_sharded_multi_step(cfg: Config, mesh: Mesh, mlp_apply=None):
    """K sharded train steps per dispatch: ``lax.scan`` inside ``shard_map``.

    The mesh counterpart of ``train.make_jitted_multi_step`` (VERDICT r3 #3):
    ONE device program consumes a [K, batch, ...] stack (sharded over
    'batch' along axis 1 — see ``shard_batch_stack``) and chains the donated
    replicated TrainState in-graph, so pod training gets the same 1/K
    host-dispatch amortization as the single-chip bench; per-level gradient
    psums still happen inside every scanned step. Per-step stats come back
    stacked [K].

    The scan sits INSIDE shard_map: each chip scans over its own stripe of
    every batch, and the per-step collectives (grad pmean, stats pmean) run
    inside each iteration exactly as in the per-step path — so K scanned
    steps are bit-identical to K sequential ``make_sharded_train_step``
    calls (tests/test_distributed.py parity test).
    """
    step_fn = make_train_step(cfg, mlp_apply=mlp_apply, axis_name=BATCH_AXIS)

    def multi_step(state: TrainState, rays_stack: Rays, pixels_stack):
        def body(s, batch):
            r, p = batch
            s, stats = step_fn(s, r, p)
            return s, stats

        return jax.lax.scan(body, state, (rays_stack, pixels_stack))

    sharded = jax.shard_map(
        multi_step,
        mesh=mesh,
        in_specs=(P(), P(None, BATCH_AXIS), P(None, BATCH_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(
        sharded, donate_argnums=(0,) if cfg.donate_params else ()
    )
