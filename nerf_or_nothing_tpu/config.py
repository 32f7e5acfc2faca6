"""Configuration for the TPU-native MipNeRF framework.

One frozen dataclass is the single source of truth for every knob the
reference scatters across three places (C# ``Config`` in
``ScratchNerf/TrainState.cs:45-72``, model-class defaults in
``ScratchNerf/MipNerfModel.cs:10-28`` / ``ScratchNerf/MLP.cs:8-20``, and the
CUDA ``constexpr`` duplicates in ``AcceleratedNeRFUtils/helpers.h:16-20``).
Shapes flow from here into jit/pallas specializations at trace time, so there
is no duplicated constant anywhere else in this codebase.

The declared-but-dead reference flags (``GradMaxNorm``, ``GradMaxVal``,
``SaveEvery``, ``WeightDecayMult`` — ``TrainState.cs:58-64``) are implemented
as *working* features here.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Sequence


class RayShape(enum.Enum):
    """Shape of the cast ray volume (``MipHelpers.cs:333-336``)."""

    CONE = "cone"
    CYLINDER = "cylinder"


class DatasetType(enum.Enum):
    """Dataset loader selector (``TrainState.cs:41-44`` DatasetType enum)."""

    BLENDER = "blender"
    LLFF = "llff"
    MULTICAM = "multicam"
    BIN = "bin"  # preprocessed 64-byte ray records (BinDataset.cs)


@dataclasses.dataclass(frozen=True)
class Config:
    """All training / model / data hyperparameters.

    Field-for-field superset of the reference ``Config``
    (``TrainState.cs:45-72``) plus the model fields
    (``MipNerfModel.cs:10-28``, ``MLP.cs:8-20``).
    """

    # ---- data (TrainState.cs:46-53, Flags.cs:9-13) ----
    dataset_loader: DatasetType = DatasetType.BLENDER
    data_dir: str = ""
    batch_size: int = 1024          # rays / step (BinDataset.cs:12 GPU path)
    factor: int = 0                 # image downsample factor (LLFF)
    spherify: bool = False
    render_path: bool = False
    llff_hold: int = 8
    near: float = 2.0               # TrainState.cs:66
    far: float = 6.0                # TrainState.cs:67
    white_bkgd: bool = True         # TrainState.cs:71

    # ---- optimization (TrainState.cs:54-65) ----
    lr_init: float = 5e-4
    lr_final: float = 5e-6
    lr_delay_steps: int = 2500
    lr_delay_mult: float = 0.01
    grad_max_norm: float = 0.0      # 0 = off (declared-dead in reference)
    grad_max_val: float = 0.0       # 0 = off (declared-dead in reference)
    max_steps: int = 1_000_000
    save_every: int = 100_000
    print_every: int = 100
    gc_every: int = 10_000
    # Steps between held-out test renders (TrainState.cs:63 intent: a plain
    # step interval). The reference declares 1 but never reads it; rendering
    # every step is useless, so the working default matches save_every.
    test_render_interval: int = 100_000
    # Train steps folded into one device dispatch (lax.scan over staged
    # batches: train.make_jitted_multi_step on one device,
    # parallel.mesh.make_sharded_multi_step on a data-parallel mesh).
    # 1 = classic per-step dispatch. >1 amortizes host dispatch; the loop
    # still lands exactly on every print/save/test-render boundary (it
    # shortens the last chunk before each). The 2-D tensor-parallel
    # option keeps per-step dispatch.
    steps_per_call: int = 1
    disable_multiscale_loss: bool = False
    randomized: bool = True
    coarse_loss_mult: float = 0.1   # TrainState.cs:69
    weight_decay_mult: float = 0.0  # TrainState.cs:70 (declared-dead there)
    adam_beta1: float = 0.9         # AcceleratedAdamOptimizer.h:16-19
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8

    # ---- model (MipNerfModel.cs:10-28) ----
    num_samples: int = 128          # samples per level
    num_levels: int = 2             # coarse + fine
    resample_padding: float = 0.01
    stop_level_grad: bool = True
    lin_disp: bool = False
    ray_shape: RayShape = RayShape.CONE
    min_deg_point: int = 0
    max_deg_point: int = 16
    deg_view: int = 4
    density_bias: float = -1.0
    rgb_padding: float = 0.001
    # Carry sample Gaussians as a diagonal covariance (canonical default) or
    # as the full 3x3 matrix. The reference implements both branches
    # (LiftGaussian, MipHelpers.cs:367-390; IPE non-diag, :429-471); the IPE
    # consumes only the per-axis variance either way, so results match — the
    # full form exists for parity and for encodings with non-axis bases.
    diag_covariance: bool = True
    # The reference C# path encodes the *unnormalized* ray direction
    # (MipNerfModel.cs:70). Canonical mip-NeRF encodes normalized viewdirs;
    # both are supported, canonical is the default.
    use_viewdirs: bool = True

    # ---- MLP architecture (MLP.cs:8-20) ----
    net_depth: int = 8
    net_width: int = 256
    net_depth_condition: int = 1
    net_width_condition: int = 128
    skip_layer: int = 4
    num_rgb_channels: int = 3
    num_density_channels: int = 1

    # ---- TPU execution (new; no reference equivalent — SURVEY.md §2.11) ----
    use_pallas: bool = True         # fused Pallas kernels on the hot path
    # Whole-level fused training kernel (kernels/fused_level.py): MLP fwd +
    # compositing + loss grad + MLP bwd in ONE kernel, activations resident
    # in VMEM (no backward recompute: 4x -> 3x forward FLOPs per level).
    # Requires stop_level_grad (level gradients must be independent);
    # effective only on the training path with use_pallas.
    fuse_level: bool = True
    # Compute the IPE inside the fused-level kernel too (requires
    # diag_covariance): sample mean/variance enter the kernel transposed
    # ([3, N] — full 128-lane rows, unlike the round-1 row-major attempt
    # whose 3-wide inputs starved the lanes and measured 16.6 vs 11.0
    # ms/step), sin/cos run on the VPU under the MXU's shadow, and the
    # [R*S, 96] feature tensor plus its XLA encode fusion disappear.
    fuse_ipe: bool = False
    # Reduced-precision IPE transcendentals (ops/fastmath.py): polynomial
    # sin/cos/exp accurate to ~1e-7 in the live-frequency regime — far
    # below the bf16 feature quantum (~4e-3) — at a fraction of the
    # library routines' VPU cost. The encode is transcendental-bound
    # (0.34 ms/step at flagship shapes, docs/PERF.md r4); this halved it
    # on-chip (0.816 -> 0.843 of roofline, round 5). Applies to the XLA
    # encode fusion AND the in-kernel (fuse_ipe) path. Default ON; set
    # False for bit-exact library transcendentals.
    fast_ipe: bool = True
    # Emit the IPE as TRANSPOSED sin/cos halves ([3F, N] each) consumed
    # by the fused kernel with sin-rows-first permuted weights
    # (ops/ipe.integrated_pos_enc_split + kernels/fused_level x_mode=
    # "pair"). MEASURED REJECTED on v5e (train 0.792 / render 0.516 vs
    # 0.844 / 0.669 of roofline): XLA materializes the half-construction
    # broadcasts as relayouts AND the split K=48 matmuls cost +0.72
    # ms/level in-kernel (docs/PERF.md round 5). Kept as a probe.
    pair_ipe: bool = False
    # Emit the IPE directly as the transposed [6F, N] interleaved feature
    # tensor in ONE fusion (single sin, per-row scale/phase columns —
    # ops/ipe.integrated_pos_enc_xt): the [N, 96] intermediate, the
    # sin/cos concat fusion, and the [96, N] relayout never exist.
    # Kernel consumes it in the ordinary "t" mode (no weight permute).
    xt_ipe: bool = False
    # In-kernel IPE on the RENDER (inference) path specifically: the
    # forward-only kernel hides the VPU encode under the MXU better than
    # the train kernel does — measured 479k vs 471k rays/s on v5e
    # (docs/PERF.md round 5) — while on the TRAIN path in-kernel IPE
    # loses (192.2k vs 197.9k). Requires diag_covariance; ignored
    # elsewhere.
    fuse_ipe_render: bool = True
    debug_nans: bool = False        # jax_debug_nans sanitizer mode (§5.2)
    # checkify-instrumented train step: traps NaN/inf generation and OOB
    # gathers inside jit and raises with a source location (the "compute
    # sanitizer" the reference lacks while shipping real OOB reads,
    # accelerated_functions.cu:205-220 — SURVEY.md §5.2). Costs ~2x; debug.
    check_numerics: bool = False
    compute_dtype: str = "bfloat16"  # MXU-friendly; params/accum stay f32
    # Device mesh for training: () = automatic (all local devices on a 1-D
    # 'batch' axis); (n,) = n-device data-parallel mesh; (dp, mp) = 2-D
    # ('batch', 'model') mesh with tensor-parallel weights (parallel/mesh.py).
    mesh_shape: Sequence[int] = ()
    donate_params: bool = True
    remat: bool = False             # jax.checkpoint over the per-level MLP

    # ---- eval / render ----
    # Rays per chunk for full-image renders. 16384 measured ~1% faster
    # than 8192 on v5e (490.1k vs 486.7k rays/s; 32768 adds nothing
    # further) and halves the per-chunk host round-trips through the
    # tunnel.
    render_chunk_size: int = 16384
    # Train in LINEAR radiance: loaders decode the sRGB-encoded images with
    # srgb_to_linear at load, and eval/render re-encode model output with
    # linear_to_srgb for metrics and saved PNGs — the reference defines
    # both transfer functions but never calls them (MipHelpers.cs:738-757);
    # here they are a working, self-consistent pipeline. Default off: the
    # canonical mip-NeRF pipeline trains directly in display space.
    linear_color: bool = False

    # ---- checkpointing ----
    checkpoint_dir: str = ""
    resume: bool = True

    # ---- tracing / profiling (SURVEY.md §5.1; the reference has none) ----
    # When set, the train loop captures an XLA op-level trace of steps
    # 11..20 into this directory (viewable in TensorBoard / XProf).
    profile_dir: str = ""
    # Perf-attribution probes for the Pallas kernels, as a comma-separated
    # "key=value" string (e.g. "fm_bwd=phased,fl_tile=4096"). EXCLUSIVELY a
    # benchmarking hook (benchmarks/profile_step.py --probes ...): several
    # modes replace gradient math with shape-matched fillers to isolate one
    # op family's cost. Being a Config field makes every probe part of the
    # jit/pallas cache key, so a toggle can never be silently ignored (the
    # old env-var hooks were read at trace time and missed by the cache
    # key) and production configs — which never set this — can never
    # compute filler gradients. Keys: fm_bwd (nodw|nogchain|phased|accper|
    # bf16acc), fl_variant (nobwd|nocomp|twopass), fl_comp (rows), fm_acc
    # (when), fm_heads (t), fl_tile, fl_il, fr_tile, fr_il (render kernel).
    kernel_probes: str = ""

    seed: int = 0

    # ------------------------------------------------------------------
    @property
    def num_location_encodings(self) -> int:
        """IPE feature groups: 2*(max_deg-min_deg) Vector3s (MLP.cs:67)."""
        return 2 * (self.max_deg_point - self.min_deg_point)

    @property
    def num_direction_encodings(self) -> int:
        """View PE groups incl. identity: 2*deg_view+1 (MLP.cs:68)."""
        return 2 * self.deg_view + 1

    @property
    def location_features(self) -> int:
        return 3 * self.num_location_encodings  # 96 at defaults

    @property
    def direction_features(self) -> int:
        return 3 * self.num_direction_encodings  # 27 at defaults

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def probe(self, key: str, default: str = "") -> str:
        """Look up one ``kernel_probes`` entry (benchmark-only hook)."""
        for item in self.kernel_probes.split(","):
            k, _, v = item.partition("=")
            if k.strip() == key:
                return v.strip()
        return default


def tiny_config(**overrides: Any) -> Config:
    """BASELINE config 1: tiny MipNeRF (4x128), coarse-only 64 samples."""
    base = dict(
        net_depth=4,
        net_width=128,
        net_width_condition=64,
        num_samples=64,
        num_levels=1,
        max_deg_point=8,
        batch_size=256,
        use_pallas=False,
    )
    base.update(overrides)
    return Config(**base)


def full_config(**overrides: Any) -> Config:
    """BASELINE config 3: full hierarchical MipNeRF (8x256, 128+128)."""
    return Config(**overrides)


_FLAG_ALIASES = {
    # reference name -> our field (case-insensitive match also applied)
    "datasetloader": "dataset_loader",
    "datadir": "data_dir",
    "batchsize": "batch_size",
    "llffhold": "llff_hold",
    "lrinit": "lr_init",
    "lrfinal": "lr_final",
    "lrdelaysteps": "lr_delay_steps",
    "lrdelaymult": "lr_delay_mult",
    "gradmaxnorm": "grad_max_norm",
    "gradmaxval": "grad_max_val",
    "maxsteps": "max_steps",
    "saveevery": "save_every",
    "printevery": "print_every",
    "gcevery": "gc_every",
    "testrenderinterval": "test_render_interval",
    "disablemultiscaleloss": "disable_multiscale_loss",
    "coarselossmult": "coarse_loss_mult",
    "weightdecaymult": "weight_decay_mult",
    "whitebkgd": "white_bkgd",
}


def parse_flags(argv: Sequence[str], base: Config | None = None) -> Config:
    """Minimal ``--key=value`` CLI overrides onto a base config.

    The reference has no CLI at all (static mutable Config class); this is the
    working flag system SURVEY.md §5.6 calls for.
    """
    cfg = base or Config()
    fields = {f.name: f for f in dataclasses.fields(Config)}
    updates: dict[str, Any] = {}
    for arg in argv:
        if not arg.startswith("--"):
            continue
        key, _, value = arg[2:].partition("=")
        key = key.replace("-", "_").lower()
        key = _FLAG_ALIASES.get(key.replace("_", ""), key)
        if key not in fields:
            raise ValueError(f"unknown flag --{key}")
        f = fields[key]
        if f.type in ("int", int):
            updates[key] = int(value)
        elif f.type in ("float", float):
            updates[key] = float(value)
        elif f.type in ("bool", bool):
            updates[key] = value.lower() in ("1", "true", "yes")
        elif key == "dataset_loader":
            updates[key] = DatasetType(value.lower())
        elif key == "ray_shape":
            updates[key] = RayShape(value.lower())
        elif key == "mesh_shape":
            updates[key] = tuple(
                int(v) for v in value.split(",") if v
            )
        else:
            updates[key] = value
    return cfg.replace(**updates)
