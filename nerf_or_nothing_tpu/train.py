"""Training: hand-rolled Adam, LR schedule, jit'd train step, train loop.

TPU-native equivalent of the reference training stack:

- ``adam_update``  <- the fused ``adam_optimizer_step`` CUDA kernel
  (accelerated_functions.cu:403-416): m/v EMA + bias-corrected step with the
  reference's exact epsilon placement ``lr * m_hat / sqrt(v_hat + eps)``;
  betas/eps from AcceleratedAdamOptimizer.h:16-19.
- ``train_step``   <- Program.TrainStep + AcceleratedMipNeRF.GetGradient
  (Program.cs:48-62, AcceleratedMipNeRF.cpp:52-144): one jit'd
  loss -> grad -> (clip) -> psum -> adam with donated params — zero host
  round-trips per step (the reference H2D-copies 6 ray arrays and syncs after
  every kernel launch).
- ``TrainState``   <- TrainState.cs (plus the optimizer state the reference
  keeps in raw device buffers).
- grad clipping and weight decay implement the reference's declared-but-dead
  ``GradMaxNorm`` / ``GradMaxVal`` / ``WeightDecayMult`` flags
  (TrainState.cs:58-64) as working features.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_or_nothing_tpu.config import Config
from nerf_or_nothing_tpu.metrics import Stats
from nerf_or_nothing_tpu.models import mipnerf, mlp as mlp_lib
from nerf_or_nothing_tpu.ops.math_utils import learning_rate_decay, mse_to_psnr
from nerf_or_nothing_tpu.rays import Rays


class TrainState(NamedTuple):
    """step + params + Adam moments + PRNG key (SURVEY.md §5.4)."""

    step: jnp.ndarray
    params: Any
    mu: Any          # first moment (m)
    nu: Any          # second moment (v)
    key: jax.Array


def init_train_state(cfg: Config, key: Optional[jax.Array] = None) -> TrainState:
    key = jax.random.PRNGKey(cfg.seed) if key is None else key
    pkey, skey = jax.random.split(key)
    params = mlp_lib.init_mlp(pkey, cfg)
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        mu=zeros,
        nu=jax.tree.map(jnp.zeros_like, params),
        key=skey,
    )


def adam_update(params, grads, mu, nu, lr, step, cfg: Config):
    """Fused Adam, reference math (accelerated_functions.cu:403-416).

    p -= lr * (m/(1-b1^t)) / sqrt(v/(1-b2^t) + eps), eps inside the sqrt
    exactly as the reference kernel computes ``rsqrtf(vHat + 1e-8f)``.
    """
    b1, b2, eps = cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps
    t = step.astype(jnp.float32)
    c1 = 1.0 / (1.0 - b1**t)
    c2 = 1.0 / (1.0 - b2**t)

    new_mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, mu, grads)
    new_nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g, nu, grads)
    new_params = jax.tree.map(
        lambda p, m, v: p - lr * (m * c1) * jax.lax.rsqrt(v * c2 + eps),
        params, new_mu, new_nu,
    )
    return new_params, new_mu, new_nu


def clip_grads(grads, cfg: Config):
    """Value + norm clipping (the dead TrainState.cs:58-59 flags, working).

    The norm reduces over one flattened concat of all leaves — a single
    fused reduction instead of ~2 launches per tensor (the grads are tiny;
    per-op dispatch would dominate)."""
    if cfg.grad_max_val > 0:
        grads = jax.tree.map(
            lambda g: jnp.clip(g, -cfg.grad_max_val, cfg.grad_max_val), grads
        )
    flat = jnp.concatenate([g.ravel() for g in jax.tree.leaves(grads)])
    grad_norm = jnp.sqrt(jnp.sum(flat * flat))
    grad_abs_max = jnp.max(jnp.abs(flat))
    if cfg.grad_max_norm > 0:
        mult = jnp.minimum(1.0, cfg.grad_max_norm / (1e-10 + grad_norm))
        grads = jax.tree.map(lambda g: g * mult, grads)
        grad_abs_max = grad_abs_max * mult  # stat reflects applied grads
    clipped_norm = jnp.minimum(
        grad_norm,
        grad_norm if cfg.grad_max_norm <= 0 else cfg.grad_max_norm,
    )
    return grads, grad_norm, clipped_norm, grad_abs_max


def _fused_level_value_and_grad(cfg: Config, params, key, rays: Rays,
                                pixels, axis_name: Optional[str] = None):
    """Loss + gradients via the whole-level fused kernel (no jax.grad).

    Valid exactly when ``stop_level_grad`` holds: each level's loss gradient
    is then independent (level l+1 reads level l's weights through a
    stop-gradient), so total grads are the sum of per-level kernel dW/db,
    with the level's loss weight folded into the per-ray g_scale.

    When ``axis_name`` is set, each level's gradients are pmean'd the moment
    that level's kernel finishes — level l's ~2 MB all-reduce is then
    independent of level l+1's multi-ms kernel, giving XLA's latency-hiding
    scheduler real compute to overlap it with (instead of one reduce after
    all backward work is done).

    Returns (loss, (level_losses, fine_rgb, weight_l2), grads) — the same
    contract as jax.value_and_grad of the unfused loss_fn; grads are
    already axis-reduced when axis_name is given.

    The per-level structure (dir encoding, sampling, encode-or-defer, loss
    mask/normalizer, level weights) is the SAME code as the jax.grad path —
    the shared helpers in ``models.mipnerf`` — so the two training paths
    cannot drift; only the level compute (one fused kernel vs MLP +
    composite + autodiff) differs.
    """
    from nerf_or_nothing_tpu.kernels.fused_level import fused_level_train

    dir_enc = mipnerf.encode_dirs(cfg, rays)
    # Global-batch normalizer (reference lossMultSum): under data
    # parallelism the pmean'd sum = global_sum / n_shards, so the per-level
    # grad pmean below reproduces the single-device gradients exactly even
    # with non-uniform loss_mult (Multicam's 4^s weights).
    mask, denom = mipnerf.loss_normalizer(
        cfg, rays.loss_mult, axis_name=axis_name
    )
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    grads = None
    losses = []
    comp = None
    t_vals = weights = None
    for i_level in range(cfg.num_levels):
        key, level_key = jax.random.split(key)
        # stop_grad=True unconditionally: this path requires
        # stop_level_grad (see use_fused_level).
        t_vals, (means, covs) = mipnerf.sample_level(
            cfg, level_key, rays, i_level, t_vals, weights,
            cfg.randomized, stop_grad=True,
        )
        x_enc, means_covs = mipnerf.encode_samples(
            cfg, means, covs, in_kernel=True, dtype=dt
        )
        g_scale = (
            mipnerf.level_weight(cfg, i_level) * 2.0 * mask / denom
        )[..., None]
        comp, _, weights, d_params = fused_level_train(
            params, cfg, x_enc, dir_enc, t_vals, rays.directions,
            pixels, g_scale, cfg.white_bkgd, means_covs=means_covs,
        )
        losses.append(
            jnp.sum(mask * jnp.sum((comp - pixels) ** 2, axis=-1)) / denom
        )
        if axis_name is not None:
            d_params = jax.lax.pmean(d_params, axis_name)
        grads = d_params if grads is None else [
            (gw + dw, gb + db)
            for (gw, gb), (dw, db) in zip(grads, d_params)
        ]
    losses = jnp.stack(losses)
    total = mipnerf.total_from_level_losses(cfg, losses)
    if cfg.weight_decay_mult > 0:
        wl2 = sum(jnp.sum(w**2) for w, _ in params)
        total = total + cfg.weight_decay_mult * wl2
        grads = [
            (gw + 2.0 * cfg.weight_decay_mult * w, gb)
            for (gw, gb), (w, _) in zip(grads, params)
        ]
    else:
        wl2 = jnp.zeros(())
    return total, (losses, comp, wl2), grads


def use_fused_level(cfg: Config) -> bool:
    """Whether the whole-level fused train kernel applies to this config."""
    return (
        cfg.use_pallas
        and cfg.fuse_level
        and cfg.stop_level_grad
        # fuse_ipe moves the IPE inside this kernel; it assumes the
        # diagonal-covariance closed form
        and (not cfg.fuse_ipe or cfg.diag_covariance)
        # the in-kernel composite/loss assumes the standard head widths
        and cfg.num_rgb_channels == 3
        and cfg.num_density_channels == 1
    )


def make_train_step(cfg: Config, mlp_apply=None, axis_name: Optional[str] = None):
    """Build the (un-jitted) train step; see ``parallel/`` for sharded wrap.

    Returns fn(state, rays, pixels) -> (new_state, Stats). When ``axis_name``
    is set, gradients and scalar stats are psum/pmean'd over that mesh axis
    (the ~2 MB gradient all-reduce rides ICI; measured schedule in
    docs/PERF.md "Multi-chip": XLA combines it into one ~73 us sync
    collective, ~1% of the step).
    """

    def loss_fn(params, key, rays: Rays, pixels):
        results = mipnerf.render_rays(
            params, cfg, key, rays,
            randomized=cfg.randomized,
            white_bkgd=cfg.white_bkgd,
            mlp_apply=mlp_apply,
        )
        total, level_losses = mipnerf.multiscale_loss(
            results, pixels, rays.loss_mult, cfg, axis_name=axis_name
        )
        if cfg.weight_decay_mult > 0:
            wl2 = sum(jnp.sum(w**2) for w, _ in params)
            total = total + cfg.weight_decay_mult * wl2
        else:
            wl2 = jnp.zeros(())
        return total, (level_losses, results[-1].rgb, wl2)

    def train_step(state: TrainState, rays: Rays, pixels: jnp.ndarray):
        key, step_key = jax.random.split(state.key)
        if axis_name is not None:
            # Decorrelate sampling jitter across shards (SURVEY.md §7 "PRNG
            # discipline"): each chip folds its mesh position into the key.
            step_key = jax.random.fold_in(
                step_key, jax.lax.axis_index(axis_name)
            )
        step = state.step + 1
        lr = learning_rate_decay(
            step, cfg.lr_init, cfg.lr_final, cfg.max_steps,
            cfg.lr_delay_steps, cfg.lr_delay_mult,
        )
        if use_fused_level(cfg) and mlp_apply is None:
            # grads come back already pmean'd per level (overlappable).
            loss, (level_losses, fine_rgb, wl2), grads = (
                _fused_level_value_and_grad(
                    cfg, state.params, step_key, rays, pixels,
                    axis_name=axis_name,
                )
            )
        else:
            (loss, (level_losses, fine_rgb, wl2)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, step_key, rays, pixels
                )
            )
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)

        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
            level_losses = jax.lax.pmean(level_losses, axis_name)

        grads, grad_norm, clipped_norm, grad_abs_max = clip_grads(grads, cfg)
        params, mu, nu = adam_update(
            state.params, grads, state.mu, state.nu, lr, step, cfg
        )
        psnr = mse_to_psnr(jnp.mean((fine_rgb - pixels) ** 2))
        stats = Stats(
            loss=loss,
            losses=level_losses,
            weight_l2=wl2,
            psnr=psnr,
            psnrs=mse_to_psnr(level_losses),
            grad_norm=grad_norm,
            grad_abs_max=grad_abs_max,
            grad_norm_clipped=clipped_norm,
            learning_rate=lr,
        )
        return TrainState(step, params, mu, nu, key), stats

    return train_step


def make_jitted_train_step(cfg: Config, mlp_apply=None):
    """Single-device jit with donated state (fast path for 1 chip).

    With ``cfg.check_numerics`` the step is checkify-instrumented
    (SURVEY.md §5.2): NaN/inf generation and out-of-bounds indexing inside
    the jit raise a Python error with the offending source location instead
    of silently corrupting training (the reference prints kernel errors and
    keeps going, AcceleratedMipNeRF.cpp:97-101). ~2x slower; a debug mode.
    """
    step_fn = make_train_step(cfg, mlp_apply=mlp_apply)
    if cfg.check_numerics:
        from jax.experimental import checkify

        checked = checkify.checkify(
            step_fn, errors=checkify.float_checks | checkify.index_checks
        )
        inner = jax.jit(checked)

        def checked_step(state, rays, pixels):
            err, out = inner(state, rays, pixels)
            err.throw()
            return out

        return checked_step
    return jax.jit(step_fn, donate_argnums=(0,) if cfg.donate_params else ())


def make_jitted_multi_step(cfg: Config, mlp_apply=None):
    """K train steps per dispatch: ``lax.scan`` over pre-staged batches.

    TPU-native host-dispatch amortization: the host enqueues ONE program
    that consumes a [K, batch, ...] stack of ray batches and chains the
    donated TrainState in-graph; per-step stats come back stacked [K] for
    logging. Cuts per-step host dispatch (~50 us on a pod VM, ~1 ms through
    tunneled PJRT) to 1/K. K is a call-time shape, not a trace constant —
    recompiles only per distinct K. The reference has no analogue: its host
    loop synchronizes after every kernel (AcceleratedMipNeRF.cpp:97-141).
    """
    step_fn = make_train_step(cfg, mlp_apply=mlp_apply)

    def multi_step(state: TrainState, rays_stack: Rays, pixels_stack):
        def body(s, batch):
            r, p = batch
            s, stats = step_fn(s, r, p)
            return s, stats

        return jax.lax.scan(body, state, (rays_stack, pixels_stack))

    return jax.jit(
        multi_step, donate_argnums=(0,) if cfg.donate_params else ()
    )
