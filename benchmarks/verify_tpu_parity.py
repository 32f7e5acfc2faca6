"""On-chip numerics gate: compiled Mosaic kernels vs the jax.grad oracle.

The interpret-mode tests (tests/test_kernels_*.py) pin the kernel MATH on
CPU with tiny tiles; this script proves the COMPILED lowering on the real
TPU at flagship shapes (full 8x256 model, S=128, tile=2048 — shapes the
tiny-tile tests cannot lower on hardware). It checks, for both f32 and
bf16 compute:

- fused_level_train forward outputs (comp/weights) vs the unfused oracle;
- every layer's dW/db vs jax.grad of the oracle level loss.

Tolerances: f32 matmuls on TPU run as bf16x3 passes, so f32 parity is
checked at atol 1e-6 + rtol 1e-3 (near-zero early-layer gradients make a
pure relative check meaningless); bf16 compute at atol 2e-3 + rtol 3e-2.

Usage:  python benchmarks/verify_tpu_parity.py
Prints one JSON line {"ok": true, ...} and exits nonzero on mismatch.
Reference intent: the reference's only verification device is "the same
math implemented twice" (C# path vs CUDA path, SURVEY.md §4); this is
that idea made executable on the production hardware.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from nerf_or_nothing_tpu.config import Config
    from nerf_or_nothing_tpu.kernels.fused_level import fused_level_train
    from nerf_or_nothing_tpu.models import mlp as mlp_lib
    from nerf_or_nothing_tpu.ops import render

    def oracle_level(params, cfg, x_enc, dir_enc, t_vals, dirs, pixels,
                     mask, level_weight, white_bkgd):
        raw_rgb, raw_den = mlp_lib.apply_mlp(params, cfg, x_enc, dir_enc)
        rgb = jax.nn.sigmoid(raw_rgb)
        rgb = rgb * (1.0 + 2.0 * cfg.rgb_padding) - cfg.rgb_padding
        density = jax.nn.softplus(raw_den[..., 0] + cfg.density_bias)
        comp, acc, weights = render.composite(
            rgb, density, t_vals, dirs, white_bkgd
        )
        denom = jnp.maximum(jnp.sum(mask), 1e-10)
        sq = jnp.sum((comp - pixels) ** 2, axis=-1)
        return level_weight * jnp.sum(mask * sq) / denom, (comp, weights)

    results = {}
    ok = True
    for dtype, atol, rtol in (("float32", 1e-6, 1e-3),
                              ("bfloat16", 2e-3, 3e-2)):
        cfg = Config(compute_dtype=dtype, num_samples=128)
        S, R = cfg.num_samples, 32
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        params = mlp_lib.init_mlp(ks[0], cfg)
        x_enc = jax.random.normal(ks[1], (R, S, cfg.location_features)) * 0.5
        dir_enc = jax.random.normal(
            ks[2], (R, cfg.direction_features)) * 0.5
        t_vals = jnp.sort(
            jax.random.uniform(ks[3], (R, S + 1), minval=2.0, maxval=6.0),
            axis=-1,
        )
        dirs = jax.random.normal(ks[4], (R, 3))
        pixels = jax.random.uniform(ks[5], (R, 3))
        mask = jnp.ones((R,))
        lw = 0.1
        gsc = (lw * 2.0 * mask / jnp.maximum(jnp.sum(mask), 1e-10))[:, None]

        t0 = time.perf_counter()
        comp, _, wts, dp = fused_level_train(
            params, cfg, x_enc, dir_enc, t_vals, dirs, pixels, gsc, True
        )
        # Oracle in the same compute story: apply_mlp obeys cfg dtype; the
        # composite runs f32 both places.
        (_, (comp_o, wts_o)), grads = jax.value_and_grad(
            lambda p: oracle_level(p, cfg, x_enc, dir_enc, t_vals, dirs,
                                   pixels, mask, lw, True),
            has_aux=True,
        )(params)

        def norm_err(a, b):
            band = atol + rtol * jnp.abs(b) + rtol * jnp.max(jnp.abs(b))
            return float(jnp.max(jnp.abs(a - b) / band))

        worst = max(norm_err(comp, comp_o), norm_err(wts, wts_o))
        for (dw, db), (dwo, dbo) in zip(dp, grads):
            worst = max(worst, norm_err(dw, dwo), norm_err(db, dbo))
        results[dtype] = {
            "worst_normalized_err": round(worst, 4),
            "atol": atol, "rtol": rtol,
            "seconds": round(time.perf_counter() - t0, 1),
        }
        ok = ok and worst < 1.0

    print(json.dumps({
        "ok": ok,
        "platform": jax.devices()[0].platform,
        "results": results,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
