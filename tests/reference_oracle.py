"""Scalar NumPy oracle implementing the reference's C# math exactly.

An independent, deliberately naive (loop-per-sample) transcription of the
semantics in ``ScratchNerf/MipHelpers.cs`` — the C# path is the reference's
own semantic oracle (SURVEY.md §2.6). The vectorized JAX ops in
``nerf_or_nothing_tpu.ops`` are tested allclose against this module.

The reference's known off-by-one (CastRay returning len(tVals)-2 samples,
MipHelpers.cs:413) is fixed here, matching canonical mip-NeRF: N+1 t-values
-> N samples. All other formulas follow the C# line by line.
"""

from __future__ import annotations

import numpy as np


def expected_sin(x, x_var):
    # MipHelpers.cs:358-366
    y = np.exp(-0.5 * x_var) * np.sin(x)
    y_var = np.maximum(
        0.0, 0.5 * (1.0 - np.exp(-2.0 * x_var) * np.cos(2.0 * x)) - y * y
    )
    return y, y_var


def lift_gaussian(d, t_mean, t_var, r_var, diag=True):
    # MipHelpers.cs:367-390, one (scalar t) sample
    d = np.asarray(d, np.float64)
    mean = d * t_mean
    d_sq = max(1e-10, float(d @ d))
    if diag:
        d_outer_diag = d * d
        null_outer_diag = 1.0 - d_outer_diag / d_sq
        return mean, t_var * d_outer_diag + r_var * null_outer_diag
    d_outer = np.outer(d, d)
    null_outer = np.eye(3) - d_outer / d_sq
    return mean, t_var * d_outer + r_var * null_outer


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag=True):
    # MipHelpers.cs:391-402
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    mu2, hw2 = mu * mu, hw * hw
    denom = 3.0 * mu2 + hw2
    t_mean = mu + (2.0 * mu * hw2) / denom
    t_var = hw2 / 3.0 - (4.0 / 15.0) * (hw2 * hw2 * (12.0 * mu2 - hw2)) / (
        denom * denom
    )
    r_var = base_radius**2 * (
        mu2 / 4.0 + (5.0 / 12.0) * hw2 - (4.0 / 15.0) * (hw2 * hw2) / denom
    )
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(d, t0, t1, radius, diag=True):
    # MipHelpers.cs:403-409
    return lift_gaussian(
        d, (t0 + t1) / 2.0, (t1 - t0) ** 2 / 12.0, radius**2 / 4.0, diag
    )


def cast_ray(t_vals, origin, direction, radius, shape="cone", diag=True):
    # MipHelpers.cs:410-428 with the off-by-one fixed: S+1 t -> S gaussians
    means, covs = [], []
    for i in range(len(t_vals) - 1):
        fn = (
            conical_frustum_to_gaussian
            if shape == "cone"
            else cylinder_to_gaussian
        )
        m, c = fn(direction, t_vals[i], t_vals[i + 1], radius, diag)
        means.append(m + np.asarray(origin))
        covs.append(c)
    return np.stack(means), np.stack(covs)


def integrated_pos_enc(mean, cov_diag, min_deg, max_deg):
    # MipHelpers.cs:429-471 (diag path), one sample -> [2*(max-min)*3]
    feats = []
    for i in range(min_deg, max_deg):
        scale = float(1 << i) if i >= 0 else 2.0**i
        y = np.asarray(mean) * scale
        y_var = np.asarray(cov_diag) * scale * scale
        sin_block = [expected_sin(y[j], y_var[j])[0] for j in range(3)]
        cos_block = [
            expected_sin(y[j] + np.pi * 0.5, y_var[j])[0] for j in range(3)
        ]
        feats.extend(sin_block)
        feats.extend(cos_block)
    return np.asarray(feats)


def pos_enc(x, min_deg, max_deg):
    # MipHelpers.cs:337-356 — identity + per-frequency sin/cos blocks
    x = np.asarray(x, np.float64)
    feats = [x]
    for i in range(min_deg, max_deg):
        xb = x * (2.0**i)
        feats.append(np.sin(xb))
        feats.append(np.cos(xb))
    return np.concatenate(feats)


def volumetric_rendering(rgb, density, t_vals, direction, white_bkgd):
    # MipHelpers.cs:472-493 (with S samples / S+1 t-values)
    n = len(density)
    d_norm = float(np.linalg.norm(direction))
    alpha = np.zeros(n)
    trans = np.zeros(n)
    weights = np.zeros(n)
    comp = np.zeros(3)
    acc = 0.0
    wds = 0.0
    for i in range(n):
        alpha[i] = 1.0 - np.exp(-density[i] * (t_vals[i + 1] - t_vals[i]) * d_norm)
        trans[i] = 1.0 if i == 0 else trans[i - 1] * (1.0 - alpha[i - 1])
        weights[i] = alpha[i] * trans[i]
        comp += weights[i] * np.asarray(rgb[i])
        acc += weights[i]
        wds += weights[i] * (t_vals[i] + t_vals[i + 1]) / 2.0
    distance = np.clip(
        wds / acc if acc > 0 else np.inf, t_vals[0], t_vals[-1]
    )
    if white_bkgd:
        comp = comp + (1.0 - acc)
    return comp, distance, acc, alpha, trans, weights


def volumetric_rendering_gradient(
    g_rgb, alpha, trans, weights, rgb, density, t_vals, direction, white_bkgd
):
    # MipHelpers.cs:517-610, with S live samples (no trailing dead sample)
    n = len(density)
    g_rgb = np.asarray(g_rgb, np.float64)
    color_grads = np.zeros((n, 3))
    density_grads = np.zeros(n)
    dl_dw = np.zeros(n)
    for i in range(n):
        dl_dw[i] = float(g_rgb @ np.asarray(rgb[i]))
        color_grads[i] = g_rgb * weights[i]
    if white_bkgd:
        dl_dacc = -float(np.sum(g_rgb))
        dl_dw += dl_dacc
    dl_dtrans = np.zeros(n + 1)
    dl_dalpha = np.zeros(n)
    for i in range(n):
        dl_dalpha[i] += dl_dw[i] * trans[i]
        dl_dtrans[i] += dl_dw[i] * alpha[i]
    # reverse recurrence through T[i+1] = T[i] (1 - alpha[i]); T has n
    # entries so the virtual T[n] gradient is 0
    for i in range(n - 2, -1, -1):
        t_next = trans[i] * (1.0 - alpha[i])  # == trans[i+1]
        dl_dtrans[i] += dl_dtrans[i + 1] * (1.0 - alpha[i])
        dl_dalpha[i] += -dl_dtrans[i + 1] * trans[i]
    d_norm = float(np.linalg.norm(direction))
    for i in range(n):
        delta = (t_vals[i + 1] - t_vals[i]) * d_norm
        exp_neg_s = 1.0 - alpha[i]
        density_grads[i] = dl_dalpha[i] * exp_neg_s * delta
    return color_grads, density_grads


def sorted_piecewise_constant_pdf(u, t_vals, weights):
    # MipHelpers.cs:774-851 with the uniform draws u passed in explicitly
    # (PRNG-agnostic: the JAX and oracle paths share the same u).
    num_bins = len(weights)
    eps = 1e-5
    weights = np.asarray(weights, np.float64).copy()
    weight_sum = weights.sum()
    padding = max(0.0, eps - weight_sum)
    if padding > 0:
        weights += padding / num_bins
        weight_sum += padding
    pdf = weights / weight_sum
    cdf = np.zeros(num_bins + 1)
    cum = 0.0
    for i in range(num_bins - 1):
        cum += pdf[i]
        cdf[i + 1] = min(1.0, cum)
    cdf[num_bins] = 1.0
    samples = np.zeros(len(u))
    for s, us in enumerate(u):
        idx = int(np.searchsorted(cdf, us, side="right")) - 1
        idx = min(max(idx, 0), num_bins - 1)
        g0, g1 = t_vals[idx], t_vals[idx + 1]
        c0, c1 = cdf[idx], cdf[idx + 1]
        denom = c1 - c0
        t = (us - c0) / denom if denom > 0 else 0.0
        t = min(max(t, 0.0), 1.0)
        samples[s] = g0 + t * (g1 - g0)
    return samples


def blurpool(weights, resample_padding):
    # MipHelpers.cs:646-661
    w = np.asarray(weights, np.float64)
    w_pad = np.concatenate([w[:1], w, w[-1:]])
    w_max = np.maximum(w_pad[:-1], w_pad[1:])
    return 0.5 * (w_max[:-1] + w_max[1:]) + resample_padding


def learning_rate_decay(step, lr_init, lr_final, max_steps,
                        delay_steps=0, delay_mult=1.0):
    # MipHelpers.cs:758-773
    delay_rate = 1.0
    if delay_steps > 0:
        p = np.clip(step / delay_steps, 0.0, 1.0)
        delay_rate = delay_mult + (1 - delay_mult) * np.sin(0.5 * np.pi * p)
    t = np.clip(step / max_steps, 0.0, 1.0)
    return delay_rate * np.exp(
        np.log(lr_init) * (1 - t) + np.log(lr_final) * t
    )


def adam_step(p, g, m, v, lr, t, b1=0.9, b2=0.999, eps=1e-8):
    # accelerated_functions.cu:403-416
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    m_hat = m / (1 - b1**t)
    v_hat = v / (1 - b2**t)
    p = p - lr * m_hat / np.sqrt(v_hat + eps)
    return p, m, v
