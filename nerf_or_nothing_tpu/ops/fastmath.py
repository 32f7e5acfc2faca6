"""Reduced-precision transcendentals for the IPE encode hot path.

WHY: the IPE encode is transcendental-throughput-bound — ~144 sin/cos/exp
per (ray, sample) against ~37.7M samples/step at the flagship config. The
full-precision library routines pay for f32-exact results (~1e-7), but the
feature tensor is consumed in bf16 (quantum ~4e-3 near 1) — everything
below ~1e-4 absolute is invisible to the model. These kernels target
~1e-5: 3-10x cheaper on the VPU, exact at the bf16 output precision, and
built from plain FMA/bit ops so they lower identically in XLA fusions AND
inside Mosaic (whose library sin/cos throughput measured ~3x below XLA's,
docs/PERF.md round 3 — a cost these polynomials sidestep entirely).

Accuracy (validated in tests/test_ops_ipe.py against the f64 references):
  fast_sin / fast_cos : < 4e-7 absolute over |x| <= 2^20
  fast_exp_neg        : < 2e-6 relative over x in [0, 87]; exact 0 beyond

Range notes: arguments are reduced with a 3-term Cody-Waite split of pi,
exact for quotients |k| < 2^22 — far beyond the IPE's worst case
(|mean|*2^15 ~ 2e5 => k ~ 6e4). At those magnitudes the *input itself*
carries |x|*eps_f32 ~ 1e-2 absolute phase error before any sin is taken
(inherent to computing 2^i * mean in f32 — the full-precision path has
exactly the same input error), so nothing is lost vs the library routine.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# pi split into 3 parts, each with ~21 significant bits (exactly
# representable products with k < 2^22): pi = PI_A + PI_B + PI_C.
_PI_A = 3.140625
_PI_B = 9.67502593994140625e-4
_PI_C = 1.509957990978376432e-7
_INV_PI = 0.3183098861837907
_HALF_PI = 1.5707963267948966

# sin(r)/r on [-pi/2, pi/2], even polynomial in r^2 (the widely used
# minimax-tuned 5-term kernel; max abs error ~3e-7 on the interval).
_S1 = -1.6666667e-1
_S2 = 8.3333310e-3
_S3 = -1.9840874e-4
_S4 = 2.7525562e-6
_S5 = -2.3889859e-8

_LOG2E = 1.4426950408889634
# 2^f on [0, 1]: degree-6 Taylor in ln2 (max rel error ~1.4e-6).
_E1 = 6.93147180559945286e-1
_E2 = 2.40226506959100694e-1
_E3 = 5.55041086648215800e-2
_E4 = 9.61812910762847687e-3
_E5 = 1.33335581464284411e-3
_E6 = 1.54035303933816099e-4


# cos(r) on [-pi/2, pi/2], even polynomial in r^2 (Taylor deg 10; max abs
# error ~2.7e-7 at the interval ends).
_C2 = -0.5
_C4 = 4.16666666666666644e-2
_C6 = -1.38888888888888894e-3
_C8 = 2.48015873015873016e-5
_C10 = -2.75573192239858925e-7


def _sin_poly(r):
    """sin(r) for r in ~[-pi/2 - eps, pi/2 + eps]."""
    r2 = r * r
    p = _S5
    p = p * r2 + _S4
    p = p * r2 + _S3
    p = p * r2 + _S2
    p = p * r2 + _S1
    return r + r * (r2 * p)


def _cos_poly(r):
    """cos(r) for r in ~[-pi/2 - eps, pi/2 + eps]."""
    r2 = r * r
    p = _C10
    p = p * r2 + _C8
    p = p * r2 + _C6
    p = p * r2 + _C4
    p = p * r2 + _C2
    return 1.0 + r2 * p


def fast_sin(x):
    """sin(x) to ~4e-7 absolute, f32, pure FMA/bit ops.

    Reduction: k = round(x/pi) via floor(x/pi + 0.5) (k exact in f32 for
    |k| < 2^23), r = x - k*pi with the 3-term split, sin(x) =
    (-1)^k * sin(r)."""
    x = x.astype(jnp.float32)
    k = jnp.floor(x * _INV_PI + 0.5)
    r = x - k * _PI_A
    r = r - k * _PI_B
    r = r - k * _PI_C
    # parity of k -> sign flip; k is an exact small integer here.
    k_int = k.astype(jnp.int32)
    odd = lax.bitwise_and(k_int, 1)
    sign = 1.0 - 2.0 * odd.astype(jnp.float32)
    return sign * _sin_poly(r)


def fast_cos(x):
    """cos(x) = sin(x + pi/2) with the shift folded into the reduction.

    The k*PI_x products keep the same ``x - k*c`` shape as ``fast_sin``
    (FMA-fusable — a ``(k-0.5)*c`` form rounds the product first and
    loses ~1e-2 at |x| ~ 2e5); the +pi/2 lands as one final add of a
    small constant onto the reduced residual."""
    x = x.astype(jnp.float32)
    k = jnp.floor(x * _INV_PI + 1.0)  # round((x + pi/2)/pi)
    r = x - k * _PI_A
    r = r - k * _PI_B
    r = r - k * _PI_C
    r = r + _HALF_PI
    k_int = k.astype(jnp.int32)
    odd = lax.bitwise_and(k_int, 1)
    sign = 1.0 - 2.0 * odd.astype(jnp.float32)
    return sign * _sin_poly(r)


def fast_sincos(x):
    """(sin(x), cos(x)) with ONE shared range reduction.

    sin(k*pi + r) = (-1)^k sin(r) and cos(k*pi + r) = (-1)^k cos(r): the
    k, the reduced residual, and the parity sign are all shared — the
    pair costs ~30 VPU ops vs ~42 for separate fast_sin + fast_cos. This
    is the IPE encode's shape: every frequency needs both."""
    x = x.astype(jnp.float32)
    k = jnp.floor(x * _INV_PI + 0.5)
    r = x - k * _PI_A
    r = r - k * _PI_B
    r = r - k * _PI_C
    k_int = k.astype(jnp.int32)
    odd = lax.bitwise_and(k_int, 1)
    sign = 1.0 - 2.0 * odd.astype(jnp.float32)
    return sign * _sin_poly(r), sign * _cos_poly(r)


def fast_exp_neg(x):
    """exp(-x) for x >= 0, to ~2e-6 relative; underflows cleanly to 0.

    2^t split as integer exponent (assembled with bit ops: (k+127)<<23
    bitcast to f32) times a degree-6 polynomial of the fraction."""
    x = x.astype(jnp.float32)
    t = -x * _LOG2E
    # Below 2^-126 the true value is subnormal-or-zero; pin the integer
    # exponent to a safe range and zero the result past the cutoff.
    t_clamped = jnp.maximum(t, -126.0)
    k = jnp.floor(t_clamped)
    f = t_clamped - k  # in [0, 1)
    p = _E6
    p = p * f + _E5
    p = p * f + _E4
    p = p * f + _E3
    p = p * f + _E2
    p = p * f + _E1
    pow2f = 1.0 + f * p
    bits = lax.shift_left(k.astype(jnp.int32) + 127, 23)
    pow2k = lax.bitcast_convert_type(bits, jnp.float32)
    out = pow2k * pow2f
    return jnp.where(t < -125.0, 0.0, out)
