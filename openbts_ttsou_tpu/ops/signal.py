"""Elementwise vector ops and small utilities.

Reference behavior: the misc helpers of Transceiver/sigProcLib.cpp —
vectorNorm2/vectorPower (:146-160), scaleVector (:713), conjugateVector
(:733), addVector (:746), offsetVector (:760), gaussianNoise Box-Muller
(:618-637), frequencyShift NCO (:432-471), dB/dBinv (:88-144), sinc
(:567), interpolatePoint (:639). All trivially batched jnp; the iterative
dB approximation is replaced by exact log10 (well inside the SNR parity
bound).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def norm2(x: Array, axis=-1) -> Array:
    """Σ|x|² (vectorNorm2)."""
    return jnp.sum(jnp.abs(x) ** 2, axis=axis)


def power(x: Array, axis=-1) -> Array:
    """mean |x|² (vectorPower)."""
    return jnp.mean(jnp.abs(x) ** 2, axis=axis)


def db(x: Array) -> Array:
    """dB relative to 1.0, clamped like the reference (sigProcLib.cpp:88):
    ≥1 → 0 dB, ≤0 → −200 dB."""
    x = jnp.asarray(x, jnp.float32)
    val = 10.0 * jnp.log10(jnp.maximum(x, 1e-20))
    return jnp.clip(val, -200.0, 0.0)


def db_inv(x_db: Array) -> Array:
    """10^(x/10), inverse of `db` (sigProcLib.cpp:117)."""
    x_db = jnp.asarray(x_db, jnp.float32)
    return jnp.where(x_db >= 0.0, 1.0, 10.0 ** (x_db / 10.0))


def frequency_shift(x: Array, freq: float, start_phase: float = 0.0) -> Array:
    """NCO mix: y[t] = x[t]·e^{+j(start_phase + freq·t)} with freq in
    radians/sample (frequencyShift, sigProcLib.cpp:432-471)."""
    t = jnp.arange(x.shape[-1], dtype=jnp.float32)
    osc = jnp.exp(1j * (start_phase + freq * t)).astype(jnp.complex64)
    return jnp.asarray(x) * osc


def gaussian_noise(key: jax.Array, shape, variance) -> Array:
    """Circular complex Gaussian noise with per-sample variance `variance`
    (gaussianNoise, sigProcLib.cpp:618-637, Box-Muller)."""
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(jnp.asarray(variance, jnp.float32) / 2.0)
    re = jax.random.normal(kr, shape, jnp.float32)
    im = jax.random.normal(ki, shape, jnp.float32)
    return (std * (re + 1j * im)).astype(jnp.complex64)


def sinc_interpolate(x: Array, ix: Array, half_width: int = 10) -> Array:
    """Sinc-interpolate batched signals at fractional indices.

    x: [..., T]; ix: [...] fractional sample index. Equivalent to
    interpolatePoint (sigProcLib.cpp:639-659): a (2·half_width+1)-tap
    windowed sinc around floor(ix), edge-clamped. Returns [...] complex.
    """
    x = jnp.asarray(x)
    ix = jnp.asarray(ix, jnp.float32)
    t = x.shape[-1]
    base = jnp.floor(ix).astype(jnp.int32) - half_width
    offs = jnp.arange(2 * half_width + 1)
    idx = base[..., None] + offs  # [..., 2h+1]
    # Reference clamps the window to [0, T-1] and drops the last point
    # (i < end with end = floor(ix)+half_width+1 capped at T-1).
    hi = jnp.minimum(base + 2 * half_width + 1, t - 1)
    valid = (idx >= jnp.maximum(base, 0)[..., None]) & (idx < hi[..., None]) & (
        idx >= 0)
    w = jnp.sinc(idx.astype(jnp.float32) - ix[..., None])
    vals = jnp.take_along_axis(
        jnp.broadcast_to(x, ix.shape + (t,)), jnp.clip(idx, 0, t - 1), axis=-1)
    return jnp.sum(jnp.where(valid, vals * w, 0.0), axis=-1)


def resample_linear(x: Array, expansion: float, out_len: int) -> Array:
    """Linear-interpolation resampler (resampleVector,
    sigProcLib.cpp:1213-1241): y[i] = lerp(x, i/expansion). Batched over
    leading dims; out-of-range reads clamp to the last sample.
    """
    x = jnp.asarray(x)
    t = jnp.arange(out_len, dtype=jnp.float32) / jnp.float32(expansion)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, x.shape[-1] - 1)
    i1 = jnp.clip(i0 + 1, 0, x.shape[-1] - 1)
    frac = (t - i0.astype(jnp.float32)).astype(x.dtype if
        jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32)
    return x[..., i0] * (1 - frac) + x[..., i1] * frac
