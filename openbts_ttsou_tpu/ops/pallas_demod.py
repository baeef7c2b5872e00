"""Pallas TPU kernel for the fused GMSK burst demodulator.

`gmsk.demodulate_burst` (demodulateBurst, Transceiver/sigProcLib.cpp:
1056-1097) is scale-by-1/channel → delayVector(−TOA) → GMSK reverse
rotate → slicer. As XLA ops the per-burst delay decomposes into a
21-tap per-batch sinc convolution plus a radix-9 integer shift — ~40
elementwise stages that Mosaic does not fuse, so every stage round-trips
[N, 157] through HBM (the single largest cost of the uplink chain after
the detector fixes: ~4.6 ms/block at 512 carriers).

This kernel runs the whole chain in one VMEM pass per burst tile: HBM
traffic collapses to one read of the bursts + one write of the soft
bits, and the ~40 shift/select stages become VPU rolls on VMEM-resident
tiles. Numerics match the XLA path: the same 21-tap truncated-sinc
fractional kernel (with the |frac| ≤ 1e-2 unit-impulse fast path of
delayVector, sigProcLib.cpp:582-592), the same zero-padding outside the
burst, and the same ±`max_shift` integer clamp.

sps=1 only (the reference 52M compile default); other rates take the
XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_N = 256  # bursts per program
LANE_T = 256  # 157-sample bursts padded to two lane tiles
SINC_HALF = 10  # 21-tap fractional interpolator
MAX_SHIFT = 40  # integer-shift clamp (delay_vector default)
RADIX = 9  # 81 = 9 × 9 integer shifts


def _kernel(xr_ref, xi_ref, par_ref, out_ref, *, t: int):
    """One burst tile: [TILE_N, LANE_T] planes + per-burst params.

    par_ref columns: 0 = toa, 1 = Re{channel}, 2 = Im{channel}.
    out_ref: [TILE_N, LANE_T] soft bits (first t columns meaningful).
    """
    xr = xr_ref[...]
    xi = xi_ref[...]
    toa = par_ref[:, 0:1]  # [TILE_N, 1]
    ch_r = par_ref[:, 1:2]
    ch_i = par_ref[:, 2:3]

    delay = -toa
    fl = jnp.floor(delay)
    int_off = jnp.clip(fl, -MAX_SHIFT, MAX_SHIFT)  # f32, integral
    frac = delay - fl
    small = jnp.abs(frac) <= 1e-2

    # fractional delay: y1[t] = Σ_{u=-10..10} x[t+u] · sinc(u + frac)
    y1r = jnp.zeros_like(xr)
    y1i = jnp.zeros_like(xi)
    for u in range(-SINC_HALF, SINC_HALF + 1):
        tap = jnp.sinc(u + frac)
        tap = jnp.where(small, jnp.float32(1.0 if u == 0 else 0.0), tap)
        y1r = y1r + pltpu.roll(xr, (-u) % LANE_T, axis=1) * tap
        y1i = y1i + pltpu.roll(xi, (-u) % LANE_T, axis=1) * tap

    # the burst is t samples long; zero the conv tail in the pad columns
    # so the integer roll below wraps zeros back in
    col = jax.lax.broadcasted_iota(jnp.int32, y1r.shape, 1)
    valid = col < t
    y1r = jnp.where(valid, y1r, 0.0)
    y1i = jnp.where(valid, y1i, 0.0)

    # integer shift y2[t] = y1[t − k]: k = 9·ka + kr − MAX_SHIFT with
    # digits ka, kr ∈ [0, 9) kept in f32 (exact for small ints; Mosaic
    # has no vector integer div/mod). Roll stages wrap through the
    # LANE_T − t ≥ 81 zero pad columns, never through data.
    shifted = int_off + jnp.float32(MAX_SHIFT)  # [0, 80]
    ka = jnp.floor(shifted / RADIX)
    kr = shifted - ka * RADIX
    midr = jnp.zeros_like(y1r)
    midi = jnp.zeros_like(y1i)
    for a in range(RADIX):
        sel = (ka == a).astype(jnp.float32)
        shift = RADIX * a - (MAX_SHIFT - RADIX // 2)  # −36 … 36
        midr = midr + pltpu.roll(y1r, shift % LANE_T, axis=1) * sel
        midi = midi + pltpu.roll(y1i, shift % LANE_T, axis=1) * sel
    y2r = jnp.zeros_like(y1r)
    y2i = jnp.zeros_like(y1i)
    for r in range(RADIX):
        sel = (kr == r).astype(jnp.float32)
        y2r = y2r + pltpu.roll(midr, (r - RADIX // 2) % LANE_T, axis=1) * sel
        y2i = y2i + pltpu.roll(midi, (r - RADIX // 2) % LANE_T, axis=1) * sel

    # scale by 1/channel (reciprocal-multiply; the engine only consumes
    # detected bursts, where |channel| > 0)
    inv = 1.0 / (ch_r * ch_r + ch_i * ch_i + 1e-30)
    sr = ch_r * inv
    si = -ch_i * inv
    zr = y2r * sr - y2i * si
    zi = y2r * si + y2i * sr

    # GMSK reverse rotation exp(−j·π/2·t) has period 4 — exact masks
    # instead of transcendentals: Re{z·e^{−jπt/2}} cycles through
    # zr, zi, −zr, −zi for t ≡ 0, 1, 2, 3 (mod 4)
    m = col & 3
    re = jnp.where(m == 0, zr,
                   jnp.where(m == 1, zi,
                             jnp.where(m == 2, -zr, -zi)))
    out_ref[...] = jnp.clip(0.5 * (re + 1.0), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def _demod_pallas_2d(xr: Array, xi: Array, par: Array, *, t: int,
                     interpret: bool) -> Array:
    n_pad = xr.shape[0]
    grid = (n_pad // TILE_N,)
    return pl.pallas_call(
        functools.partial(_kernel, t=t),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANE_T), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, LANE_T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, LANE_T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, LANE_T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, xi, par)


def demodulate_burst_pallas(x: Array, sps: int, channel: Array,
                            toa: Array, *, interpret: bool = False) -> Array:
    """Drop-in for `gmsk.demodulate_burst` at sps=1 on TPU.

    x: [..., T] complex64; channel: [...] complex gain; toa: [...]
    float samples. Returns [..., T] float32 soft bits.
    """
    assert sps == 1, "pallas demod kernel is sps=1 only"
    x = jnp.asarray(x)
    lead = x.shape[:-1]
    t = x.shape[-1]
    assert t + 2 * MAX_SHIFT <= LANE_T, "burst too long for the tile"
    x2 = x.reshape((-1, t))
    n = x2.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N

    pad_n, pad_t = n_pad - n, LANE_T - t
    xr = jnp.pad(jnp.real(x2).astype(jnp.float32),
                 ((0, pad_n), (0, pad_t)))
    xi = jnp.pad(jnp.imag(x2).astype(jnp.float32),
                 ((0, pad_n), (0, pad_t)))

    ch = jnp.broadcast_to(jnp.asarray(channel, jnp.complex64),
                          lead).reshape(-1)
    ch = jnp.where(ch == 0, 1.0 + 0.0j, ch)  # match x/0 never consumed
    toa_b = jnp.broadcast_to(jnp.asarray(toa, jnp.float32),
                             lead).reshape(-1)
    par = jnp.stack(
        [toa_b, jnp.real(ch).astype(jnp.float32),
         jnp.imag(ch).astype(jnp.float32)]
        + [jnp.zeros_like(toa_b)] * 5, axis=-1)  # [n, 8]
    par = jnp.pad(par, ((0, pad_n), (0, 0)))

    out = _demod_pallas_2d(xr, xi, par, t=t, interpret=interpret)
    return out[:n, :t].reshape(lead + (t,))
