"""Pallas TPU kernel for the polyphase resampler hot loop.

The strided filter-bank resampler (`fir.polyphase_resample_mm`) is the
throughput-critical FIR of the uplink chain (BASELINE: 961 taps at the
400 kS/s device rate per carrier). This Pallas version keeps the
zero-padded `[K', p]` filter bank resident in VMEM and DMAs overlapping
input slabs from HBM (overlapping windows cannot be expressed as
BlockSpec tiles), feeding the MXU one dense matmul per tap-block per
grid step:

    out[b, m·p + r] = Σ_u x_pad[b, m·q + u] · bank[u, r]

Mosaic constraints shape the layout: strided vector slices are
unsupported and HBM slices must be lane-aligned, so the input is
pre-reshaped to q-sample rows padded to the 128-lane tile
([B, T/q, 128], lanes ≥ q zero), the per-output-cycle windows become
stride-1 row slices of the slab, and the tap axis is contracted in
ceil(K'/q) blocks of 128 whose bank rows beyond q are zero.

Numerics match `fir.polyphase_resample` exactly (same plan/bank); the
XLA path stays the default until per-backend benchmarks pick a winner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openbts_ttsou_tpu.ops import fir

Array = jax.Array

TILE_B = 8  # batch rows per program
TILE_M = 32  # output cycles per program (each cycle = p outputs)
LANE = 128  # minor-dim tile (f32)
SUBLANE = 8  # second-minor tile (f32)


def _kernel(x_hbm, bank_ref, out_ref, *, k_q: int, slab_rows: int,
            tile_m: int, tile_b: int):
    """One (batch-tile, cycle-tile) step with a manual slab DMA.

    x_hbm:   [B_pad, X_pad/q, LANE]  input, q-sample rows padded to 128
    bank_ref:[k_q·LANE, p]           zero-padded filter bank (VMEM)
    out_ref: [tile_b, tile_m, p]     outputs (VMEM block)
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body(slab, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tile_b, tile_b),
                     pl.ds(j * tile_m, slab_rows), slice(None)],
            slab, sem)
        dma.start()
        dma.wait()
        x = slab[...]  # [tile_b, slab_rows, LANE]
        # wins_c[b, m, r] = x_pad[b, (m+c)·q + r] (r < q; lanes ≥ q are
        # zero and meet zero bank rows) — tap block c contracts against
        # bank rows [c·LANE, (c+1)·LANE)
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        for c in range(k_q):
            wins = jax.lax.slice(
                x, (0, c, 0), (tile_b, c + tile_m, LANE))
            acc += jax.lax.dot_general(
                wins, bank_ref[pl.ds(c * LANE, LANE), :],
                dimension_numbers=(((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        out_ref[...] = acc

    pl.run_scoped(body,
                  pltpu.VMEM((tile_b, slab_rows, LANE), jnp.float32),
                  pltpu.SemaphoreType.DMA(()))


def polyphase_resample_pallas(x: Array, p: int, q: int, lpf: np.ndarray, *,
                              x_real: bool = False,
                              interpret: bool = False) -> Array:
    """Pallas-kernel P/Q resampler; output-identical to
    `fir.polyphase_resample`. x: [..., T] → [..., ceil(T·p/q)]."""
    x2, lead = fir._as_2d(jnp.asarray(x))
    lpf_np = np.asarray(lpf)
    taps = lpf_np.shape[-1]
    t = x2.shape[-1]
    n_out = fir.polyphase_output_len(t, p, q)
    _, _, _, _, k_prime, pad_left = fir._polyphase_plan(p, q, taps)
    bank = fir._polyphase_filter_bank(p, q, lpf_np)[:, 0, :].T  # [K', p]
    k_q = -(-k_prime // q)
    # bank row u = c·q + r lives at padded row c·LANE + r
    bank_pad = np.zeros((k_q * LANE, p), np.float32)
    for c in range(k_q):
        rows = min(q, k_prime - c * q)
        bank_pad[c * LANE: c * LANE + rows] = bank[c * q: c * q + rows]

    m_cycles = -(-n_out // p)
    m_tiles = -(-m_cycles // TILE_M)
    m_padded = m_tiles * TILE_M
    b = x2.shape[0]
    b_tiles = -(-b // TILE_B)
    b_padded = b_tiles * TILE_B

    # every slab reads slab_rows q-rows starting at j·TILE_M (DMA row
    # counts rounded up to the sublane tile)
    slab_rows = -(-(TILE_M + k_q) // SUBLANE) * SUBLANE
    need_rows = (m_tiles - 1) * TILE_M + slab_rows
    pad_right = max(0, need_rows * q - (pad_left + t))

    def _plane(xr):
        xp = jnp.pad(xr, ((0, b_padded - b), (pad_left, pad_right)))
        xp3 = xp.reshape(b_padded, -1, q)
        xp3 = jnp.pad(xp3, ((0, 0), (0, 0), (0, LANE - q))) \
            if q < LANE else xp3  # lane-align each q-row
        assert q <= LANE, "q > 128 needs multi-lane rows"
        out = pl.pallas_call(
            functools.partial(_kernel, k_q=k_q, slab_rows=slab_rows,
                              tile_m=TILE_M, tile_b=TILE_B),
            out_shape=jax.ShapeDtypeStruct(
                (b_padded, m_padded, p), jnp.float32),
            grid=(b_tiles, m_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((k_q * LANE, p), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TILE_B, TILE_M, p),
                                   lambda i, j: (i, j, 0)),
            interpret=interpret,
        )(xp3, jnp.asarray(bank_pad))
        return out.reshape(b_padded, -1)[:b, :n_out]

    re = _plane(jnp.real(x2).astype(jnp.float32))
    if x_real:
        res = re.astype(jnp.complex64)
    else:
        im = _plane(jnp.imag(x2).astype(jnp.float32))
        res = (re + 1j * im).astype(jnp.complex64)
    return res.reshape(lead + (n_out,))
