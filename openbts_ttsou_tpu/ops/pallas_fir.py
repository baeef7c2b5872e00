"""Pallas TPU kernel for the polyphase resampler hot loop.

The strided filter-bank resampler (`fir.polyphase_resample_mm`) is the
throughput-critical FIR of the uplink chain (BASELINE: 961 taps at the
400 kS/s device rate per carrier). This Pallas version keeps the
`[K', p]` filter bank resident in VMEM and DMAs overlapping input slabs
from HBM (overlapping windows cannot be expressed as BlockSpec tiles),
feeding the MXU one dense matmul per grid step:

    out[b, m·p + r] = Σ_u x_pad[b, m·q + u] · bank[u, r]

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


def _kernel(x_hbm, bank_ref, out_ref, *, q: int, k_prime: int,
            tile_m: int, tile_b: int):
    """One (batch-tile, cycle-tile) step with a manual slab DMA.

    x_hbm:   [B_pad, X_pad] full input (ANY/HBM)
    bank_ref:[k_prime, p]   filter bank (VMEM)
    out_ref: [tile_b, tile_m, p] outputs (VMEM block)
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    slab_len = tile_m * q + k_prime

    def body(slab, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tile_b, tile_b),
                     pl.ds(j * tile_m * q, slab_len)],
            slab, sem)
        dma.start()
        dma.wait()
        x = slab[...]
        # wins[b, m, u] = x[b, m·q + u]: for each tap offset u the m-axis
        # is a stride-q slice — k_prime static slices, no index constants
        wins = jnp.stack(
            [jax.lax.slice(x, (0, u), (tile_b, u + tile_m * q), (1, q))
             for u in range(k_prime)], axis=-1)
        out_ref[...] = jax.lax.dot_general(
            wins, bank_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    pl.run_scoped(body,
                  pltpu.VMEM((tile_b, slab_len), jnp.float32),
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

    m_cycles = -(-n_out // p)
    m_tiles = -(-m_cycles // TILE_M)
    m_padded = m_tiles * TILE_M
    b = x2.shape[0]
    b_tiles = -(-b // TILE_B)
    b_padded = b_tiles * TILE_B

    # pad input so every slab read is in range
    need = (m_padded - 1) * q + TILE_M * q + k_prime
    pad_right = max(0, need - (pad_left + t))

    def _plane(xr):
        xp = jnp.pad(xr, ((0, b_padded - b), (pad_left, pad_right)))
        out = pl.pallas_call(
            functools.partial(_kernel, q=q, k_prime=k_prime,
                              tile_m=TILE_M, tile_b=TILE_B),
            out_shape=jax.ShapeDtypeStruct(
                (b_padded, m_padded, p), jnp.float32),
            grid=(b_tiles, m_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((k_prime, p), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TILE_B, TILE_M, p),
                                   lambda i, j: (i, j, 0)),
            interpret=interpret,
        )(xp, jnp.asarray(bank))
        return out.reshape(b_padded, -1)[:b, :n_out]

    re = _plane(jnp.real(x2).astype(jnp.float32))
    if x_real:
        res = re.astype(jnp.complex64)
    else:
        im = _plane(jnp.imag(x2).astype(jnp.float32))
        res = (re + 1j * im).astype(jnp.complex64)
    return res.reshape(lead + (n_out,))
