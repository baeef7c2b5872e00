"""Pallas TPU kernel for windowed burst correlation (CUSTOM span).

The 52M reference restricts the normal-burst midamble correlation to
`2*maxTOA+1` lags via a CUSTOM convolution span
(Transceiver52M/sigProcLib.cpp:983-1000, sigProcLib.h:47). On TPU the
same windowed correlation is a dense matmul: for each burst row, the
[W, L] window matrix (W lags, L template taps) multiplies the conjugated
template bank [L, K]. This kernel keeps the template bank resident in
VMEM and tiles the batch axis; complex arithmetic is carried as 4 real
MXU dots.

`correlate.analyze_traffic_burst` stays on the XLA einsum path by
default (XLA already fuses it well); this kernel is the drop-in for
backends where the einsum lowering is weak, selected via
`windowed_correlate(..., method="pallas")`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Array = jax.Array

TILE_B = 8  # burst rows per program


def _kernel(xr_ref, xi_ref, tr_ref, ti_ref, or_ref, oi_ref, *,
            lag0: int, n_lags: int, taps: int):
    """One batch tile: windowed complex correlation.

    xr/xi: [tile_b, T] burst planes (VMEM block)
    tr/ti: [taps, K] conjugated template planes (VMEM, broadcast)
    or/oi: [tile_b, n_lags, K] correlation planes
    """
    xr = xr_ref[...]
    xi = xi_ref[...]
    # wins[b, w, u] = x[b, lag0 + w + u] — taps static slices (stride 1)
    def windows(x):
        return jnp.stack(
            [jax.lax.slice(x, (0, lag0 + u), (x.shape[0],
                                              lag0 + u + n_lags))
             for u in range(taps)], axis=-1)

    wr = windows(xr)
    wi = windows(xi)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    tr = tr_ref[...]
    ti = ti_ref[...]
    # (wr + j wi) · (tr + j ti) summed over taps
    or_ref[...] = dot(wr, tr) - dot(wi, ti)
    oi_ref[...] = dot(wr, ti) + dot(wi, tr)


def windowed_correlate(x: Array, templates: Array, lag0: int,
                       n_lags: int, *, method: str = "xla") -> Array:
    """Correlate bursts against a template bank over a lag window.

    x: [B, T] complex64; templates: [K, L] complex64 (already
    time-reversed/conjugated as the caller requires — this is a plain
    sliding dot product). Returns [B, n_lags, K] complex64 with
    out[b, w, k] = Σ_u x[b, lag0 + w + u] · templates[k, u].

    Equivalent to the reference's CUSTOM-span correlate restricted to
    `n_lags` lags starting at `lag0`.
    """
    x = jnp.asarray(x)
    t = jnp.asarray(templates)
    B, T = x.shape
    K, L = t.shape
    if lag0 + n_lags - 1 + L > T:
        raise ValueError("lag window exceeds the burst")
    if method == "xla":
        idx = (np.arange(n_lags)[:, None] + np.arange(L)[None, :]) + lag0
        wins = x[:, idx]  # [B, W, L]
        return jnp.einsum("bwl,kl->bwk", wins, t,
                          precision=jax.lax.Precision.HIGHEST)
    # pallas path
    b_pad = -(-B // TILE_B) * TILE_B
    xr = jnp.zeros((b_pad, T), jnp.float32).at[:B].set(jnp.real(x))
    xi = jnp.zeros((b_pad, T), jnp.float32).at[:B].set(jnp.imag(x))
    tr = jnp.real(t).T.astype(jnp.float32)  # [L, K]
    ti = jnp.imag(t).T.astype(jnp.float32)
    grid = (b_pad // TILE_B,)
    kern = functools.partial(_kernel, lag0=lag0, n_lags=n_lags, taps=L)
    out_shape = [
        jax.ShapeDtypeStruct((b_pad, n_lags, K), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, n_lags, K), jnp.float32),
    ]
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, T), lambda i: (i, 0)),
            pl.BlockSpec((TILE_B, T), lambda i: (i, 0)),
            pl.BlockSpec((L, K), lambda i: (0, 0)),
            pl.BlockSpec((L, K), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_B, n_lags, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((TILE_B, n_lags, K), lambda i: (i, 0, 0)),
        ],
        out_shape=out_shape,
        interpret=method == "interpret",
    )(xr, xi, tr, ti)
    return (outs[0] + 1j * outs[1]).astype(jnp.complex64)[:B]
