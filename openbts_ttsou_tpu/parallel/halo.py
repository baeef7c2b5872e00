"""Halo exchange for overlap-save streaming FIRs across a time-sharded axis.

The reference carries INHISTORY/OUTHISTORY samples between resampler
chunks inside one thread (Transceiver/radioInterface.h:35-41,
radioInterface.cpp:123-260). When the sample stream is sharded over a
`time` mesh axis, those boundary samples live on the neighboring device:
each block needs `left` trailing samples of its left neighbor and
`right` leading samples of its right neighbor before running the FIR —
one `ppermute` hop each way over ICI (the ring pattern of SNIPPETS.md
§1-3).
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp

from openbts_ttsou_tpu.ops import fir

Array = jax.Array


def exchange_halo(x: Array, left: int, right: int, axis_name: str) -> Array:
    """Prepend/append halo samples from ring neighbors along the last axis.

    Must be called inside `shard_map` over `axis_name`. x: [..., T_local].
    Returns [..., left + T_local + right]. The stream edges (first/last
    shard) receive zeros, matching the reference's zero-initialized
    history buffers (radioInterface.cpp:80-86).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    parts = [x]
    if left > 0:
        fwd = [(i, (i + 1) % n) for i in range(n)]  # data moves rightward
        from_left = lax.ppermute(x[..., -left:], axis_name, fwd)
        from_left = jnp.where(idx == 0, 0.0, from_left)
        parts.insert(0, from_left)
    if right > 0:
        bwd = [(i, (i - 1) % n) for i in range(n)]  # data moves leftward
        from_right = lax.ppermute(x[..., :right], axis_name, bwd)
        from_right = jnp.where(idx == n - 1, 0.0, from_right)
        parts.append(from_right)
    return jnp.concatenate(parts, axis=-1)


def resample_halo(p: int, q: int, num_taps: int) -> int:
    """Halo width (input samples, multiple of q) required on each side for
    an exact block-wise P/Q polyphase resample: the filter reads
    ±(num_taps−1)/(2p) input samples around each output."""
    need = (num_taps - 1 + 2 * p - 1) // (2 * p)
    return ((need + q - 1) // q) * q


def resample_block(x_halo: Array, p: int, q: int, lpf: Array, halo: int,
                   block_len: int) -> Array:
    """Resample one time block given symmetric input halos.

    x_halo: [..., halo + block_len + halo] with `halo` and `block_len`
    multiples of q. Returns the block's own [..., block_len·p/q] outputs,
    identical to slicing a full-stream `fir.polyphase_resample` — the
    overlap-save identity the reference maintains with its history
    buffers.
    """
    assert halo % q == 0 and block_len % q == 0
    y = fir.polyphase_resample(x_halo, p, q, lpf)
    start = halo * p // q
    return lax.slice_in_dim(y, start, start + block_len * p // q, axis=-1)
