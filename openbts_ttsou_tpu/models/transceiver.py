"""The flagship model: a complete multi-channel GSM transceiver pipeline.

Composes the DSP kernel library (`ops/`), the layer-0 engine (`trx/`)
and the resampler front-end into the reference's two hot call stacks
(SURVEY.md §3.1-3.2):

  uplink:   device-rate IQ → polyphase 65/96 → slot windows →
            energy/TSC/RACH detect → demod/equalize → soft bits
  downlink: burst bits → GMSK modulate (+filler fallback) →
            polyphase 96/65 → device-rate IQ

One `Transceiver` instance owns the functional `TrxState`; all compute
is jitted and batched over `[chan, slot]`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from openbts_ttsou_tpu.ops import fir
from openbts_ttsou_tpu.trx import engine as eng
from openbts_ttsou_tpu.utils.gsm_time import FRAME_SYMBOLS, HYPERFRAME

Array = jax.Array


class UplinkSpec(NamedTuple):
    """Static geometry of one uplink processing block."""

    frames: int = 13  # 13 frames → integral 65/96 resampling (60 ms)
    p: int = 65
    q: int = 96
    taps: int = 961

    @property
    def block_symbols(self) -> int:
        return self.frames * FRAME_SYMBOLS

    @property
    def block_in(self) -> int:
        assert (self.block_symbols * self.q) % self.p == 0
        return self.block_symbols * self.q // self.p


@functools.partial(jax.jit, static_argnums=(0, 1))
def uplink_block(cfg: eng.TrxConfig, spec: UplinkSpec, state: eng.TrxState,
                 samples: Array) -> tuple[eng.TrxState, eng.RxResult]:
    """Process one device-rate block for all channels.

    samples: [C, spec.block_in] complex64 at the 400 kS/s device rate
    (the 64M USRP path, Transceiver/radioInterface.cpp:197-260).
    Returns per-frame results stacked [frames, C, 8, ...].
    """
    from openbts_ttsou_tpu.parallel.sharded import _slot_windows

    lpf = fir.resampler_lpf(spec.p, spec.q, spec.taps)  # trace-time const
    sym = fir.polyphase_resample(samples, spec.p, spec.q, lpf)
    sym = sym[..., : spec.block_symbols]
    wins = _slot_windows(sym, spec.frames)

    def frame_step(st, frame):
        return eng.rx_step(cfg, st, frame)

    return lax.scan(frame_step, state, wins)


@functools.partial(jax.jit, static_argnums=(0, 1))
def downlink_block(cfg: eng.TrxConfig, spec: UplinkSpec, state: eng.TrxState,
                   bits: Array, valid: Array, atten_db: Array,
                   fn0: Array) -> Array:
    """Modulate `frames` downlink frames and resample to device rate.

    bits: [frames, C, 8, 148]; valid/atten_db: [frames, C, 8].
    Returns [C, spec.block_in] device-rate samples
    (driveTransmitFIFO → pushBuffer, Transceiver.cpp:672-722 +
    Transceiver/radioInterface.cpp:123-186).
    """
    frames = spec.frames

    def frame_step(fn, inp):
        b, v, a = inp
        out = eng.tx_step(cfg, state, b, v, a, fn)
        return (fn + 1) % HYPERFRAME, out

    _, slots = lax.scan(frame_step, fn0, (bits, valid, atten_db))
    # [frames, C, 8, 157] → continuous stream [C, frames·1250]
    sym = _assemble_stream(slots)
    lpf = fir.resampler_lpf(spec.q, spec.p, 651)
    out = fir.polyphase_resample(sym, spec.q, spec.p, lpf)
    return out[..., : spec.block_in]


def _assemble_stream(slots: Array) -> Array:
    """[frames, C, 8, 157] slot windows → [C, frames·1250] stream,
    laying slots at the 157/156/156/156 offsets (overlapping final
    samples of 156-slots are already zero-masked by tx_step)."""
    from openbts_ttsou_tpu.utils.gsm_time import SLOT_SAMPLE_PATTERN

    frames, c = slots.shape[0], slots.shape[1]
    offs = np.concatenate([[0], np.cumsum(SLOT_SAMPLE_PATTERN)])[:-1]
    out = jnp.zeros((c, frames * FRAME_SYMBOLS + 1), slots.dtype)
    idx = (np.arange(frames)[:, None, None] * FRAME_SYMBOLS
           + offs[None, :, None] + np.arange(eng.SLOT_SAMPLES)[None, None, :])
    idx = np.minimum(idx, frames * FRAME_SYMBOLS)
    flat_idx = jnp.asarray(idx).reshape(-1)
    vals = jnp.moveaxis(slots, 1, 0).reshape(c, -1)
    out = out.at[:, flat_idx].add(vals)
    return out[:, :-1]


class Transceiver:
    """Stateful convenience wrapper (the `Transceiver` object of
    Transceiver52M/Transceiver.h:44, minus the threads)."""

    def __init__(self, cfg: eng.TrxConfig = eng.TrxConfig(),
                 spec: UplinkSpec = UplinkSpec()):
        self.cfg = cfg
        self.spec = spec
        self.state = eng.init_state(cfg)

    # -- control verbs (driveControl, Transceiver.cpp:423-569) ---------
    def set_slot(self, chan: int, tn: int, combo: int) -> None:
        self.state = self.state._replace(
            chan_type=self.state.chan_type.at[chan, tn].set(combo))

    def set_tsc(self, chan: int, tsc: int) -> None:
        self.state = self.state._replace(
            tsc=self.state.tsc.at[chan].set(tsc))

    def set_max_delay(self, chan: int, delay: int) -> None:
        self.state = self.state._replace(
            max_expected_delay=self.state.max_expected_delay.at[chan]
            .set(delay))

    # -- data plane ----------------------------------------------------
    def process_uplink(self, samples: Array) -> eng.RxResult:
        self.state, res = uplink_block(self.cfg, self.spec, self.state,
                                       samples)
        return res

    def rx_frame(self, frame: Array) -> eng.RxResult:
        self.state, res = eng.rx_step(self.cfg, self.state, frame)
        return res

    def tx_frame(self, bits: Array, valid: Array, atten_db: Array) -> Array:
        return eng.tx_step(self.cfg, self.state, bits, valid, atten_db,
                           self.state.fn)
