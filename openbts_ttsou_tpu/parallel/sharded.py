"""The sharded full-duplex pipeline: dp over channels, sp over time.

Maps the reference's process layout (SURVEY.md §2.2) onto a
``(chan, time)`` mesh:

- the `chan` axis shards ARFCN carriers (data parallelism — each carrier
  is independent, like the per-ARFCN `ARFCNManager`s);
- the `time` axis shards the sample stream into blocks (sequence/context
  parallelism): the polyphase front-end gets its overlap-save boundary
  samples from ring neighbors via `ppermute` (the reference's
  INHISTORY/OUTHISTORY buffers, Transceiver/radioInterface.cpp:123-260);
- the burst clock is pure index math (block index → FN), checked with a
  `psum` sample-count agreement (the IND CLOCK plane,
  Transceiver.cpp:726-739).

Each time shard advances its own copy of the adaptive engine state over
its frames (a stream-parallel worker); the host exchanges/merges state
between steps on the clock plane.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from openbts_ttsou_tpu.ops import fir
from openbts_ttsou_tpu.parallel.halo import exchange_halo, resample_halo, resample_block
from openbts_ttsou_tpu.trx import engine as eng
from openbts_ttsou_tpu.utils.gsm_time import FRAME_SYMBOLS, SLOT_SAMPLE_PATTERN

Array = jax.Array


class ShardedPipelineSpec(NamedTuple):
    """Static geometry of one sharded step."""

    n_chan_total: int
    frames_per_shard: int
    p: int = 65  # device rate → symbol rate (the 64M USRP 400 kS/s path)
    q: int = 96
    taps: int = 961

    @property
    def block_symbols(self) -> int:
        return self.frames_per_shard * FRAME_SYMBOLS

    @property
    def block_in(self) -> int:
        """Device-rate samples per time shard (multiple of q)."""
        assert (self.block_symbols * self.q) % self.p == 0, (
            "frames_per_shard·1250·q must divide p — use multiples of 13 "
            "frames (1250·96/65 = 24000/13)")
        return self.block_symbols * self.q // self.p

    @property
    def halo_in(self) -> int:
        return resample_halo(self.p, self.q, self.taps)


def _slot_windows(symbols: Array, frames: int) -> Array:
    """[C, frames·1250] symbol-rate stream → [frames, C, 8, 157] slot
    windows along the 157/156/156/156 framing
    (Transceiver52M/radioInterface.cpp:270-292)."""
    c = symbols.shape[0]
    offs = np.concatenate([[0], np.cumsum(SLOT_SAMPLE_PATTERN)])[:-1]
    starts = (np.arange(frames)[:, None] * FRAME_SYMBOLS + offs[None, :])
    idx = starts[..., None] + np.arange(eng.SLOT_SAMPLES)  # [F, 8, 157]
    idx = np.minimum(idx, symbols.shape[-1] - 1)
    win = symbols[:, jnp.asarray(idx)]  # [C, F, 8, 157]
    return jnp.moveaxis(win, 0, 1)


def state_for_shards(state: eng.TrxState, n_time_shards: int) -> eng.TrxState:
    """Replicate engine state across time shards: every leaf gains a
    leading [time_shards] axis."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_time_shards,) + x.shape).copy(),
        state)


def sharded_uplink_pipeline(mesh: jax.sharding.Mesh, cfg: eng.TrxConfig,
                            spec: ShardedPipelineSpec,
                            mode: str = "exact"):
    """Build the jitted sharded step.

    Returns ``step(state_sh, samples, fn0) -> (state_sh, result, clock)``
    with:
      samples: [C_total, time_shards·(halo-free) block_in] complex64
               device-rate stream, sharded P('chan', 'time');
      state_sh: TrxState with leading [time_shards] axis,
               sharded P('time', 'chan', ...);
      fn0:     [] int32, first frame number of this step's stream window;
      result:  RxResult stacked [F_total, C_total, 8, ...] sharded
               P('time', 'chan');
      clock:   [] int32 — psum'd sample count (clock-plane agreement).
    """
    n_time = mesh.shape["time"]
    n_chan_dev = mesh.shape["chan"]
    assert spec.n_chan_total % n_chan_dev == 0
    c_local = spec.n_chan_total // n_chan_dev
    cfg_local = cfg._replace(n_chan=c_local)
    lpf = fir.resampler_lpf(spec.p, spec.q, spec.taps)  # trace-time const

    state_specs = eng.TrxState(
        fn=P("time"),
        chan_type=P("time", "chan"),
        tsc=P("time", "chan"),
        max_expected_delay=P("time", "chan"),
        energy_threshold=P("time", "chan"),
        prev_false_detect_fn=P("time", "chan"),
        chan_valid=P("time", "chan"),
        chan_response=P("time", "chan"),
        chan_resp_offset=P("time", "chan"),
        chan_amplitude=P("time", "chan"),
        snr=P("time", "chan"),
        dfe_forward=P("time", "chan"),
        dfe_feedback=P("time", "chan"),
        chan_estimate_fn=P("time", "chan"),
        filler=P("time", "chan"),
    )
    result_specs = eng.RxResult(*([P("time", "chan")] * 5))

    def body(state_sh: eng.TrxState, samples: Array, fn0: Array):
        # drop the leading per-shard axis (size 1 locally)
        state = jax.tree.map(lambda x: x[0], state_sh)
        # 1. halo exchange + blockwise resample to symbol rate (sp axis)
        h = spec.halo_in
        x = exchange_halo(samples, h, h, "time")
        sym = resample_block(x, spec.p, spec.q, lpf, h, spec.block_in)
        # 2. slot windows for this shard's frames
        wins = _slot_windows(sym, spec.frames_per_shard)  # [F, C, 8, 157]
        # 3. advance the engine over the frames (dp over chan inside)
        t_idx = lax.axis_index("time")
        fn_start = fn0 + t_idx * spec.frames_per_shard
        state = state._replace(fn=(fn_start).astype(jnp.int32))

        if mode in ("fast", "decoded"):
            from openbts_ttsou_tpu.models.transceiver import (
                process_block_fast,
            )

            state, results = process_block_fast(
                cfg_local, spec.frames_per_shard, state, sym)
        else:
            def frame_step(st, frame):
                return eng.rx_step(cfg_local, st, frame)

            state, results = lax.scan(frame_step, state, wins)
        # 4. clock plane: agree on total samples consumed
        clock = lax.psum(
            jnp.asarray(samples.shape[-1], jnp.int32) *
            jnp.ones((), jnp.int32), ("time", "chan")) // n_chan_dev
        if mode == "decoded":
            # 5. on-device FEC per shard (decode_block): XCCH groups +
            # RACH, stacked along the time axis like the results
            from openbts_ttsou_tpu.models.transceiver import decode_block

            dec = decode_block(results, fn_start,
                               spec.frames_per_shard)
            dec = dec._replace(first_fn=dec.first_fn[None])
            return (jax.tree.map(lambda x: x[None], state), results,
                    clock, dec)
        return (jax.tree.map(lambda x: x[None], state), results, clock)

    out_specs = (state_specs, result_specs, P())
    if mode == "decoded":
        from openbts_ttsou_tpu.models.transceiver import DecodedBlocks

        out_specs = out_specs + (DecodedBlocks(
            bits=P("time", "chan"), ok=P("time", "chan"),
            first_fn=P("time"), rach_ra=P("time", "chan"),
            rach_ok=P("time", "chan")),)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(state_specs, P("chan", "time"), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)
