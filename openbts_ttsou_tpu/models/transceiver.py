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


def process_block_fast(cfg: eng.TrxConfig, frames: int,
                       state: eng.TrxState, sym: Array
                       ) -> tuple[eng.TrxState, eng.RxResult]:
    """Throughput-mode block receiver on a symbol-rate stream: every
    burst of the block runs through detection/equalization/demod in ONE
    batch.

    Semantics vs the exact per-frame scan (`uplink_block`): adaptive
    thresholds and channel/DFE state are taken from the block start and
    updated once per block (a ≤13-frame refresh lag). The reference
    itself re-estimates channels only every 50 frames
    (Transceiver52M/Transceiver.cpp:313) and drifts its energy threshold
    slowly, so the operational behavior is unchanged — but the
    sequential depth drops from frames·157 to 157 scan steps per block,
    which is what the MXU-parallel layout wants.
    """
    from openbts_ttsou_tpu.ops import correlate as xcorr
    from openbts_ttsou_tpu.ops import dfe as dfe_mod
    from openbts_ttsou_tpu.ops import gmsk as gmsk_mod
    from openbts_ttsou_tpu.parallel.sharded import _slot_windows

    c, sps = cfg.n_chan, cfg.sps
    f = frames
    wins = _slot_windows(sym, f)  # [F, C, 8, T]
    bursts = wins.reshape((-1, wins.shape[-1]))  # [F·C·8, T]
    n = bursts.shape[0]

    fns = (state.fn + jnp.arange(f)) % HYPERFRAME  # [F]
    corr_type = jax.vmap(
        lambda fn: eng.expected_corr_type(state.chan_type, fn))(fns)
    is_tsc = (corr_type == eng.CorrType.TSC).reshape(-1)
    is_rach = (corr_type == eng.CorrType.RACH).reshape(-1)

    thr = jnp.tile(jnp.repeat(state.energy_threshold, 8), f)
    has_energy, _ = xcorr.energy_detect(bursts, 20 * sps, thr)

    tsc_flat = jnp.tile(jnp.repeat(state.tsc, 8), f)
    # estimation tail gated like the exact engine: only slots with
    # SETMAXDELAY > 1 ever consume a channel estimate (needDFE,
    # Transceiver.cpp:311-330)
    det_tsc, chan_est, chan_off = xcorr.analyze_traffic_burst(
        bursts, tsc_flat, sps, threshold=cfg.tsc_threshold,
        estimate_channel=True, max_toa=cfg.max_toa,
        gate_estimation=jnp.any(state.max_expected_delay > 1))
    det_rach = eng._detect_rach_slots(
        wins.reshape(f * c, 8, wins.shape[-1]), sps, cfg.rach_threshold,
        cfg.rach_slots)

    success = has_energy & jnp.where(
        is_tsc, det_tsc.detected,
        jnp.where(is_rach, det_rach.detected, False))
    # per-carrier SETMAXDELAY acceptance, as in rx_step (RACH upper
    # bound when set; TSC window ±max(SETMAXDELAY, 3)·sps —
    # Transceiver52M/sigProcLib.cpp:982-990)
    med = jnp.tile(jnp.repeat(state.max_expected_delay[:, None], 8,
                              axis=1).reshape(-1), f
                   ).astype(jnp.float32) * sps
    success = success & jnp.where(
        is_rach & (med > 0), det_rach.toa <= med, True)
    tsc_bound = jnp.maximum(med, 3.0 * sps)
    success = success & jnp.where(
        is_tsc, (det_tsc.toa <= tsc_bound) & (det_tsc.toa >= -tsc_bound),
        True)
    amplitude = jnp.where(is_tsc, det_tsc.amplitude, det_rach.amplitude)
    toa = jnp.where(is_tsc, det_tsc.toa, det_rach.toa)

    # demod + equalize for the WHOLE block at once
    soft_plain = gmsk_mod.demodulate_burst(bursts, sps, amplitude, toa)
    need_dfe = jnp.tile(jnp.repeat(state.max_expected_delay > 1, 8), f)
    use_dfe = is_tsc & need_dfe & jnp.tile(
        state.chan_valid.reshape(-1), f)
    k = 148

    # The equalizer is a 157-step sequential scan — by far the deepest
    # dependency chain of the block. It only matters when some channel
    # runs with SETMAXDELAY > 1 and a valid estimate, so gate the whole
    # scan at runtime (the reference likewise branches per burst,
    # Transceiver.cpp:381-395).
    def _run_eq(_):
        scaled = bursts / jnp.where(amplitude == 0, 1.0,
                                    amplitude)[:, None]
        dfe_w = jnp.tile(state.dfe_forward.reshape(c * 8, -1), (f, 1))
        dfe_b = jnp.tile(state.dfe_feedback.reshape(c * 8, -1), (f, 1))
        off_b = jnp.tile(state.chan_resp_offset.reshape(-1), f)
        return dfe_mod.equalize_burst(scaled, toa - off_b, sps, dfe_w,
                                      dfe_b)[:, :k]

    soft_eq = jax.lax.cond(jnp.any(use_dfe), _run_eq,
                           lambda _: jnp.full((n, k), 0.5, jnp.float32),
                           operand=None)
    soft = jnp.where(use_dfe[:, None], soft_eq, soft_plain[:, :k])
    soft = jnp.where(success[:, None], soft, 0.5)

    amp_abs = jnp.maximum(jnp.abs(amplitude), 1e-9)
    rssi = jnp.floor(20.0 * jnp.log10(cfg.rssi_full_scale / amp_abs)
                     ).astype(jnp.int32)
    timing = jnp.round(toa * 256.0 / sps).astype(jnp.int32)

    # once-per-block state refresh: last successful TSC estimate per
    # (chan, slot) updates the channel/DFE state; thresholds get the
    # net block adjustment
    succ_f = success.reshape(f, c, 8)
    # need_dfe mask keeps the gated-off estimation tail (zeros) from
    # overwriting live channel state: a channel only consumes estimates
    # when SETMAXDELAY > 1, exactly when the gate is open
    est_ok = (det_tsc.detected & is_tsc & has_energy &
              need_dfe).reshape(f, c, 8)
    last = jnp.argmax(jnp.cumsum(est_ok, axis=0) *
                      est_ok, axis=0)  # last True index (0 if none)
    any_est = est_ok.any(axis=0)
    # Select frame `last` per (chan, slot) by a one-hot contraction
    # over the 13-frame axis — NOT a row gather from the [F·C·8, ...]
    # arrays: a gather whose operand is a fused producer makes XLA
    # re-materialize the producer element-at-a-time (measured 190 ms
    # of the 234 ms block at 1024 carriers; the one-hot form is free).
    sel = (jnp.arange(f)[:, None] ==
           last.reshape(-1)[None, :]).astype(jnp.float32)  # [F, C·8]

    def pick(x):
        """x [F·C·8, ...] → the per-(chan,slot) row at frame `last`."""
        xf = x.reshape((f, c * 8) + x.shape[1:])
        if jnp.iscomplexobj(x):
            s = sel.astype(xf.real.dtype)
            return (jnp.einsum("fn...,fn->n...", xf.real, s)
                    + 1j * jnp.einsum("fn...,fn->n...", xf.imag, s)
                    ).astype(x.dtype)
        return jnp.einsum("fn...,fn->n...", xf.astype(jnp.float32),
                          sel).astype(x.dtype)

    amp_sel = pick(amplitude)  # [C·8]
    new_amp = amp_sel.reshape(c, 8)
    chan_norm = pick(chan_est) / jnp.where(amp_sel == 0, 1.0,
                                           amp_sel)[:, None]
    snr_new = (jnp.abs(amp_sel) ** 2 /
               (pick(thr) ** 2 + 1.0)).reshape(c, 8)
    # symbol-rate DFE design (see trx/engine.py: the reference's
    # designDFE/equalizeBurst are symbol-rate constructs), gated with
    # the estimation tail
    w_new, b_new = jax.lax.cond(
        jnp.any(state.max_expected_delay > 1),
        lambda _: dfe_mod.design_dfe(
            chan_norm[..., ::sps],
            jnp.maximum(snr_new.reshape(-1), 1e-6), eng.DFE_NF),
        lambda _: (jnp.zeros((c * 8, eng.DFE_NF), jnp.complex64),
                   jnp.zeros((c * 8, eng.CHAN_TAPS - 1), jnp.complex64)),
        operand=None)

    def upd(old, new):
        m = any_est.reshape((c, 8) + (1,) * (old.ndim - 2))
        return jnp.where(m, new.reshape(old.shape), old)

    hits = succ_f.sum(axis=(0, 2))  # per-chan detections in block
    acct = ((corr_type != eng.CorrType.OFF) &
            (corr_type != eng.CorrType.IDLE))
    # RACH-typed slots outside cfg.rach_slots never detect (no decoder
    # installed in the reference) — exclude them from miss accounting,
    # matching rx_step's `active` mask
    if cfg.rach_slots is not None:
        allowed = np.zeros(8, bool)
        allowed[list(cfg.rach_slots)] = True
        acct = acct & ~((corr_type == eng.CorrType.RACH) &
                        ~jnp.asarray(allowed)[None, None, :])
    misses = (has_energy.reshape(f, c, 8) & ~succ_f &
              acct.reshape(f, c, 8)).sum(axis=(0, 2))
    e_thr = jnp.maximum(state.energy_threshold - hits.astype(jnp.float32),
                        0.0) + 10.0 * jnp.minimum(
        misses.astype(jnp.float32), 1.0)

    new_state = state._replace(
        fn=(state.fn + f) % HYPERFRAME,
        energy_threshold=e_thr,
        chan_valid=state.chan_valid | any_est,
        chan_response=upd(state.chan_response, chan_norm),
        chan_amplitude=upd(state.chan_amplitude, new_amp),
        chan_resp_offset=upd(state.chan_resp_offset,
                             pick(chan_off).reshape(c, 8)),
        snr=upd(state.snr, snr_new),
        dfe_forward=upd(state.dfe_forward, w_new),
        dfe_feedback=upd(state.dfe_feedback, b_new),
    )
    res = eng.RxResult(
        detected=success.reshape(f, c, 8),
        is_rach=(success & is_rach).reshape(f, c, 8),
        soft_bits=soft.reshape(f, c, 8, k),
        rssi=rssi.reshape(f, c, 8),
        timing=timing.reshape(f, c, 8),
    )
    return new_state, res


@functools.partial(jax.jit, static_argnums=(0, 1))
def uplink_block_fast(cfg: eng.TrxConfig, spec: UplinkSpec,
                      state: eng.TrxState, samples: Array
                      ) -> tuple[eng.TrxState, eng.RxResult]:
    """Resampler front-end + `process_block_fast`."""
    lpf = fir.resampler_lpf(spec.p, spec.q, spec.taps)
    sym = fir.polyphase_resample(samples, spec.p, spec.q, lpf)
    return process_block_fast(cfg, spec.frames, state,
                              sym[..., : spec.block_symbols])


class DecodedBlocks(NamedTuple):
    """On-device FEC output for one uplink block: XCCH blocks fully
    contained in the window (`bits` [G, C, 8, 184] uint8 in air bit
    order, `ok` [G, C, 8] bool FireCode syndrome, `first_fn` [] int32 —
    the FN of group 0's first burst), per-frame RACH decodes
    (`rach_ra` [F, C, 8] int32, `rach_ok` [F, C, 8] bool — RA value and
    color-code check where a RACH was detected), and TCH/FS + FACCH
    8-burst diagonal half-blocks completing inside the window
    (TCHFACCHL1Decoder, GSML1FEC.cpp:1031-1175): `tch_speech`
    [Gt, C, 8, 260] uint8 coder-order vocoder frames, `tch_good`
    [Gt, C, 8] (class-1a parity + tail, and not stolen), `facch_bits`
    [Gt, C, 8, 184] air-order FACCH frames with `facch_ok` (FireCode,
    and stolen), `tch_stolen` [Gt, C, 8] (the completing burst's Hl
    flag), `tch_end_fn` [Gt] int32 FN of each group's completing burst
    (−1 where `tch_valid` is False — the window held no such group)."""

    bits: Array
    ok: Array
    first_fn: Array
    rach_ra: Array
    rach_ok: Array
    tch_speech: Array
    tch_good: Array
    facch_bits: Array
    facch_ok: Array
    tch_stolen: Array
    tch_end_fn: Array
    tch_valid: Array


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def uplink_block_decoded(cfg: eng.TrxConfig, spec: UplinkSpec,
                         state: eng.TrxState, samples: Array,
                         bsic: int = 0, exact: bool = True
                         ) -> tuple[eng.TrxState, eng.RxResult,
                                    DecodedBlocks]:
    """Full TPU-resident receiver: device-rate IQ → detection/demod →
    XCCH FEC decode, one fused program.

    The reference splits this at the UDP boundary (soft bits cross to
    the BTS process, GSML1FEC decodes burst-at-a-time per channel);
    batching the 4-burst deinterleave + 16-state Viterbi + FireCode
    syndrome over every (chan, slot) on the MXU-adjacent VPU removes
    the host round trip for bulk receivers (IQ scanners, load tests,
    multi-ARFCN pods). Groups are the FN%4-aligned 4-burst XCCH blocks
    (interleaver block boundary, GSML1FEC.cpp:572-630) fully inside the
    13-frame window — always 3 of them."""
    from openbts_ttsou_tpu.gsm import l1fec

    fn0 = state.fn
    if exact:
        new_state, res = uplink_block(cfg, spec, state, samples)
    else:
        new_state, res = uplink_block_fast(cfg, spec, state, samples)
    return new_state, res, decode_block(res, fn0, spec.frames, bsic)


@functools.lru_cache(maxsize=None)
def _tch_group_tables(frames: int):
    """Static TCH half-block geometry per window phase p = fn0 % 26.

    The TCH/F 26-multiframe (GSMTDMA.cpp:245-270) skips fn%26 ∈ {12, 25}
    (SACCH/idle); the diagonal burst index B = reverseMapping(fn) % 8 is
    continuous across repeats (24 ≡ 0 mod 8). A half-block completes at
    every burst with B % 4 == 3 whose 7 predecessors are also inside
    the window (TCHFACCHL1Decoder::processBurst, GSML1FEC.cpp:1051-1068).

    Returns (frame_idx [26, Gt, 8], end_frame [26, Gt], valid [26, Gt]).
    """
    from openbts_ttsou_tpu.gsm.tdma import FACCH_TCHF

    rev = FACCH_TCHF.reverse_map()  # [26], −1 on SACCH/idle
    per_phase = []
    gmax = 1
    for p in range(26):
        tch = [(f, int(rev[(p + f) % 26]) % 8) for f in range(frames)
               if rev[(p + f) % 26] >= 0]
        groups = [([tch[i - 7 + j][0] for j in range(8)], f)
                  for i, (f, b) in enumerate(tch)
                  if b % 4 == 3 and i >= 7]
        per_phase.append(groups)
        gmax = max(gmax, len(groups))
    idx = np.zeros((26, gmax, 8), np.int32)
    end = np.zeros((26, gmax), np.int32)
    valid = np.zeros((26, gmax), bool)
    for p, groups in enumerate(per_phase):
        for g, (fr, f_end) in enumerate(groups):
            idx[p, g], end[p, g], valid[p, g] = fr, f_end, True
    return idx, end, valid


#: frames of previous-window soft bits carried by the streaming
#: decoder: a TCH 8-burst diagonal can reach 8 frames back (8 bursts
#: spanning one idle frame); XCCH groups need at most 3
DECODE_PRELUDE = 8


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def uplink_block_decoded_stream(cfg: eng.TrxConfig, spec: UplinkSpec,
                                state: eng.TrxState, samples: Array,
                                bsic: int, prev_soft: Array,
                                prev_valid: Array
                                ) -> tuple[eng.TrxState, eng.RxResult,
                                           DecodedBlocks, Array, Array]:
    """Streaming fused receiver: like `uplink_block_decoded`, but FEC
    groups whose bursts SPAN the window boundary decode too, by
    prepending the previous window's last DECODE_PRELUDE frames of
    soft bits (the reference's per-burst decoders never lose groups to
    windowing — mI[] persists across bursts, GSML1FEC.cpp:572-630,
    1031-1100; this carry restores that on the windowed path). Each
    group is decoded exactly once: only groups COMPLETING inside the
    new window are reported.

    prev_soft [DECODE_PRELUDE, C, 8, 148] (zeros on the first window),
    prev_valid [] bool (False on the first window — prelude-spanning
    groups are then masked out). Returns (state', res, blocks,
    prev_soft', prev_valid')."""
    fn0 = state.fn
    new_state, res = uplink_block(cfg, spec, state, samples)
    blocks = decode_block(res, fn0, spec.frames, bsic,
                          prev_soft=prev_soft, prev_valid=prev_valid)
    return (new_state, res, blocks,
            res.soft_bits[-DECODE_PRELUDE:],
            jnp.asarray(True))


def decode_block(res: eng.RxResult, fn0: Array, frames: int,
                 bsic: int = 0, prev_soft: Array | None = None,
                 prev_valid: Array | None = None) -> DecodedBlocks:
    """FEC-decode one block's RxResult on device: the FN%4-aligned
    4-burst XCCH groups inside the window, per-frame RACH decode, and
    the TCH/FS + FACCH 8-burst diagonal half-blocks. Shared by the
    single-chip and sharded pipelines. With `prev_soft` (the streaming
    carry, see `uplink_block_decoded_stream`), groups spanning the
    left window edge decode as well; groups are reported exactly once
    (those completing in the current window)."""
    from openbts_ttsou_tpu.gsm import fec, l1fec

    c = res.soft_bits.shape[1]
    p = DECODE_PRELUDE if prev_soft is not None else 0
    if p:
        soft_all = jnp.concatenate([prev_soft, res.soft_bits], axis=0)
        pv = prev_valid
    else:
        soft_all = res.soft_bits
        pv = jnp.asarray(True)
    fn0_ext = (fn0 - p) % HYPERFRAME
    n_g = (p + frames) // 4
    off = (-fn0_ext) % 4  # frames until the next FN%4 block boundary
    # pad the frame axis so the slice never clamps (off ≤ 3); groups
    # extending past the window are masked invalid below
    soft_p = jnp.pad(soft_all, ((0, 3), (0, 0), (0, 0), (0, 0)))
    soft = lax.dynamic_slice_in_dim(soft_p, off, n_g * 4, axis=0)
    # [G·4, C, 8, 148] → [G, 4, C, 8, 148] → [G·C·8, 4, 148]
    g = jnp.moveaxis(soft.reshape(n_g, 4, c, 8, 148), 1, 3)
    bits, ok = l1fec.xcch_decode(g.reshape(n_g * c * 8, 4, 148))
    ends = off + (jnp.arange(n_g) + 1) * 4
    # report each group exactly once: it must END inside the current
    # window; prelude-reaching groups need a valid carry
    complete = (ends <= p + frames) & (ends > p) & \
        ((ends - 4 >= p) | pv)

    # RACH: every detected access burst decodes in the same program
    # (RACHL1Decoder::writeLowSide, GSML1FEC.cpp:474-513)
    rach_soft = res.soft_bits[
        ..., l1fec.RACH_DATA_START: l1fec.RACH_DATA_START + 36]
    ra, ra_ok = l1fec.rach_decode(rach_soft, bsic)

    # TCH/FS + FACCH (TCHFACCHL1Decoder::processBurst + deinterleave +
    # decode/decodeTCH, GSML1FEC.cpp:1031-1175). In window coordinates
    # the deinterleaver's circular-row offsets (0/4) fold away: with
    # the group's 8 bursts ordered oldest→newest, coded bit k always
    # reads burst k % 8 — i.e. tch_interleave_map(0).
    ti, te, tv = _tch_group_tables(p + frames)
    gt = ti.shape[1]
    p26 = fn0_ext % 26
    gf = lax.dynamic_index_in_dim(jnp.asarray(ti), p26, 0, keepdims=False)
    ge = lax.dynamic_index_in_dim(jnp.asarray(te), p26, 0, keepdims=False)
    gv = lax.dynamic_index_in_dim(jnp.asarray(tv), p26, 0, keepdims=False)
    # once-only + carry-validity masking, as for the XCCH groups
    gv = gv & (ge >= p) & ((gf[:, 0] >= p) | pv)
    grp = jnp.take(soft_all, gf.reshape(-1), axis=0)
    grp = jnp.moveaxis(grp.reshape((gt, 8, c, 8, 148)), 1, 3)
    payload, (hl, _hu) = fec.unmap_from_burst(grp)  # [Gt, C, 8, 8, 114]
    coded = fec.deinterleave(payload.reshape(gt * c * 8, 8, 114),
                             fec.tch_interleave_map(0))  # [.., 456]
    # stealing flag: Hl of the completing (newest) burst
    # (GSML1FEC.cpp:1073; the encoder sets both H bits per GSM 05.03
    # 4.2.5, the decoder keys on Hl)
    stolen = hl[..., 7] > 0.5  # [Gt, C, 8]
    speech, tch_parity = l1fec.tch_decode(coded)
    fbits, f_ok = l1fec.xcch_decode_coded(coded)
    gvc = gv[:, None, None]

    return DecodedBlocks(
        bits=bits.reshape(n_g, c, 8, 184),
        ok=ok.reshape(n_g, c, 8) & complete[:, None, None],
        first_fn=(fn0_ext + off) % HYPERFRAME,
        rach_ra=ra.astype(jnp.int32),
        rach_ok=ra_ok & res.is_rach,
        tch_speech=speech.reshape(gt, c, 8, 260),
        tch_good=tch_parity.reshape(gt, c, 8) & ~stolen & gvc,
        facch_bits=fbits.reshape(gt, c, 8, 184),
        facch_ok=f_ok.reshape(gt, c, 8) & stolen & gvc,
        tch_stolen=stolen & gvc,
        tch_end_fn=jnp.where(gv, (fn0_ext + ge) % HYPERFRAME, -1),
        tch_valid=gv,
    )


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
    del fn0  # tx_step ignores fn; the stream layout is frame-indexed
    # whole-window batched modulation (no per-frame scan)
    slots = eng.tx_frames(cfg, state, bits, valid, atten_db)
    # [frames, C, 8, 157] → continuous stream [C, frames·1250]
    sym = _assemble_stream(slots)
    lpf = fir.resampler_lpf(spec.q, spec.p, 651)
    out = fir.polyphase_resample(sym, spec.q, spec.p, lpf)
    return out[..., : spec.block_in]


@functools.partial(jax.jit, static_argnums=(0, 1))
def downlink_block_encoded(cfg: eng.TrxConfig, spec: UplinkSpec,
                           state: eng.TrxState, frames184: Array,
                           valid: Array, atten_db: Array,
                           fn0: Array) -> Array:
    """FEC-in-program downlink: 184-bit L2 frames → FireCode parity +
    rate-1/2 conv + diagonal interleave + burst mapping
    (XCCHL1Encoder::sendFrame, GSML1FEC.cpp:768-849) → GMSK modulate →
    96/65 resample, one fused program for every (chan, slot).

    frames184: [G, C, 8, 184] air-order frames for the G = frames//4
    FN%4-aligned groups starting at fn0 (fn0 must be block-aligned);
    valid/atten_db: [G, C, 8]. Returns [C, spec.block_in] device-rate
    samples; invalid (group, chan, slot) entries transmit the filler
    table like downlink_block."""
    from openbts_ttsou_tpu.gsm import l1fec

    g, c = frames184.shape[0], cfg.n_chan
    assert g * 4 <= spec.frames
    bursts = l1fec.xcch_encode(frames184, tsc=None)  # [G, C, 8, 4, 148]
    # TSC per carrier comes from the engine state at modulation time:
    # map_to_burst left the midamble zeroed when tsc=None, so write it
    # from state.tsc (the SETTSC plane) for every burst
    from openbts_ttsou_tpu.utils import constants as C

    tsc_bank = jnp.asarray(np.asarray(C.TRAINING_SEQUENCE, np.uint8))
    mid = tsc_bank[state.tsc]  # [C, 26]
    bursts = bursts.at[..., 61:87].set(
        mid[None, :, None, None, :].astype(bursts.dtype))
    # [G, C, 8, 4, 148] → [G·4 frames, C, 8, 148]
    bits = jnp.moveaxis(bursts, 3, 1).reshape(g * 4, c, 8, 148)
    pad = spec.frames - g * 4
    bits = jnp.pad(bits, ((0, pad), (0, 0), (0, 0), (0, 0)))
    v = jnp.repeat(valid, 4, axis=0)
    v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
    a = jnp.repeat(atten_db, 4, axis=0)
    a = jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
    return downlink_block(cfg, spec, state, bits.astype(jnp.uint8), v, a,
                          fn0)


@functools.partial(jax.jit, static_argnums=(0, 1))
def downlink_block_tch(cfg: eng.TrxConfig, spec: UplinkSpec,
                       state: eng.TrxState, frames184: Array,
                       xcch_valid: Array, speech: Array, sp_valid: Array,
                       facch: Array, fa_valid: Array, tch_mask: Array,
                       atten_db: Array, carry, fn0: Array
                       ) -> tuple[Array, tuple]:
    """Full FEC-in-program downlink with TCH/FS + FACCH: the fused
    device program now carries speech, mirroring the uplink direction's
    on-device TCH decoder (decode_block).

    XCCH leg: frames184 [G, C, 8, 184] air-order L2 frames on the
    G = frames//4 FN%4-aligned groups (XCCHL1Encoder::sendFrame,
    GSML1FEC.cpp:768-849), masked by xcch_valid [G, C, 8].
    TCH leg: speech [Gt, C, 8, 260] coder-order vocoder frames
    (sp_valid [Gt, C, 8]) and facch [Gt, C, 8, 184] (fa_valid) feed
    the windowed diagonal interleaver (tch_tx_window; 260-bit class
    1a/1b/2 partition + 3-bit CRC + 378/78 split + 8-burst diagonal +
    stealing flags — TCHFACCHL1Encoder, GSML1FEC.cpp:1106-1120,
    1280-1393), with `carry` from `l1fec.TchTxCarry.zeros(C*8)`
    threading the cross-window diagonal halves. tch_mask [C, 8] bool
    selects which slots are TCH/F; all others take the XCCH leg.
    atten_db [frames, C, 8]. Returns ([C, spec.block_in] device-rate
    samples, carry'); slots with no content transmit the filler table.
    """
    from openbts_ttsou_tpu.gsm import l1fec
    from openbts_ttsou_tpu.utils import constants as C

    f, c = spec.frames, cfg.n_chan
    g = frames184.shape[0]
    gt = speech.shape[0]

    # ---- XCCH leg (downlink_block_encoded's body) ---------------------
    bursts = l1fec.xcch_encode(frames184, tsc=None)  # [G, C, 8, 4, 148]
    xb = jnp.moveaxis(bursts, 3, 1).reshape(g * 4, c, 8, 148)
    pad = f - g * 4
    xb = jnp.pad(xb, ((0, pad), (0, 0), (0, 0), (0, 0)))
    xv = jnp.pad(jnp.repeat(xcch_valid, 4, axis=0),
                 ((0, pad), (0, 0), (0, 0)))

    # ---- TCH/FS + FACCH leg -------------------------------------------
    n = c * 8
    tb, t_isburst, _hu, carry2 = l1fec.tch_tx_window(
        speech.reshape(gt, n, 260), sp_valid.reshape(gt, n),
        facch.reshape(gt, n, 184), fa_valid.reshape(gt, n),
        carry, fn0, f)
    tb = tb.reshape(f, c, 8, 148)
    t_isburst = t_isburst.reshape(f, c, 8)
    # a TCH slot transmits every burst frame of the window (speech,
    # FACCH or coded silence) — only SACCH/idle frames fall through
    tv = t_isburst & tch_mask[None]

    bits = jnp.where(tch_mask[None, :, :, None], tb, xb)
    valid = jnp.where(tch_mask[None], tv, xv)
    # TSC per carrier from the SETTSC plane (both encoders left the
    # midamble zeroed)
    tsc_bank = jnp.asarray(np.asarray(C.TRAINING_SEQUENCE, np.uint8))
    mid = tsc_bank[state.tsc]  # [C, 26]
    bits = bits.at[..., 61:87].set(
        mid[None, :, None, :].astype(bits.dtype))
    out = downlink_block(cfg, spec, state, bits.astype(jnp.uint8),
                         valid, atten_db, fn0)
    return out, carry2


# Streaming-duplex halo geometry. The 961-tap 65/96 rx resampler reads
# ±⌈960/130⌉ = 8 device samples around each symbol — rounded to one
# 96-sample polyphase period per side; the 651-tap 96/65 tx resampler
# reads ±⌈650/192⌉ = 4 symbols — rounded to one 65-symbol period,
# carried as a 2×65-symbol left history (the reference's
# sendHistory/rcvHistory INHISTORY=130/OUTHISTORY=192 buffers,
# Transceiver/radioInterface.h:35-41, radioInterface.cpp:123-260).
RX_HALO_DEV = 96
TX_TAIL_SYM = 130
TX_DELAY_DEV = (TX_TAIL_SYM // 2) * 96 // 65  # 96 device samples


class WireBlock(NamedTuple):
    """One block's uplink results pre-quantized for the UDP data plane
    (driveReceiveFIFO serialization, Transceiver52M/Transceiver.cpp:
    652-667): soft bits already scaled ×255 to the wire's byte format."""

    detected: Array  # [F, C, 8] bool
    soft_u8: Array  # [F, C, 8, 148] uint8
    rssi: Array  # [F, C, 8] int32
    timing: Array  # [F, C, 8] int32 (1/256 symbol)


@functools.partial(jax.jit, static_argnums=(0, 1, 9, 10))
def duplex_block_wire(cfg: eng.TrxConfig, spec: UplinkSpec,
                      state: eng.TrxState, ul_halo: Array, tx_tail: Array,
                      dl_bits: Array, dl_valid: Array, dl_atten: Array,
                      tx_fn0: Array, io_i16: bool = False,
                      exact: bool = True
                      ) -> tuple[eng.TrxState, Array, Array, WireBlock]:
    """One fused streaming-duplex block: modulate + 96/65-resample the
    downlink window AND detect/demodulate the uplink window, with exact
    stream continuity across blocks.

    ul_halo:  [C, RX_HALO_DEV + block_in + RX_HALO_DEV] device-rate rx
              samples (one polyphase period of past and future stream);
    tx_tail:  [C, TX_TAIL_SYM] — the previous block's final modulated
              symbols (zeros on the first block);
    dl_bits/dl_valid/dl_atten: [frames, C, 8, ...] downlink window.

    Returns (state', tx_dev [C, block_in], tx_tail', WireBlock). The tx
    samples cover device timestamps shifted TX_DELAY_DEV early (the
    causal filter delay the reference absorbs in its history buffers) —
    the daemon writes them at ts − TX_DELAY_DEV so the air timeline is
    exact.

    io_i16 (static): move radio samples across the host boundary as
    int16 I/Q pairs [C, T, 2] — the USRP's native sample format — with
    the float conversion done on device (the reference burns host CPU
    on exactly this in USRPifyVector/unUSRPifyVector,
    Transceiver52M/radioInterface.cpp:101-146; on TPU it is a free
    fused op and halves the PCIe bytes).

    exact (static): walk the uplink window frame by frame with
    `rx_step` — the reference's exact pullRadioVector semantics
    (per-frame threshold walk, 50-frame channel aging) — instead of
    the once-per-block `process_block_fast` refresh (drift envelope:
    tests/test_fast_drift). Exact is the DEFAULT everywhere: on the
    TPU v5e it beats the block refresh both standalone (the per-frame
    working set tiles on-chip where the 13-frame batch streams its
    13×-larger intermediates through HBM) and inside this duplex
    fusion (1032 vs 854 Msps at 512 carriers, BENCH_r04_sweep.json).
    Round 3's opposite duplex ranking was an artifact of the tx
    frame-scan: with `tx_frames` batching the whole downlink window
    into one modulation, the serialization that made exact lose is
    gone. exact=False remains the opt-in throughput mode.
    """
    from openbts_ttsou_tpu.parallel.halo import resample_block

    if io_i16:
        ul_halo = (ul_halo[..., 0].astype(jnp.float32)
                   + 1j * ul_halo[..., 1].astype(jnp.float32)
                   ).astype(jnp.complex64)
    frames = spec.frames

    # ---- downlink (driveTransmitFIFO → pushBuffer) --------------------
    # one batched modulation for the whole window: the reference's
    # per-frame walk has no sequential dependency (tx_frames), and the
    # F-step scan here was half of the 26-small-kernel serialization
    # that made exact mode lose inside this fusion (round-3 verdict)
    slots = eng.tx_frames(cfg, state, dl_bits, dl_valid, dl_atten)
    sym = _assemble_stream(slots)  # [C, frames·1250]
    stream = jnp.concatenate([tx_tail.astype(sym.dtype), sym], axis=-1)
    lpf_tx = fir.resampler_lpf(spec.q, spec.p, 651)
    y = fir.polyphase_resample(stream, spec.q, spec.p, lpf_tx)
    tx = lax.slice_in_dim(y, TX_DELAY_DEV, TX_DELAY_DEV + spec.block_in,
                          axis=-1)
    if io_i16:  # DAC format, clipped like USRPifyVector
        tx = jnp.stack([jnp.real(tx), jnp.imag(tx)], axis=-1)
        tx = jnp.clip(jnp.round(tx), -32767.0, 32767.0).astype(jnp.int16)
    new_tail = sym[..., -TX_TAIL_SYM:]

    # ---- uplink (pullBuffer → detection/demod) ------------------------
    lpf_rx = fir.resampler_lpf(spec.p, spec.q, spec.taps)
    sym_ul = resample_block(ul_halo, spec.p, spec.q, lpf_rx, RX_HALO_DEV,
                            spec.block_in)
    if exact:
        from openbts_ttsou_tpu.parallel.sharded import _slot_windows

        wins = _slot_windows(sym_ul[..., : spec.block_symbols], frames)
        state2, res = lax.scan(
            lambda st, fr: eng.rx_step(cfg, st, fr), state, wins)
    else:
        state2, res = process_block_fast(cfg, frames, state,
                                         sym_ul[..., : spec.block_symbols])
    soft_u8 = jnp.clip(jnp.round(res.soft_bits * 255.0), 0.0, 255.0
                       ).astype(jnp.uint8)
    wire = WireBlock(res.detected, soft_u8, res.rssi, res.timing)
    return state2, tx, new_tail, wire


# ---------------------------------------------------------------------------
# single-buffer block I/O: the whole duplex block crosses the host
# boundary as ONE uint8 array each way (one DMA per direction per
# block). The uplink datagrams are built ON DEVICE in the reference's
# wire format, so the host's only work is a boolean row-select + send.
# ---------------------------------------------------------------------------

DL_ROW = 150  # per-(frame, chan, slot): 148 bit-bytes + valid + gain
UL_PKT = 158  # uplink datagram (protocol.UPLINK_LEN)
PACK_HDR = 8  # fn0 (4 bytes BE) + tx_fn0 (4 bytes BE)


def pack_dl_buffer(bits: Array, valid: Array, gain: Array, fn0: int,
                   tx_fn0: int,
                   ul_i16: np.ndarray | None = None) -> np.ndarray:
    """Host side: dense downlink window (+ optionally the uplink int16
    samples) → ONE uint8 buffer — a single host→device DMA per block.

    bits [F, C, 8, 148] uint8, valid [F, C, 8] bool, gain [F, C, 8]
    float (the wire's attenuation byte, driveTransmitPriorityQueue);
    ul_i16 int16 [C, T, 2] ADC samples appended as raw bytes."""
    f, c = bits.shape[0], bits.shape[1]
    body = np.empty((f, c, 8, DL_ROW), np.uint8)
    body[..., :148] = bits
    body[..., 148] = valid
    body[..., 149] = np.asarray(gain, np.int64) & 0xFF
    hdr = np.frombuffer(np.array([fn0, tx_fn0], ">u4").tobytes(), np.uint8)
    parts = [hdr, body.reshape(-1)]
    if ul_i16 is not None:
        parts.append(np.ascontiguousarray(ul_i16, "<i2")
                     .view(np.uint8).reshape(-1))
    return np.concatenate(parts)


def _be32(x: Array) -> Array:
    """int32 [...] → big-endian bytes [..., 4] uint8."""
    sh = [(x >> s) & 0xFF for s in (24, 16, 8, 0)]
    return jnp.stack(sh, axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def duplex_block_packed(cfg: eng.TrxConfig, spec: UplinkSpec,
                        state: eng.TrxState, io_buf: Array,
                        tx_tail: Array, exact: bool = True
                        ) -> tuple[eng.TrxState, Array, Array]:
    """`duplex_block_wire` with single-buffer I/O both ways: io_buf is
    the 1-D uint8 buffer from `pack_dl_buffer(..., ul_i16=...)` —
    header + downlink window + uplink int16 ADC bytes, ONE
    host→device DMA. Returns (state', tx_tail', out) with `out` a 1-D
    uint8 buffer laid out as
      [C·block_in·4]            tx int16 I/Q bytes (DAC format)
      [F·C·8·UL_PKT]            ready-to-send uplink datagrams
      [F·C·8]                   detection mask bytes
    — one device→host DMA, parsed with `unpack_block_result`."""
    f, c = spec.frames, cfg.n_chan
    hdr = io_buf[:PACK_HDR].astype(jnp.int32)
    fn0 = (hdr[0] << 24) | (hdr[1] << 16) | (hdr[2] << 8) | hdr[3]
    tx_fn0 = (hdr[4] << 24) | (hdr[5] << 16) | (hdr[6] << 8) | hdr[7]
    dl_end = PACK_HDR + f * c * 8 * DL_ROW
    body = io_buf[PACK_HDR:dl_end].reshape(f, c, 8, DL_ROW)
    bits = body[..., :148]
    valid = body[..., 148] > 0
    atten = body[..., 149].astype(jnp.float32)
    t_halo = spec.block_in + 2 * RX_HALO_DEV
    ul_i16 = jax.lax.bitcast_convert_type(
        io_buf[dl_end: dl_end + c * t_halo * 4].reshape(c, t_halo, 2, 2),
        jnp.int16)
    state = state._replace(fn=fn0)
    state2, tx, tail2, wire = duplex_block_wire(
        cfg, spec, state, ul_i16, tx_tail, bits, valid, atten, tx_fn0,
        True, exact)

    # device-side datagram assembly (the bytes of protocol.pack_uplink;
    # driveReceiveFIFO serialization, Transceiver52M/Transceiver.cpp:
    # 652-667)
    fns = (fn0 + jnp.arange(f, dtype=jnp.int32)) % HYPERFRAME
    fnb = jnp.broadcast_to(_be32(fns)[:, None, None, :], (f, c, 8, 4))
    tnb = jnp.broadcast_to(
        jnp.arange(8, dtype=jnp.uint8)[None, None, :, None], (f, c, 8, 1))
    rssib = (wire.rssi & 0xFF).astype(jnp.uint8)[..., None]
    toa_u = (wire.timing & 0xFFFF).astype(jnp.int32)
    toab = jnp.stack([(toa_u >> 8) & 0xFF, toa_u & 0xFF],
                     axis=-1).astype(jnp.uint8)
    nul = jnp.zeros((f, c, 8, 2), jnp.uint8)
    pkts = jnp.concatenate([tnb, fnb, rssib, toab, wire.soft_u8, nul],
                           axis=-1)  # [F, C, 8, 158]

    tx_bytes = jax.lax.bitcast_convert_type(tx, jnp.uint8)  # [C,T,2,2]
    out = jnp.concatenate([
        tx_bytes.reshape(-1), pkts.reshape(-1),
        wire.detected.astype(jnp.uint8).reshape(-1)])
    return state2, tail2, out


UL_PKT_C = UL_PKT + 2  # packed uplink row: datagram + carrier index


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def duplex_block_compact(cfg: eng.TrxConfig, spec: UplinkSpec,
                         state: eng.TrxState, io_buf: Array,
                         tx_tail: Array, exact: bool = True
                         ) -> tuple[eng.TrxState, Array, Array, Array,
                                    Array]:
    """`duplex_block_packed` with device-side result compaction: the
    uplink datagram stream and the DAC stream cross the host boundary
    only where they carry information.

    io_buf is `pack_dl_buffer(...)` + a trailing [C] live-carrier mask
    (see `pack_dl_buffer_live`). Returns (state', tx_tail', hdr, tx_buf,
    pkt_buf):

      hdr     [8]              uint8: n_det (BE32), n_live (BE32)
      tx_buf  [C+1, block_in·4] int16-byte DAC rows, LIVE carriers
                               prefix-packed (row C is the drop slot);
      pkt_buf [F·C·8+1, 160]   ready-to-send uplink datagrams + 2-byte
                               carrier index, DETECTED rows
                               prefix-packed.

    The host fetches hdr (8 bytes), then only the first n_live tx rows
    and n_det datagram rows — D2H scales with detection density and
    non-filler tx load instead of the full F·C·8 datagram matrix + all
    C DAC rows (the round-3 wire-path bottleneck: the dense result
    buffer at 128 carriers is ~14 MB per 60 ms block on a ~25 MB/s dev
    relay). A carrier whose window AND previous window are all filler
    transmits the cached filler block host-side (the filler table is
    one constant pattern, Transceiver.cpp:69-85, so its resampled
    stream is block-periodic once the overlap tail is also filler).
    Match: driveReceiveFIFO only serializes DETECTED bursts
    (Transceiver.cpp:652-667) — the dense path shipped every slot."""
    f, c = spec.frames, cfg.n_chan
    body_end = PACK_HDR + f * c * 8 * DL_ROW
    t_halo = spec.block_in + 2 * RX_HALO_DEV
    ul_end = body_end + c * t_halo * 4
    live = io_buf[ul_end: ul_end + c] > 0  # [C]

    state2, tail2, out = duplex_block_packed(cfg, spec, state, io_buf,
                                             tx_tail, exact)
    a = c * spec.block_in * 4
    b = a + f * c * 8 * UL_PKT
    tx_rows = out[:a].reshape(c, spec.block_in * 4)
    pkt_rows = out[a:b].reshape(f * c * 8, UL_PKT)
    det = out[b:] > 0  # [F·C·8]

    # carrier index per flattened (f, c, tn) row, as 2 BE bytes
    chan_idx = jnp.tile(jnp.repeat(jnp.arange(c, dtype=jnp.int32), 8), f)
    chan_b = jnp.stack([(chan_idx >> 8) & 0xFF, chan_idx & 0xFF],
                       axis=-1).astype(jnp.uint8)
    rows160 = jnp.concatenate([pkt_rows, chan_b], axis=-1)

    n_rows = f * c * 8
    pos = jnp.where(det, jnp.cumsum(det) - 1, n_rows)
    pkt_buf = jnp.zeros((n_rows + 1, UL_PKT_C), jnp.uint8)
    pkt_buf = pkt_buf.at[pos].set(rows160, mode="drop")

    lpos = jnp.where(live, jnp.cumsum(live) - 1, c)
    tx_buf = jnp.zeros((c + 1, spec.block_in * 4), jnp.uint8)
    tx_buf = tx_buf.at[lpos].set(tx_rows, mode="drop")

    hdr = jnp.concatenate([_be32(det.sum().astype(jnp.int32)),
                           _be32(live.sum().astype(jnp.int32))])
    return state2, tail2, hdr, tx_buf, pkt_buf


def pack_dl_buffer_live(bits: Array, valid: Array, gain: Array, fn0: int,
                        tx_fn0: int, ul_i16: np.ndarray,
                        live: np.ndarray) -> np.ndarray:
    """`pack_dl_buffer` + the [C] live-carrier mask consumed by
    `duplex_block_compact` (host-computed: a carrier is live unless its
    current AND previous downlink windows were pure filler)."""
    base = pack_dl_buffer(bits, valid, gain, fn0, tx_fn0, ul_i16=ul_i16)
    return np.concatenate([base,
                           np.asarray(live, np.uint8).reshape(-1)])


def unpack_block_result(out: np.ndarray, n_chan: int, spec: UplinkSpec
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host side: one fetched uint8 buffer → (tx int16 [C, block_in, 2],
    datagrams [F, C, 8, UL_PKT], detected [F, C, 8] bool)."""
    f, c, t = spec.frames, n_chan, spec.block_in
    a = c * t * 4
    b = a + f * c * 8 * UL_PKT
    tx = out[:a].view("<i2").reshape(c, t, 2)
    pkts = out[a:b].reshape(f, c, 8, UL_PKT)
    det = out[b:].reshape(f, c, 8).astype(bool)
    return tx, pkts, det


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
