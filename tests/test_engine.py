import numpy as np
import pytest

import jax.numpy as jnp

from openbts_ttsou_tpu.trx import (
    ChanType,
    CorrType,
    TrxConfig,
    expected_corr_type,
    init_state,
    rx_step,
    tx_step,
)
from openbts_ttsou_tpu.trx.engine import SLOT_SAMPLES
from openbts_ttsou_tpu.ops import gmsk
from openbts_ttsou_tpu.utils import constants as C

RNG = np.random.default_rng(23)


def normal_burst_bits(tsc=0, seed=1):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [
            [0, 0, 0],
            rng.integers(0, 2, 57),
            [1],
            C.TRAINING_SEQUENCE[tsc],
            [1],
            rng.integers(0, 2, 57),
            [0, 0, 0],
        ]
    ).astype(np.uint8)


def rach_burst_bits():
    return np.concatenate(
        [[0, 1, 0, 1, 0, 1, 0, 1], C.RACH_SYNCH_SEQUENCE, np.zeros(99, int)]
    ).astype(np.uint8)


def test_expected_corr_type_matches_reference_table():
    ct = jnp.asarray(
        [
            [
                ChanType.NONE,
                ChanType.I,
                ChanType.II,
                ChanType.IV,
                ChanType.V,
                ChanType.VII,
                ChanType.LOOPBACK,
                ChanType.III,
            ]
        ],
        jnp.int32,
    )
    # fn=20: mod51=20 → V in RACH window (14..36)
    out = np.asarray(expected_corr_type(ct, jnp.asarray(20)))[0]
    assert out[0] == CorrType.OFF
    assert out[1] == CorrType.TSC
    assert out[2] == CorrType.TSC  # fn even → TSC
    assert out[3] == CorrType.RACH
    assert out[4] == CorrType.RACH  # mod51=20 in 14..36
    assert out[5] == CorrType.TSC
    assert out[6] == CorrType.TSC
    assert out[7] == CorrType.TSC
    # fn=13: mod51=13 → VII idle (12..14), V TSC
    out = np.asarray(expected_corr_type(ct, jnp.asarray(13)))[0]
    assert out[5] == CorrType.IDLE
    assert out[4] == CorrType.TSC
    assert out[2] == CorrType.IDLE  # fn odd


def _mk_frame(cfg, bursts_by_slot):
    frame = (
        RNG.standard_normal((cfg.n_chan, 8, SLOT_SAMPLES))
        + 1j * RNG.standard_normal((cfg.n_chan, 8, SLOT_SAMPLES))
    ).astype(np.complex64) * 1.0
    for (c, tn), wave in bursts_by_slot.items():
        frame[c, tn, : len(wave)] += wave
    return jnp.asarray(frame)


def test_rx_step_detects_tsc_and_rach():
    cfg = TrxConfig(n_chan=2)
    state = init_state(cfg)
    # chan 0: slot 1 = TCH (type I, TSC); chan 1: slot 0 = RACH (type IV)
    chan_type = np.zeros((2, 8), np.int32)
    chan_type[0, 1] = ChanType.I
    chan_type[1, 0] = ChanType.IV
    state = state._replace(chan_type=jnp.asarray(chan_type))

    bits = normal_burst_bits(tsc=0)
    nb = 9000.0 * np.asarray(gmsk.modulate_burst(bits[None], 1, guard_len=9))[0]
    rb = 9000.0 * np.asarray(
        gmsk.modulate_burst(rach_burst_bits()[None], 1, guard_len=9)
    )[0]
    frame = _mk_frame(cfg, {(0, 1): nb, (1, 0): rb})

    state2, res = rx_step(cfg, state, frame)
    det = np.asarray(res.detected)
    assert det[0, 1] and det[1, 0]
    assert not det[0, 0] and not det[1, 1]
    assert bool(np.asarray(res.is_rach)[1, 0])
    assert not bool(np.asarray(res.is_rach)[0, 1])
    # demodulated soft bits recover the transmitted normal burst
    soft = np.asarray(res.soft_bits)[0, 1]
    ber = np.mean((soft > 0.5).astype(int) != bits)
    assert ber < 0.01, f"engine demod BER {ber}"
    # RSSI ≈ 20log10(9450/9000) ≈ 0.4 dB → floor → 0
    assert np.asarray(res.rssi)[0, 1] in (0, 1)
    assert abs(int(np.asarray(res.timing)[0, 1])) < 128  # < half symbol
    # detection lowers the energy threshold (250 → 248: two hits)
    thr = np.asarray(state2.energy_threshold)
    assert thr[0] == pytest.approx(249.0)
    assert thr[1] == pytest.approx(249.0)
    # frame number advanced
    assert int(state2.fn) == 1


def test_rx_step_false_alarm_raises_threshold():
    cfg = TrxConfig(n_chan=1)
    state = init_state(cfg)
    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 3] = ChanType.I
    state = state._replace(chan_type=jnp.asarray(chan_type))
    # energy but no valid burst: strong noise in the active slot
    frame = np.zeros((1, 8, SLOT_SAMPLES), np.complex64)
    frame[0, 3] = (
        RNG.standard_normal(SLOT_SAMPLES) + 1j * RNG.standard_normal(SLOT_SAMPLES)
    ).astype(np.complex64) * 5000.0
    _, res = rx_step(cfg, state, jnp.asarray(frame))
    state2, _ = rx_step(cfg, state, jnp.asarray(frame))
    if not bool(np.asarray(res.detected)[0, 3]):
        # false alarm path: threshold bumped by 10·exp(0) = +10
        assert float(np.asarray(state2.energy_threshold)[0]) > 250.0


def test_rx_step_quiet_lowers_threshold_after_50_frames():
    cfg = TrxConfig(n_chan=1)
    state = init_state(cfg)
    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 0] = ChanType.I
    state = state._replace(
        chan_type=jnp.asarray(chan_type),
        fn=jnp.asarray(100, jnp.int32),
    )
    frame = jnp.zeros((1, 8, SLOT_SAMPLES), jnp.complex64)
    state2, _ = rx_step(cfg, state, frame)
    assert float(np.asarray(state2.energy_threshold)[0]) == pytest.approx(240.0)
    assert int(np.asarray(state2.prev_false_detect_fn)[0]) == 100


def test_threshold_storm_climbs_then_recovers():
    """Adaptive-threshold convergence over a false-alarm storm
    (Transceiver.cpp:294-303, 350-356, 366-375): sustained noise just
    above the energy gate raises the threshold by 10·e^(−Δframes) per
    miss until the gate closes (no more false alarms); ≥50 quiet frames
    later the threshold steps back down by 10 per quiet slot."""
    cfg = TrxConfig(n_chan=1)
    state = init_state(cfg)
    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 3] = ChanType.I
    state = state._replace(chan_type=jnp.asarray(chan_type))

    # the energy gate statistic is the mean power of the first 20
    # samples (energyDetect window); normalize the noise so that
    # statistic is 283² — above the initial 250 threshold but low
    # enough that the climb self-extinguishes within the storm
    rng = np.random.default_rng(77)
    slot = (rng.standard_normal(SLOT_SAMPLES)
            + 1j * rng.standard_normal(SLOT_SAMPLES)).astype(np.complex64)
    gate_rms = np.sqrt(np.mean(np.abs(slot[:20]) ** 2))
    slot *= 283.0 / gate_rms
    frame = np.zeros((1, 8, SLOT_SAMPLES), np.complex64)
    frame[0, 3] = slot
    frame = jnp.asarray(frame)

    thr_hist = [250.0]
    for _ in range(40):
        state, _ = rx_step(cfg, state, frame)
        thr_hist.append(float(np.asarray(state.energy_threshold)[0]))
    # the threshold climbed past the gate statistic and then froze (the
    # energy gate now rejects the storm — recovery part 1)
    assert thr_hist[-1] > 283.0
    assert thr_hist[-1] == pytest.approx(thr_hist[-2])

    # silence: jump >50 frames between steps so each quiet slot fires
    # the −10 step (recovery part 2); the threshold walks back down
    quiet = jnp.zeros((1, 8, SLOT_SAMPLES), jnp.complex64)
    for _ in range(8):
        state = state._replace(fn=jnp.asarray(int(state.fn) + 60,
                                              jnp.int32))
        state, _ = rx_step(cfg, state, quiet)
    assert float(np.asarray(state.energy_threshold)[0]) <= 250.0


def test_tx_step_modulates_and_fills():
    cfg = TrxConfig(n_chan=1)
    state = init_state(cfg)
    bits = np.tile(normal_burst_bits()[None, None], (1, 8, 1))
    valid = np.zeros((1, 8), bool)
    valid[0, 2] = True
    out = np.asarray(
        tx_step(
            cfg,
            state,
            jnp.asarray(bits),
            jnp.asarray(valid),
            jnp.zeros((1, 8), jnp.float32),
            jnp.asarray(0),
        )
    )
    assert out.shape == (1, 8, SLOT_SAMPLES)
    # valid slot: modulated at full scale
    assert np.abs(out[0, 2]).max() > 10000.0
    # invalid slots: the dummy filler burst
    filler = np.asarray(state.filler)[0, 0]
    np.testing.assert_allclose(out[0, 0], filler, rtol=1e-5)
    # slot 1 (156-sample slot): trailing sample zeroed
    assert out[0, 1, 156] == 0.0


def test_tx_rx_loopback_recovers_bits():
    cfg = TrxConfig(n_chan=1)
    state = init_state(cfg)
    chan_type = np.full((1, 8), ChanType.I, np.int32)
    state = state._replace(chan_type=jnp.asarray(chan_type))

    bits = np.stack([normal_burst_bits(seed=s) for s in range(8)])[None]
    tx = tx_step(
        cfg,
        state,
        jnp.asarray(bits),
        jnp.ones((1, 8), bool),
        jnp.zeros((1, 8), jnp.float32),
        jnp.asarray(0),
    )
    state2, res = rx_step(cfg, state, tx)
    assert np.asarray(res.detected).all()
    soft = np.asarray(res.soft_bits)[0]
    ber = np.mean((soft > 0.5).astype(int) != bits[0])
    assert ber < 0.01, f"loopback BER {ber}"


def test_state_checkpoint_resume(tmp_path):
    """Checkpoint = the TrxState pytree; resuming reproduces the exact
    stream behavior (SURVEY §5: filter constants + stream cursor +
    per-slot channel state)."""
    from openbts_ttsou_tpu.trx.state_io import load_state, save_state

    cfg = TrxConfig(n_chan=1)
    state = init_state(cfg)._replace(
        chan_type=jnp.full((1, 8), ChanType.I, jnp.int32))
    bits = np.stack([normal_burst_bits(seed=s) for s in range(8)])[None]
    tx = tx_step(cfg, state, jnp.asarray(bits), jnp.ones((1, 8), bool),
                 jnp.zeros((1, 8), jnp.float32), jnp.asarray(0))
    state1, res1 = rx_step(cfg, state, tx)

    path = str(tmp_path / "trx_state.npz")
    save_state(path, cfg, state1)
    cfg2, state2 = load_state(path)
    assert cfg2 == cfg
    for name in state1._fields:
        np.testing.assert_array_equal(np.asarray(getattr(state1, name)),
                                      np.asarray(getattr(state2, name)))
    # continuing from the restored state gives identical results
    _, res_a = rx_step(cfg, state1, tx)
    _, res_b = rx_step(cfg2, state2, tx)
    np.testing.assert_array_equal(np.asarray(res_a.soft_bits),
                                  np.asarray(res_b.soft_bits))
    np.testing.assert_array_equal(np.asarray(res_a.detected),
                                  np.asarray(res_b.detected))


def test_rach_max_delay_gate():
    """SETMAXDELAY bounds the RACH acceptance window
    (detectRACHBurst maxTOA, Transceiver.cpp pullRadioVector)."""
    cfg = TrxConfig(n_chan=1)
    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 0] = ChanType.IV
    rb = 9000.0 * np.asarray(
        gmsk.modulate_burst(rach_burst_bits()[None], 1, guard_len=9))[0]
    # delay the burst by 6 symbols inside the slot window
    delayed = np.zeros(157, np.complex64)
    delayed[6:] = rb[:151]  # tail guard clipped by the slot window

    def run(max_delay):
        st = init_state(cfg)._replace(
            chan_type=jnp.asarray(chan_type),
            max_expected_delay=jnp.asarray(np.full(1, max_delay,
                                                   np.int32)))
        frame = _mk_frame(cfg, {(0, 0): delayed})
        _, res = rx_step(cfg, st, frame)
        return bool(np.asarray(res.detected)[0, 0])

    assert run(0)  # unbounded accepts
    assert run(10)  # window covers the 6-symbol delay
    assert not run(2)  # too-late burst rejected


def test_rx_step_detects_at_sps4():
    """One engine frame at sps=4 (sigProcLibTest geometry): the
    sps-parameterized slot windows, correlators and demodulator detect
    and demodulate a 4-samples-per-symbol burst."""
    sps = 4
    cfg = TrxConfig(n_chan=1, sps=sps)
    state = init_state(cfg)._replace(
        chan_type=jnp.full((1, 8), ChanType.I, jnp.int32))
    bits = normal_burst_bits(tsc=0, seed=9)
    wave = 9000.0 * np.asarray(gmsk.modulate_burst(bits[None], sps))[0]
    frame = np.zeros((1, 8, SLOT_SAMPLES * sps), np.complex64)
    frame[0, 3, : len(wave)] = wave
    st, res = rx_step(cfg, state, jnp.asarray(frame))
    det = np.asarray(res.detected)
    assert det[0, 3] and det.sum() == 1
    soft = np.asarray(res.soft_bits)[0, 3]
    assert np.array_equal((soft[:148] > 0.5).astype(int), bits)
    # TOA is reported in 1/256-symbol units and should be ~0
    assert abs(int(np.asarray(res.timing)[0, 3])) < 256


def test_rach_slots_restriction_matches_dense():
    """rx_step with the static cfg.rach_slots restriction produces the
    same detections/soft bits/state as the dense all-slots engine when
    RACH traffic only arrives on the restricted slots (the config
    contract: rach_slots = the combination-IV/V/VI slots)."""
    chan_type = np.zeros((2, 8), np.int32)
    chan_type[:, 1:] = ChanType.I
    chan_type[:, 0] = ChanType.IV
    bits = normal_burst_bits(tsc=0, seed=5)
    nb = 9000.0 * np.asarray(gmsk.modulate_burst(bits[None], 1,
                                                 guard_len=9))[0]
    rb = 9000.0 * np.asarray(
        gmsk.modulate_burst(rach_burst_bits()[None], 1, guard_len=9))[0]

    outs = []
    for rach_slots in (None, (0,)):
        cfg = TrxConfig(n_chan=2, rach_slots=rach_slots)
        state = init_state(cfg)._replace(chan_type=jnp.asarray(chan_type))
        global RNG
        RNG = np.random.default_rng(77)  # same noise for both runs
        frame = _mk_frame(cfg, {(0, 0): rb, (1, 0): rb, (0, 3): nb,
                                (1, 5): nb})
        st, res = rx_step(cfg, state, frame)
        outs.append((np.asarray(res.detected), np.asarray(res.is_rach),
                     np.asarray(res.soft_bits),
                     np.asarray(st.energy_threshold)))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)
    det, is_rach = outs[0][0], outs[0][1]
    assert det[0, 0] and det[1, 0] and is_rach[0, 0] and is_rach[1, 0]
    assert det[0, 3] and det[1, 5]


def test_rach_slots_excluded_slot_never_detects():
    """A RACH burst on a slot outside cfg.rach_slots is not detected
    (the correlator does not run there), while the in-tuple slot still
    fires."""
    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 0] = ChanType.IV
    chan_type[0, 4] = ChanType.IV  # RACH-typed but outside rach_slots
    rb = 9000.0 * np.asarray(
        gmsk.modulate_burst(rach_burst_bits()[None], 1, guard_len=9))[0]
    cfg = TrxConfig(n_chan=1, rach_slots=(0,))
    state = init_state(cfg)._replace(chan_type=jnp.asarray(chan_type))
    frame = _mk_frame(cfg, {(0, 0): rb, (0, 4): rb})
    _, res = rx_step(cfg, state, frame)
    det = np.asarray(res.detected)
    assert det[0, 0] and not det[0, 4]


def test_estimation_gate_skips_and_matches():
    """The lax.cond-gated channel-estimation tail: with no channel at
    SETMAXDELAY > 1 the gate is closed and detection results are
    unchanged vs the open-gate engine; with SETMAXDELAY > 1 the DFE
    state fills exactly as before the gate existed."""
    from openbts_ttsou_tpu.trx.engine import CHAN_TAPS

    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 2] = ChanType.I
    bits = normal_burst_bits(tsc=0, seed=11)
    nb = 9000.0 * np.asarray(gmsk.modulate_burst(bits[None], 1,
                                                 guard_len=9))[0]
    cfg = TrxConfig(n_chan=1)

    def run(max_delay):
        st = init_state(cfg)._replace(
            chan_type=jnp.asarray(chan_type),
            max_expected_delay=jnp.asarray([max_delay], jnp.int32))
        global RNG
        RNG = np.random.default_rng(13)
        frame = _mk_frame(cfg, {(0, 2): nb})
        return rx_step(cfg, st, frame)

    st0, res0 = run(0)   # gate closed: no estimation consumer
    st4, res4 = run(4)   # gate open: DFE channel estimated
    np.testing.assert_array_equal(np.asarray(res0.detected),
                                  np.asarray(res4.detected))
    assert np.asarray(res0.detected)[0, 2]
    # closed gate: channel state untouched
    assert not np.asarray(st0.chan_valid).any()
    assert np.abs(np.asarray(st0.chan_response)).sum() == 0.0
    # open gate: estimate written for the detected slot
    assert bool(np.asarray(st4.chan_valid)[0, 2])
    assert np.abs(np.asarray(st4.chan_response)[0, 2]).sum() > 0.0
    assert np.asarray(st4.chan_response).shape[-1] == CHAN_TAPS


def test_rach_slots_excluded_slot_no_threshold_miss():
    """Energy on a RACH-typed slot OUTSIDE cfg.rach_slots must not be
    accounted as a miss: the reference never runs a correlator there
    (no decoder installed), so it registers no false alarm. Without the
    mask, repeated RACH energy on an excluded slot would bump the
    carrier's threshold +10 per frame and degrade every slot."""
    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 4] = ChanType.IV  # RACH-typed, excluded below
    rb = 9000.0 * np.asarray(
        gmsk.modulate_burst(rach_burst_bits()[None], 1, guard_len=9))[0]
    cfg = TrxConfig(n_chan=1, rach_slots=(0,))
    state = init_state(cfg)._replace(chan_type=jnp.asarray(chan_type))
    thr0 = float(np.asarray(state.energy_threshold)[0])
    for _ in range(3):
        frame = _mk_frame(cfg, {(0, 4): rb})
        state, res = rx_step(cfg, state, frame)
        assert not bool(np.asarray(res.detected)[0, 4])
    # threshold may fall (quiet decay) but must never be bumped +10
    assert float(np.asarray(state.energy_threshold)[0]) <= thr0

    # batched-exact block mode: same contract
    from openbts_ttsou_tpu.models.transceiver import process_block_exact

    state_b = init_state(cfg)._replace(chan_type=jnp.asarray(chan_type))
    sym = np.zeros((1, 13 * 1250), np.complex64)
    sym[0, 4 * 157: 4 * 157 + len(rb)] = rb  # slot 4 of frame 0
    state_b2, _ = process_block_exact(cfg, 13, state_b, jnp.asarray(sym))
    assert float(np.asarray(state_b2.energy_threshold)[0]) <= thr0
