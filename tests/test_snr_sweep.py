"""BASELINE config 2: RACH/TSC burst detection + timing-offset
estimation over noisy IQ at swept SNR.

The reference publishes no curves; the gates here are the qualitative
contract its thresholds imply: reliable detection and sub-symbol TOA at
operating SNRs, graceful degradation below, monotone behavior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openbts_ttsou_tpu.ops import correlate as xc
from openbts_ttsou_tpu.ops import gmsk, signal
from openbts_ttsou_tpu.utils import constants as C

SPS = 1
N_TRIALS = 240  # ≥200 trials/point: a 0.95-rate gate at n=240 has
#                 binomial σ ≈ 1.4% — tight enough to pin regressions
N_NOISE_TRIALS = 4096  # false-alarm rates need far more trials


def rach_wave():
    bits = np.concatenate([[0, 1, 0, 1, 0, 1, 0, 1], C.RACH_SYNCH_SEQUENCE,
                           np.zeros(99, int)]).astype(np.uint8)
    return gmsk.modulate_burst_np(bits[None], SPS, guard_len=9)[0]


def normal_wave(tsc=0, seed=0):
    rng = np.random.default_rng(seed)
    bits = np.concatenate(
        [[0, 0, 0], rng.integers(0, 2, 57), [1], C.TRAINING_SEQUENCE[tsc],
         [1], rng.integers(0, 2, 57), [0, 0, 0]]).astype(np.uint8)
    return gmsk.modulate_burst_np(bits[None], SPS, guard_len=9)[0]


def _noisy_batch(wave, snr_db, delay, n, seed):
    """n copies of `wave` delayed and immersed in complex AWGN at the
    given per-sample SNR."""
    sig_power = float(np.mean(np.abs(wave[:148]) ** 2))
    noise_var = sig_power / (10 ** (snr_db / 10.0))
    batch = np.tile(wave[None], (n, 1))
    delayed = np.asarray(gmsk.delay_vector(
        jnp.asarray(batch), jnp.full((n,), delay, jnp.float32)))
    noise = np.asarray(signal.gaussian_noise(
        jax.random.PRNGKey(seed), delayed.shape, noise_var))
    return delayed + noise


@pytest.mark.parametrize("snr_db,min_rate", [(12, 0.95), (6, 0.8)])
def test_rach_detection_rate_vs_snr(snr_db, min_rate):
    wave = rach_wave()
    batch = _noisy_batch(wave, snr_db, 3.25, N_TRIALS, seed=snr_db)
    det = xc.detect_rach(jnp.asarray(batch), SPS)
    rate = float(np.mean(np.asarray(det.detected)))
    assert rate >= min_rate, f"RACH rate {rate} at {snr_db} dB"
    # TOA accuracy on the detected subset: within 1/2 symbol
    mask = np.asarray(det.detected)
    err = np.abs(np.asarray(det.toa)[mask] - 3.25)
    assert np.median(err) < 0.5


def test_rach_detection_degrades_monotonically():
    wave = rach_wave()
    rates = []
    for snr_db in (12, 0, -10):
        batch = _noisy_batch(wave, snr_db, 0.0, N_TRIALS, seed=100 + snr_db)
        det = xc.detect_rach(jnp.asarray(batch), SPS)
        rates.append(float(np.mean(np.asarray(det.detected))))
    assert rates[0] >= rates[-1]
    assert rates[0] > 0.9
    assert rates[-1] < 0.6  # far below threshold the detector gives up


@pytest.mark.parametrize("snr_db,min_rate", [(12, 0.95), (6, 0.85)])
def test_tsc_detection_rate_vs_snr(snr_db, min_rate):
    wave = normal_wave()
    batch = _noisy_batch(wave, snr_db, 1.5, N_TRIALS, seed=200 + snr_db)
    det, _, _ = xc.analyze_traffic_burst(jnp.asarray(batch), 0, SPS)
    rate = float(np.mean(np.asarray(det.detected)))
    assert rate >= min_rate, f"TSC rate {rate} at {snr_db} dB"
    mask = np.asarray(det.detected)
    err = np.abs(np.asarray(det.toa)[mask] - 1.5)
    assert np.median(err) < 0.5


def test_toa_precision_at_high_snr():
    """Sub-symbol TOA: at 20 dB the median timing error must be well
    under 1/4 symbol (the reference reports TOA in 1/256 symbols)."""
    wave = normal_wave()
    for true_delay in (0.25, 2.75):
        batch = _noisy_batch(wave, 20.0, true_delay, N_TRIALS,
                             seed=int(true_delay * 100))
        det, _, _ = xc.analyze_traffic_burst(jnp.asarray(batch), 0, SPS)
        mask = np.asarray(det.detected)
        assert mask.mean() > 0.9
        err = np.abs(np.asarray(det.toa)[mask] - true_delay)
        assert np.median(err) < 0.25, f"TOA err {np.median(err)}"


def test_rach_false_alarm_rate_on_noise():
    """Noise-only Pfa of the RACH detector at the reference threshold
    5.0 (Transceiver52M/Transceiver.cpp:361). Measured 0.73% at n=4096
    (unit complex AWGN, 157-sample bursts); gate at 2% — ≈10σ above,
    so only a real detector change can trip it. (In the engine the
    adaptive energy gate sits in front of this correlator, so the
    system-level false-alarm rate on thermal noise is far lower.)"""
    noise = np.asarray(signal.gaussian_noise(
        jax.random.PRNGKey(42), (N_NOISE_TRIALS, 157), 1.0))
    det = xc.detect_rach(jnp.asarray(noise), SPS, threshold=5.0)
    pfa = float(np.mean(np.asarray(det.detected)))
    assert pfa < 0.02, f"RACH noise-only Pfa {pfa}"


def test_tsc_false_alarm_rate_on_noise():
    """Noise-only Pfa of the TSC correlator at the reference threshold
    3.0 (Transceiver52M/Transceiver.cpp:326). Measured 3.3% at n=4096;
    gate at 6%. The shorter 36-symbol window makes the TSC peak/RMS
    statistic noisier than RACH's — the reference compensates with the
    energy gate and the TDMA schedule (only TSC slots are tested)."""
    noise = np.asarray(signal.gaussian_noise(
        jax.random.PRNGKey(43), (N_NOISE_TRIALS, 157), 1.0))
    det, _, _ = xc.analyze_traffic_burst(jnp.asarray(noise), 0, SPS,
                                         threshold=3.0)
    pfa = float(np.mean(np.asarray(det.detected)))
    assert pfa < 0.06, f"TSC noise-only Pfa {pfa}"


def test_detection_threshold_is_discriminative():
    """peak_to_mean separates signal from noise by a wide margin: the
    5th percentile of the signal statistic at 9 dB stays above the 99th
    percentile of the noise statistic (where valleys are in range)."""
    wave = rach_wave()
    batch = _noisy_batch(wave, 9.0, 0.0, N_TRIALS, seed=7)
    det_sig = xc.detect_rach(jnp.asarray(batch), SPS)
    noise = np.asarray(signal.gaussian_noise(
        jax.random.PRNGKey(44), (N_NOISE_TRIALS, 157), 1.0))
    det_noise = xc.detect_rach(jnp.asarray(noise), SPS)
    # compare only in-range-valley statistics (the detector's `ok`
    # gate, exposed as amplitude != 0); out-of-range peaks produce a
    # huge ptm against the rms floor but are rejected outright
    ptm_n = np.asarray(det_noise.peak_to_mean)
    ptm_n = ptm_n[np.asarray(det_noise.amplitude) != 0]
    sig_p5 = np.percentile(np.asarray(det_sig.peak_to_mean), 5)
    noise_p99 = np.percentile(ptm_n, 99)
    assert sig_p5 > noise_p99, (sig_p5, noise_p99)


def test_demod_ber_vs_snr():
    """Soft-bit quality: BER after detection+demod falls with SNR."""
    rng = np.random.default_rng(5)
    bits = np.concatenate(
        [[0, 0, 0], rng.integers(0, 2, 57), [1], C.TRAINING_SEQUENCE[0],
         [1], rng.integers(0, 2, 57), [0, 0, 0]]).astype(np.uint8)
    wave = gmsk.modulate_burst_np(bits[None], SPS, guard_len=9)[0]
    bers = []
    for snr_db in (16, 8):
        batch = _noisy_batch(wave, snr_db, 0.0, N_TRIALS, seed=snr_db * 3)
        det, _, _ = xc.analyze_traffic_burst(jnp.asarray(batch), 0, SPS)
        soft = np.asarray(gmsk.demodulate_burst(
            jnp.asarray(batch), SPS, det.amplitude, det.toa))
        hard = (soft[:, :148] > 0.5).astype(np.uint8)
        bers.append(np.mean(hard != bits[None]))
    assert bers[0] < 0.01
    assert bers[0] <= bers[1]
