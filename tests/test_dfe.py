import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openbts_ttsou_tpu.ops import correlate as corr
from openbts_ttsou_tpu.ops import dfe, fir, gmsk, signal
from openbts_ttsou_tpu.utils import constants as C

SPS = 1


def make_normal_burst(tsc=0, seed=1):
    rng = np.random.default_rng(seed)
    bits = np.concatenate(
        [
            [0, 0, 0],
            rng.integers(0, 2, 57),
            [0],
            C.TRAINING_SEQUENCE[tsc],
            [0],
            rng.integers(0, 2, 57),
            [0, 0, 0],
        ]
    )
    return bits, np.asarray(gmsk.modulate_burst(bits[None], SPS))[0]


def hard(soft):
    return (np.asarray(soft) > 0.5).astype(int)


def test_design_dfe_shapes_and_batching():
    chan = np.zeros((3, 6), np.complex64)
    chan[:, 0] = 1.0
    chan[1, 1] = 0.4
    w, b = dfe.design_dfe(chan, jnp.array([100.0, 100.0, 100.0]))
    assert w.shape == (3, 7) and b.shape == (3, 5)
    # identical channels → identical filters
    np.testing.assert_allclose(np.asarray(w[0]), np.asarray(w[2]), rtol=1e-5)


def test_dfe_flat_channel_equalizes_clean_burst():
    bits, burst = make_normal_burst()
    chan = np.zeros(6, np.complex64)
    chan[0] = 1.0
    w, b = dfe.design_dfe(chan[None], jnp.array([1000.0]))
    soft = dfe.equalize_burst(burst[None], jnp.array([0.0]), SPS, w, b)
    ber = np.mean(hard(soft[0]) != bits)
    assert ber < 0.01, f"flat-channel DFE BER {ber}"


def test_dfe_recovers_isi_burst_known_channel():
    bits, burst = make_normal_burst(seed=5)
    chan_taps = np.array([1.0, 0.45, 0.15], np.complex64)
    faded = np.convolve(burst, chan_taps)[: len(burst)]
    chan = np.zeros(6, np.complex64)
    chan[: len(chan_taps)] = chan_taps
    w, b = dfe.design_dfe(chan[None], jnp.array([1000.0]))
    soft = dfe.equalize_burst(faded[None], jnp.array([0.0]), SPS, w, b)
    ber = np.mean(hard(soft[0]) != bits)
    assert ber < 0.02, f"ISI DFE BER {ber}"
    # plain demod on the same burst should be worse or equal
    soft_plain = gmsk.demodulate_burst(faded[None], SPS, 1.0 + 0j, 0.0)
    ber_plain = np.mean(hard(soft_plain[0]) != bits)
    assert ber <= ber_plain


def test_full_scenario_sigproclibtest_parity():
    """The reference's canonical DSP loopback (sigProcLibTest.cpp:74-165,
    BASELINE config 1): modulate → 96/65 resample → 65/96 resample →
    fractional delay → multipath channel → noise → detect/estimate →
    demod and DFE-equalize → recover the transmitted bits."""
    bits, _ = make_normal_burst(seed=2)
    # guard_len=9 so the fractionally-delayed burst stays inside the
    # vector (the reference test loses its last symbols off the end).
    burst = np.asarray(gmsk.modulate_burst(bits[None], SPS, guard_len=9))[0]

    up = fir.polyphase_resample(burst[None], 96, 65, fir.resampler_lpf(96, 65, 651))
    down = np.asarray(
        fir.polyphase_resample(up, 65, 96, fir.resampler_lpf(65, 96, 961))
    )[0][:157]
    delayed = np.asarray(gmsk.delay_vector(down[None], jnp.array([6.932])))[0]

    chan_taps = np.array([9000.0, 3600.0, 0.0, 0.0], np.complex64)
    faded = np.asarray(
        fir.convolve(delayed[None], chan_taps, fir.NO_DELAY)
    )[0]
    noise_pwr = 0.001 / np.sqrt(2)
    noisy = faded + np.asarray(
        signal.gaussian_noise(jax.random.PRNGKey(1), faded.shape, noise_pwr)
    )

    det, chan_est, chan_off = corr.analyze_traffic_burst(
        noisy[None], 0, SPS, threshold=8.0, estimate_channel=True
    )
    assert bool(det.detected[0])
    amp = complex(det.amplitude[0])
    toa = float(det.toa[0])
    # TOA reflects the 6.932-sample injected delay, minus the 1-sample
    # advance of the even-length (4-tap) NO_DELAY channel convolution,
    # plus the pull of the 0.4-relative echo on the interpolated peak.
    assert abs(toa - 6.0) < 1.0, toa
    # amplitude magnitude ≈ dominant tap
    assert abs(amp) == pytest.approx(9000.0, rel=0.25)

    # Straight demod (as the reference test does)
    soft = gmsk.demodulate_burst(noisy[None], SPS, amp, toa)
    ber_demod = np.mean(hard(soft[0])[:148] != bits)

    # DFE path: normalize channel estimate by amplitude, design, equalize
    # (Transceiver.cpp:324-348 + sigProcLibTest.cpp:156-161)
    chan_n = np.asarray(chan_est)[0] / amp
    w, b = dfe.design_dfe(chan_n[None], jnp.array([1.0 / noise_pwr]))
    scaled = noisy / amp
    soft_dfe = dfe.equalize_burst(
        scaled[None], jnp.array([toa - float(chan_off[0])]), SPS, w, b
    )
    ber_dfe = np.mean(hard(soft_dfe[0])[:148] != bits)

    assert ber_demod < 0.05, f"demod BER {ber_demod}"
    assert ber_dfe < 0.02, f"DFE BER {ber_dfe}"
