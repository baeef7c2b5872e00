import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openbts_ttsou_tpu.ops import correlate as corr
from openbts_ttsou_tpu.ops import gmsk, signal
from openbts_ttsou_tpu.utils import constants as C

RNG = np.random.default_rng(7)
SPS = 1


def make_rach_burst(delay_bits=None):
    """RACH burst: 8 tail (01010101) + 41 synch + 36 data + 3 tail + guard
    (sigProcLibTest.cpp:38-45 uses zeros for the tail/data)."""
    bits = np.concatenate(
        [np.array([0, 1, 0, 1, 0, 1, 0, 1]), C.RACH_SYNCH_SEQUENCE, np.zeros(99, int)]
    )
    return np.asarray(gmsk.modulate_burst(bits[None], SPS, guard_len=9))[0]


def make_normal_burst(tsc=0, seed=1):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 2, 57)
    data2 = rng.integers(0, 2, 57)
    bits = np.concatenate(
        [[0, 0, 0], data, [0], C.TRAINING_SEQUENCE[tsc], [0], data2, [0, 0, 0]]
    )
    assert len(bits) == 148
    return bits, np.asarray(gmsk.modulate_burst(bits[None], SPS))[0]


def test_peak_detect_parabolic_accuracy():
    # A sinc pulse centered at a known fractional index.
    t = np.arange(64)
    true_peak = 30.37
    x = np.sinc(t - true_peak).astype(np.complex64) * (3.0 + 1.0j)
    peak_val, peak_idx, avg = corr.peak_detect(x[None])
    assert abs(float(peak_idx[0]) - true_peak) < 1e-2
    # Truncated-sinc interpolation has ~2% amplitude bias (same as the
    # reference's 21-tap interpolatePoint).
    assert abs(complex(peak_val[0]) - (3.0 + 1.0j)) < 0.08


def test_peak_detect_batched():
    xs = np.stack(
        [np.sinc(np.arange(64) - p).astype(np.complex64) for p in (10.25, 40.75, 33.0)]
    )
    _, idx, _ = corr.peak_detect(xs)
    np.testing.assert_allclose(np.asarray(idx), [10.25, 40.75, 33.0], atol=1e-2)


def test_rach_template_self_detection():
    burst = make_rach_burst()
    det = corr.detect_rach(burst[None], SPS)
    assert bool(det.detected[0])
    # Clean loopback burst: TOA should be ~0, amplitude ~unit magnitude.
    assert abs(float(det.toa[0])) < 0.5
    assert abs(abs(complex(det.amplitude[0])) - 1.0) < 0.1


def test_rach_detection_with_delay_and_noise():
    burst = make_rach_burst()
    key = jax.random.PRNGKey(0)
    shifted = np.asarray(gmsk.delay_vector(burst[None], jnp.array([7.25])))[0]
    noisy = shifted + np.asarray(signal.gaussian_noise(key, shifted.shape, 1e-3))
    det = corr.detect_rach(noisy[None], SPS)
    assert bool(det.detected[0])
    assert abs(float(det.toa[0]) - 7.25) < 0.1


def test_rach_low_false_alarm_on_noise():
    # Pure noise: the peak/RMS>5 test should reject the overwhelming
    # majority (occasional tail events are expected — the reference
    # handles them with its adaptive energy threshold).
    key = jax.random.PRNGKey(3)
    noise = np.asarray(signal.gaussian_noise(key, (32, 157), 1.0))
    det = corr.detect_rach(noise, SPS)
    assert int(np.sum(np.asarray(det.detected))) <= 3


@pytest.mark.parametrize("tsc", [0, 3, 7])
def test_tsc_detection_clean(tsc):
    _, burst = make_normal_burst(tsc)
    det, _, _ = corr.analyze_traffic_burst(burst[None], tsc, SPS)
    assert bool(det.detected[0])
    assert abs(float(det.toa[0])) < 0.5
    assert abs(abs(complex(det.amplitude[0])) - 1.0) < 0.1


def test_tsc_detection_amplitude_scaling():
    _, burst = make_normal_burst(0)
    det, _, _ = corr.analyze_traffic_burst((4.0 - 3.0j) * burst[None], 0, SPS)
    amp = complex(det.amplitude[0])
    assert abs(amp - (4.0 - 3.0j)) < 0.15 * abs(4 - 3j)


def test_tsc_detection_per_burst_tsc_vector():
    bursts = np.stack([make_normal_burst(t)[1] for t in (0, 2, 5)])
    det, _, _ = corr.analyze_traffic_burst(bursts, np.array([0, 2, 5]), SPS)
    assert np.all(np.asarray(det.detected))
    # The matched TSC correlator must put the peak at TOA ≈ 0 (cross-TSC
    # correlations can exceed the 3.0 threshold — GSM TSCs are not
    # orthogonal — but land at arbitrary TOAs; the matched one is exact).
    np.testing.assert_allclose(np.asarray(det.toa), 0.0, atol=0.5)


def test_tsc_channel_estimate_recovers_multipath():
    _, burst = make_normal_burst(0)
    # Two-tap channel: 1.0 + 0.4 delayed by 1 symbol (cf. sigProcLibTest
    # channel [9000, 3600, 0, ~0] normalized).
    chan = np.array([1.0, 0.4], np.complex64)
    faded = np.convolve(burst, chan)[: len(burst)]
    det, est, off = corr.analyze_traffic_burst(
        faded[None], 0, SPS, estimate_channel=True
    )
    assert bool(det.detected[0])
    est = np.asarray(est)[0] / complex(det.amplitude[0])
    # The estimated channel (normalized by detected amplitude) should have
    # its dominant taps in ratio ~1 : 0.4.
    mags = np.abs(est)
    k = int(np.argmax(mags))
    assert mags[k] == pytest.approx(1.0, abs=0.15)
    assert k + 1 < len(mags)
    assert mags[k + 1] == pytest.approx(0.4, abs=0.15)


@pytest.mark.parametrize("max_toa", [3, 30])
def test_tsc_windowed_matches_full(max_toa):
    """The 52M 2·maxTOA+1-lag window (Transceiver52M/sigProcLib.cpp:
    983-1000) must agree with the full-segment correlator for bursts
    whose TOA is inside the window — detection, amplitude, and TOA."""
    # maxTOA=3 leaves a 7-lag array: peaks within ~1 lag of its edge
    # lose sinc taps to the same corrLen clipping the reference's
    # interpolatePoint applies (sigProcLib.cpp:643-645), so the tight
    # window is compared on interior delays only
    delays = [0.0, 1.5, -1.0, 2.75] if max_toa >= 30 else \
        [0.0, 1.5, -1.0, 1.25]
    bursts = []
    for d in delays:
        _, b = make_normal_burst(0, seed=int(10 * d) + 50)
        bursts.append(np.asarray(gmsk.delay_vector(b[None],
                                                   jnp.array([d])))[0])
    bursts = np.stack(bursts)
    det_f, est_f, off_f = corr.analyze_traffic_burst(
        bursts, 0, SPS, estimate_channel=True)
    det_w, est_w, off_w = corr.analyze_traffic_burst(
        bursts, 0, SPS, estimate_channel=True, max_toa=max_toa)
    assert np.all(np.asarray(det_f.detected))
    assert np.all(np.asarray(det_w.detected))
    # window-edge effects: the short window clips interpolatePoint's
    # 21-tap sinc at the array bound exactly like the reference's
    # corrLen-bounded buffer (sigProcLib.cpp:643-645). At maxTOA=30 the
    # peak sits deep inside → sub-1/128-sample agreement; at maxTOA=3
    # every nonzero delay is within 2 lags of the bound → ~3% TOA /
    # ~5% amplitude interpolation bias is inherent to the 7-lag window.
    toa_tol, amp_tol = (1 / 128, 1e-2) if max_toa >= 30 else (0.05, 0.06)
    np.testing.assert_allclose(np.asarray(det_w.toa),
                               np.asarray(det_f.toa), atol=toa_tol)
    np.testing.assert_allclose(np.asarray(det_w.amplitude),
                               np.asarray(det_f.amplitude), atol=amp_tol)
    # Channel-estimate parity: the two reference variants anchor their
    # 7-window search differently (64M: template TOA + segment offset,
    # a x.999 float; 52M: exactly maxTOA — sigProcLib.cpp:1046), so the
    # floor()'d window grids sit ±1 apart and maxI/offset bookkeeping
    # legitimately differs. The invariant is the selected window's
    # CONTENT — the same absolute slice of the delayed correlation —
    # which maxTOA=30's full-width window must reproduce. (maxTOA=3
    # leaves a 7-lag array where most windows fail the reference's
    # in-range guards; content parity is out of scope there, as it is
    # in the reference.)
    if max_toa >= 30:
        np.testing.assert_allclose(np.asarray(est_w), np.asarray(est_f),
                                   atol=2e-2)


def test_tsc_windowed_rejects_out_of_window():
    """A burst delayed past maxTOA cannot be found inside the restricted
    window (the reference physically computes only those lags)."""
    _, b = make_normal_burst(0)
    delayed = np.asarray(gmsk.delay_vector(b[None], jnp.array([7.0])))[0]
    det_w, _, _ = corr.analyze_traffic_burst(delayed[None], 0, SPS,
                                             max_toa=3)
    det_f, _, _ = corr.analyze_traffic_burst(delayed[None], 0, SPS)
    assert bool(det_f.detected[0])  # the full window still sees it
    assert abs(float(det_f.toa[0]) - 7.0) < 0.5
    # windowed: either no detection, or a (sidelobe) peak with TOA
    # bounded by the window — never the true out-of-window TOA
    assert (not bool(det_w.detected[0])) or \
        abs(float(det_w.toa[0])) <= 3.01


def test_tsc_windowed_valley_count_semantics():
    """maxTOA=3 leaves only 7 lags: the valley offsets ±(2..5) mostly
    fall outside, and the in-range count must reflect the short window
    (numRms guard, Transceiver52M/sigProcLib.cpp:1020-1031)."""
    _, b = make_normal_burst(0)
    det, _, _ = corr.analyze_traffic_burst(b[None], 0, SPS, max_toa=3)
    # clean burst centered in a 7-lag window: peak at lag 3, valley
    # samples at ±2, ±3 in range → detection still fires
    assert bool(det.detected[0])
    assert abs(float(det.toa[0])) < 0.5


def test_energy_detect():
    x = np.ones((2, 157), np.complex64)
    x[1] *= 100.0
    det, avg = corr.energy_detect(x, 20, jnp.array([10.0, 10.0]))
    assert not bool(det[0]) and bool(det[1])
    np.testing.assert_allclose(np.asarray(avg), [1.0, 10000.0], rtol=1e-5)
