"""Pallas kernel validation (interpret mode on the CPU mesh; the same
kernel compiles for TPU via Mosaic)."""

import numpy as np
import pytest

from openbts_ttsou_tpu.ops import fir
from openbts_ttsou_tpu.ops.pallas_fir import polyphase_resample_pallas

RNG = np.random.default_rng(17)


@pytest.mark.parametrize("p,q,taps,T,B", [(65, 96, 961, 24000, 3),
                                          (96, 65, 651, 16250, 2)])
def test_pallas_resampler_matches_xla(p, q, taps, T, B):
    x = (RNG.standard_normal((B, T))
         + 1j * RNG.standard_normal((B, T))).astype(np.complex64)
    lpf = fir.resampler_lpf(p, q, taps)
    want = np.asarray(fir.polyphase_resample(x, p, q, lpf))
    got = np.asarray(polyphase_resample_pallas(x, p, q, lpf,
                                               interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-4 * np.abs(want).max())


def test_resample_dispatch_override(monkeypatch):
    """OPENBTS_TPU_RESAMPLE=pallas routes polyphase_resample through the
    Pallas kernel (interpret mode on CPU); auto keeps XLA on CPU."""
    x = (RNG.standard_normal((2, 2400))
         + 1j * RNG.standard_normal((2, 2400))).astype(np.complex64)
    lpf = fir.resampler_lpf(65, 96, 961)
    want = np.asarray(fir.polyphase_resample_mm(x, 65, 96, lpf))
    assert not fir._resample_use_pallas(x, 96)  # auto: CPU → xla
    monkeypatch.setattr(fir, "RESAMPLE_IMPL", "pallas")
    assert fir._resample_use_pallas(x, 96)
    got = np.asarray(fir.polyphase_resample(x, 65, 96, lpf))
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-4 * np.abs(want).max())
    monkeypatch.setattr(fir, "RESAMPLE_IMPL", "xla")
    assert not fir._resample_use_pallas(x, 96)
