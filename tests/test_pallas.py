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
