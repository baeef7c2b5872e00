"""Windowed-correlation kernel: XLA path vs direct reference math, and
the Pallas kernel in interpret mode."""

import numpy as np
import pytest

import jax.numpy as jnp

from openbts_ttsou_tpu.ops.pallas_correlate import windowed_correlate

RNG = np.random.default_rng(11)


def direct(x, t, lag0, n_lags):
    B, T = x.shape
    K, L = t.shape
    out = np.zeros((B, n_lags, K), np.complex64)
    for b in range(B):
        for w in range(n_lags):
            for k in range(K):
                out[b, w, k] = np.dot(x[b, lag0 + w : lag0 + w + L],
                                      t[k])
    return out


@pytest.fixture(scope="module")
def data():
    x = (RNG.standard_normal((5, 157))
         + 1j * RNG.standard_normal((5, 157))).astype(np.complex64)
    t = (RNG.standard_normal((3, 16))
         + 1j * RNG.standard_normal((3, 16))).astype(np.complex64)
    return x, t


def test_xla_path_matches_direct(data):
    x, t = data
    got = np.asarray(windowed_correlate(jnp.asarray(x), jnp.asarray(t),
                                        lag0=50, n_lags=21))
    np.testing.assert_allclose(got, direct(x, t, 50, 21), rtol=2e-5,
                               atol=2e-5)


def test_pallas_interpret_matches_xla(data):
    x, t = data
    ref = np.asarray(windowed_correlate(jnp.asarray(x), jnp.asarray(t),
                                        lag0=50, n_lags=21))
    got = np.asarray(windowed_correlate(jnp.asarray(x), jnp.asarray(t),
                                        lag0=50, n_lags=21,
                                        method="interpret"))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_window_bounds_checked(data):
    x, t = data
    with pytest.raises(ValueError):
        windowed_correlate(jnp.asarray(x), jnp.asarray(t), lag0=150,
                           n_lags=21)
