import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openbts_ttsou_tpu.gsm import fec

RNG = np.random.default_rng(11)


def test_parity_round_trip_firecode():
    data = RNG.integers(0, 2, (5, 184)).astype(np.uint8)
    p = np.asarray(fec.parity_word(data, fec.FIRECODE_XCCH))
    assert p.shape == (5, 40)
    cw = np.concatenate([data, p], axis=-1)
    ok = np.asarray(fec.syndrome_ok(cw, fec.FIRECODE_XCCH))
    assert ok.all()
    # corrupt one data bit → syndrome fails
    bad = cw.copy()
    bad[:, 17] ^= 1
    assert not np.asarray(fec.syndrome_ok(bad, fec.FIRECODE_XCCH)).any()


@pytest.mark.parametrize("spec,k", [(fec.PARITY_RACH, 2), (fec.PARITY_SCH, 15),
                                    (fec.PARITY_TCH, 47)])
def test_parity_round_trip_other_codes(spec, k):
    poly, p, n = spec
    data = RNG.integers(0, 2, (3, n - p)).astype(np.uint8)
    pw = np.asarray(fec.parity_word(data, spec))
    cw = np.concatenate([data, pw], axis=-1)
    assert np.asarray(fec.syndrome_ok(cw, spec)).all()
    bad = cw.copy()
    bad[:, k] ^= 1
    assert not np.asarray(fec.syndrome_ok(bad, spec)).any()


def test_conv_encode_known_impulse():
    # Impulse response of G0=1+D^3+D^4, G1=1+D+D^3+D^4
    bits = np.zeros((1, 8), np.uint8)
    bits[0, 0] = 1
    c = np.asarray(fec.conv_encode(bits))[0]
    g0 = c[0::2]
    g1 = c[1::2]
    np.testing.assert_array_equal(g0, [1, 0, 0, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(g1, [1, 1, 0, 1, 1, 0, 0, 0])


def test_viterbi_round_trip_clean():
    u = RNG.integers(0, 2, (4, 228)).astype(np.uint8)
    u[:, -4:] = 0  # tail bits
    c = np.asarray(fec.conv_encode(u))
    soft = c.astype(np.float32)
    decoded = np.asarray(fec.viterbi_decode(soft))
    np.testing.assert_array_equal(decoded, u)


def test_viterbi_corrects_gaussian_soft_noise():
    u = RNG.integers(0, 2, (8, 228)).astype(np.uint8)
    u[:, -4:] = 0
    c = np.asarray(fec.conv_encode(u)).astype(np.float32)
    soft = np.clip(c + RNG.normal(0, 0.2, c.shape), 0, 1).astype(np.float32)
    decoded = np.asarray(fec.viterbi_decode(soft))
    np.testing.assert_array_equal(decoded, u)


def test_viterbi_corrects_isolated_hard_flips():
    u = RNG.integers(0, 2, (4, 228)).astype(np.uint8)
    u[:, -4:] = 0
    c = np.asarray(fec.conv_encode(u)).astype(np.float32)
    soft = c.copy()
    flips = np.arange(20, 456, 48)  # well-separated confident errors
    soft[:, flips] = 1.0 - soft[:, flips]
    decoded = np.asarray(fec.viterbi_decode(soft))
    np.testing.assert_array_equal(decoded, u)


def test_viterbi_erasures_half_confidence():
    # A short erased span (one missing half-burst region, scaled down) is
    # bridged by the code's constraint length; a long erasure is
    # information-theoretically unrecoverable, so keep it to 8 coded bits.
    rng = np.random.default_rng(42)
    u = rng.integers(0, 2, (2, 100)).astype(np.uint8)
    u[:, -4:] = 0
    c = np.asarray(fec.conv_encode(u)).astype(np.float32)
    soft = c.copy()
    soft[:, 40:48] = 0.5  # erased span
    decoded = np.asarray(fec.viterbi_decode(soft))
    errors = int((decoded != u).sum())
    assert errors <= 2, f"erasure span errors {errors}"


def test_xcch_interleave_round_trip():
    c = RNG.integers(0, 2, (3, 456)).astype(np.uint8)
    i = fec.interleave(c, fec.xcch_interleave_map(), 4)
    assert i.shape == (3, 4, 114)
    back = np.asarray(fec.deinterleave(i, fec.xcch_interleave_map()))
    np.testing.assert_array_equal(back, c)


def test_tch_interleave_round_trip():
    c = RNG.integers(0, 2, (456,)).astype(np.uint8)
    imap = fec.tch_interleave_map(0)
    i = fec.interleave(c, imap, 8)
    back = np.asarray(fec.deinterleave(i, imap))
    np.testing.assert_array_equal(back, c)
    # diagonal property: even bits land in bursts 0-3, odd in 4-7
    assert set((imap[np.arange(456) % 8 < 4] // 114).tolist()) <= {0, 1, 2, 3}


def test_burst_map_round_trip():
    i = RNG.integers(0, 2, (2, 114)).astype(np.uint8)
    burst = np.asarray(fec.map_to_burst(i))
    assert burst.shape == (2, 148)
    assert burst[0, 60] == 1 and burst[0, 87] == 1
    assert np.all(burst[:, :3] == 0) and np.all(burst[:, 145:] == 0)
    payload, (hl, hu) = fec.unmap_from_burst(burst)
    np.testing.assert_array_equal(np.asarray(payload), i)


def test_xcch_full_fec_chain():
    """184-bit L2 frame → parity+tail → conv encode → interleave → bursts
    → (soft) → deinterleave → viterbi → parity check
    (GSM 05.03 4.1; XCCHL1Encoder::encode + XCCHL1Decoder::decode)."""
    frames = RNG.integers(0, 2, (4, 184)).astype(np.uint8)
    p = np.asarray(fec.parity_word(frames, fec.FIRECODE_XCCH))
    u = np.concatenate([frames, p, np.zeros((4, 4), np.uint8)], axis=-1)
    c = np.asarray(fec.conv_encode(u))
    i = fec.interleave(c, fec.xcch_interleave_map(), 4)
    bursts = np.asarray(fec.map_to_burst(i))
    # receiver side
    payload, _ = fec.unmap_from_burst(bursts.astype(np.float32))
    c_soft = np.asarray(fec.deinterleave(
        np.asarray(payload).reshape(4, 4, 114), fec.xcch_interleave_map()))
    u_hat = np.asarray(fec.viterbi_decode(c_soft))
    np.testing.assert_array_equal(u_hat, u)
    ok = np.asarray(fec.syndrome_ok(u_hat[:, :224], fec.FIRECODE_XCCH))
    assert ok.all()
