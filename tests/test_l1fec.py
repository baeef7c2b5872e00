import numpy as np
import pytest

import jax.numpy as jnp

from openbts_ttsou_tpu.gsm import fec, gsm610, l1fec, tdma

RNG = np.random.default_rng(61)


def test_lsb8msb():
    bits = np.array([1, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 1], np.uint8)
    out = np.asarray(l1fec.lsb8msb(bits))
    # first byte reversed, trailing 4 bits untouched
    np.testing.assert_array_equal(out[:8], [0, 0, 0, 0, 0, 0, 0, 1])
    np.testing.assert_array_equal(out[8:], [1, 1, 0, 1])
    # involution
    np.testing.assert_array_equal(np.asarray(l1fec.lsb8msb(out)), bits)


def test_pack_unpack_field():
    bits = l1fec.pack_field([jnp.asarray(5), jnp.asarray(1023), jnp.asarray(2)],
                            [6, 11, 5])
    assert bits.shape == (22,)
    assert int(l1fec.unpack_field(bits, 0, 6)) == 5
    assert int(l1fec.unpack_field(bits, 6, 11)) == 1023
    assert int(l1fec.unpack_field(bits, 17, 5)) == 2


def test_xcch_round_trip():
    frames = RNG.integers(0, 2, (3, 184)).astype(np.uint8)
    bursts = l1fec.xcch_encode(frames)
    assert bursts.shape == (3, 4, 148)
    dec, ok = l1fec.xcch_decode(np.asarray(bursts).astype(np.float32))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(dec), frames)


def test_xcch_rejects_garbage():
    noise = RNG.uniform(0, 1, (2, 4, 148)).astype(np.float32)
    _, ok = l1fec.xcch_decode(noise)
    assert not np.asarray(ok).any()


def test_rach_round_trip():
    ra = jnp.asarray(np.array([0, 7, 42, 255], np.int32))
    bsic = 21
    coded = l1fec.rach_encode(ra, jnp.asarray(bsic))
    assert coded.shape == (4, 36)
    ra2, ok = l1fec.rach_decode(np.asarray(coded).astype(np.float32), bsic)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(ra2), np.asarray(ra))
    # wrong BSIC → rejected
    _, ok_bad = l1fec.rach_decode(np.asarray(coded).astype(np.float32), 22)
    assert not np.asarray(ok_bad).any()


def test_sch_round_trip():
    bsic = jnp.asarray([21, 63])
    t1 = jnp.asarray([1024, 37])
    t2 = jnp.asarray([12, 25])
    t3p = jnp.asarray([3, 0])
    burst = l1fec.sch_encode(bsic, t1, t2, t3p)
    assert burst.shape == (2, 148)
    # extended training sequence present
    from openbts_ttsou_tpu.utils import constants as C

    np.testing.assert_array_equal(np.asarray(burst)[0, 42:106],
                                  C.SCH_SYNCH_SEQUENCE)
    fields, ok = l1fec.sch_decode(np.asarray(burst).astype(np.float32))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(fields["bsic"]), [21, 63])
    np.testing.assert_array_equal(np.asarray(fields["t1"]), [1024, 37])
    np.testing.assert_array_equal(np.asarray(fields["t2"]), [12, 25])
    np.testing.assert_array_equal(np.asarray(fields["t3p"]), [3, 0])


def test_tch_round_trip():
    d = RNG.integers(0, 2, (4, 260)).astype(np.uint8)
    c = l1fec.tch_encode(d)
    assert c.shape == (4, 456)
    d2, good = l1fec.tch_decode(np.asarray(c).astype(np.float32))
    assert np.asarray(good).all()
    np.testing.assert_array_equal(np.asarray(d2), d)


def test_tch_bad_frame_detected():
    d = RNG.integers(0, 2, (1, 260)).astype(np.uint8)
    c = np.asarray(l1fec.tch_encode(d)).astype(np.float32)
    # corrupt the class-1a region heavily
    c[0, :40] = 1.0 - c[0, :40]
    _, good = l1fec.tch_decode(c)
    assert not np.asarray(good).any()


def test_gsm610_bit_order_round_trip():
    payload = RNG.integers(0, 2, (2, 260)).astype(np.uint8)
    coder = gsm610.payload_to_coder(payload)
    back = gsm610.coder_to_payload(coder)
    np.testing.assert_array_equal(back, payload)
    assert sorted(gsm610.BIT_ORDER.tolist()) == list(range(260))


def test_tdma_mappings_sanity():
    assert tdma.FCCH.frame_mapping == (0, 10, 20, 30, 40)
    assert tdma.SCH.frame_mapping == (1, 11, 21, 31, 41)
    assert tdma.BCCH.frame_mapping == (2, 3, 4, 5)
    assert len(tdma.RACH_C5.frame_mapping) == 27
    # SDCCH/8 subchannel 3 uplink = {27,28,29,30}
    assert tdma.SDCCH_8[3][1].frame_mapping == (27, 28, 29, 30)
    # SACCH_TF per-TN tables (GSMTDMA.cpp:245-268)
    assert tdma.SACCH_TF[0].frame_mapping == (12, 38, 64, 90)
    assert tdma.SACCH_TF[1].frame_mapping == (25, 51, 77, 103)
    assert tdma.SACCH_TF[2].frame_mapping == (38, 64, 90, 12)
    assert tdma.SACCH_TF[7].frame_mapping == (103, 25, 51, 77)
    assert tdma.FACCH_TCHF.frame_mapping == tuple(
        f for f in range(25) if f != 12)


def test_tdma_reverse_map():
    rm = tdma.BCCH.reverse_map()
    assert rm[2] == 0 and rm[5] == 3 and rm[0] == -1
    assert tdma.BCCH.reverse(53) == 0  # 53 % 51 == 2
    assert tdma.BCCH.reverse(0) is None
    assert tdma.SCH.next_write_time(2) == 11
    assert tdma.SCH.next_write_time(52) == 52  # 52 % 51 == 1 occupied


def test_sch_decode_in_program_over_the_air():
    """Fused beacon scan (MS-side / iq_tool use; the reference BTS only
    ENCODES SCH — GSML1FEC.cpp:880-925 has no SCH decoder): one jitted
    program modulates an SCH burst, coherently demodulates it at the
    symbol rate, and runs sch_decode — encode→air→decode without
    leaving the device."""
    import jax

    from openbts_ttsou_tpu.ops import gmsk

    @jax.jit
    def scan(bsic, t1, t2, t3p):
        burst = l1fec.sch_encode(bsic, t1, t2, t3p)
        wave = gmsk.modulate_burst(burst, 1)
        soft = gmsk.demodulate_burst(
            wave, 1, jnp.ones(burst.shape[:-1], jnp.complex64),
            jnp.zeros(burst.shape[:-1], jnp.float32))
        return l1fec.sch_decode(soft)

    fields, ok = scan(jnp.asarray([21, 5]), jnp.asarray([1024, 2047]),
                      jnp.asarray([12, 0]), jnp.asarray([3, 7]))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(fields["bsic"]), [21, 5])
    np.testing.assert_array_equal(np.asarray(fields["t1"]), [1024, 2047])
    np.testing.assert_array_equal(np.asarray(fields["t2"]), [12, 0])
    np.testing.assert_array_equal(np.asarray(fields["t3p"]), [3, 7])
