"""RFX900 synthesizer frequency plan + GSM band arithmetic
(USRPDevice::compute_regs / setTxFreq / setRxFreq and
GSM::uplinkFreqKHz parity)."""

import pytest

from openbts_ttsou_tpu.trx import rfx900 as rfx


def ref_compute_regs(freq, master_clock=52e6):
    """Direct transcription of compute_regs
    (Transceiver52M/USRPDevice.cpp:56-103) for ground truth."""
    if freq < 1.2e9:
        div2, freq_mult = 1, 2
    else:
        div2, freq_mult = 0, 1
    phdet = master_clock / 16
    n = int(round(freq * freq_mult / phdet))
    actual = n * phdet / freq_mult
    b, a = int(n // 16), int(n - 16 * (n // 16))
    if b < a:
        return None
    r = (3 << 20) | (1 << 18) | (16 << 2)
    control = ((1 << 22) | (7 << 17) | (7 << 14) | (1 << 11) | (1 << 8)
               | (1 << 5) | (1 << 2))
    nw = (div2 << 22) | (b << 8) | (a << 2)
    return r, control, nw, actual


@pytest.mark.parametrize("mhz", [890.0, 935.2, 947.6, 824.2, 869.2,
                                 1805.2, 1842.4, 1930.2, 1959.8])
def test_plan_matches_reference_registers(mhz):
    freq = mhz * 1e6
    got = rfx.frequency_plan(freq)
    r, control, nw, actual = ref_compute_regs(freq)
    assert got.r_word == r
    assert got.control_word == control
    assert got.n_word == nw
    assert got.actual == pytest.approx(actual)


def test_low_band_uses_div2_grid():
    # below 1.2 GHz the VCO runs doubled: the frequency grid is
    # phase_det/2 = 1.625 MHz instead of 3.25 MHz
    p = rfx.frequency_plan(900e6)
    assert p.div2
    assert abs(p.residual) <= 52e6 / 16 / 2 / 2 + 1
    hi = rfx.frequency_plan(1900e6)
    assert not hi.div2


def test_tx_rx_lo_offset_policy():
    # Tx synthesizes above the carrier, Rx two offsets below
    # (Transceiver/USRPDevice.cpp:521-542); residual = DDC/DUC shift
    rf = 942.4e6
    tx = rfx.tune_tx(rf)
    rx = rfx.tune_rx(rf)
    assert abs(tx.actual - (rf + rfx.LO_OFFSET)) <= 1.625e6 / 2 + 1
    assert abs(rx.actual - (rf - 2 * rfx.LO_OFFSET)) <= 1.625e6 / 2 + 1
    # the digital mixer absorbs what the synthesizer can't hit
    assert abs(rf - (tx.actual + tx.residual)) < 1e-3


def test_spi_framing():
    # 3 writes of 3 MSB-first bytes, address in the low 2 bits,
    # order R(1) -> control(0) -> N(2)  (USRPDevice.cpp:110-117)
    p = rfx.frequency_plan(947.6e6)
    words = p.spi_bytes()
    assert [w[2] & 0x3 for w in words] == [1, 0, 2]
    assert int.from_bytes(words[0], "big") & ~0x3 == p.r_word & ~0x3


def test_arfcn_frequencies():
    # GSM::uplinkFreqKHz spot values (GSM/GSMCommon.cpp:98-135)
    assert rfx.uplink_freq_khz(rfx.EGSM900, 0) == 890000
    assert rfx.uplink_freq_khz(rfx.EGSM900, 124) == 890000 + 200 * 124
    assert rfx.uplink_freq_khz(rfx.EGSM900, 975) == 890000 - 200 * 49
    assert rfx.downlink_freq_khz(rfx.EGSM900, 62) == \
        890000 + 200 * 62 + 45000
    assert rfx.uplink_freq_khz(rfx.GSM850, 128 + 1) == 824200 + 200
    # GSM 05.05 low edge (deliberate divergence from the reference's
    # ARFCN>129 assert; see rfx900._BAND)
    assert rfx.uplink_freq_khz(rfx.GSM850, 128) == 824200
    assert rfx.uplink_freq_khz(rfx.DCS1800, 512) == 1710200
    assert rfx.downlink_freq_khz(rfx.PCS1900, 512) == 1850200 + 80000
    with pytest.raises(ValueError):
        rfx.uplink_freq_khz(rfx.EGSM900, 500)
    with pytest.raises(ValueError):
        rfx.uplink_freq_khz(rfx.GSM850, 127)
