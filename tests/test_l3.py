import numpy as np
import pytest

from openbts_ttsou_tpu.gsm.l3 import cc, common, mm, parse_l3, rr
from openbts_ttsou_tpu.gsm.l3.codec import BitReader, BitWriter


def round_trip(msg):
    bits = msg.encode()
    assert len(bits) % 8 == 0
    out = parse_l3(bits)
    assert out is not None, f"factory failed for {type(msg).__name__}"
    assert type(out) is type(msg)
    return out


def test_lai_round_trip():
    lai = common.LAI("310", "260", 0x1234)
    w = BitWriter()
    lai.write_v(w)
    assert len(w) == 40
    back = common.LAI.parse_v(BitReader(w.array()))
    assert back == lai
    # 2-digit MNC
    lai2 = common.LAI("001", "01", 7)
    w2 = BitWriter()
    lai2.write_v(w2)
    assert common.LAI.parse_v(BitReader(w2.array())) == lai2


def test_mobile_identity_imsi_tmsi():
    for digits in ("001010123456789", "12345678901234"):  # odd + even
        mi = common.MobileIdentity.imsi(digits)
        w = BitWriter()
        mi.write_lv(w)
        back = common.MobileIdentity.parse_lv(BitReader(w.array()))
        assert back.digits == digits and back.kind == common.MID_IMSI
    tm = common.MobileIdentity.from_tmsi(0xDEADBEEF)
    w = BitWriter()
    tm.write_lv(w)
    back = common.MobileIdentity.parse_lv(BitReader(w.array()))
    assert back.tmsi == 0xDEADBEEF and back.kind == common.MID_TMSI


def test_immediate_assignment():
    msg = rr.ImmediateAssignment(
        rr.ChannelDescription(type_and_offset=5, tn=0, tsc=2, arfcn=207),
        rr.RequestReference.from_fn(0x42, 123456),
        timing_advance=7,
    )
    out = round_trip(msg)
    assert out.channel.arfcn == 207 and out.channel.tsc == 2
    assert out.reference.ra == 0x42
    assert out.reference.t2 == 123456 % 26
    assert out.reference.t3 == 123456 % 51
    assert out.timing_advance == 7


def test_immediate_assignment_reject_and_channel_release():
    rej = round_trip(rr.ImmediateAssignmentReject(
        rr.RequestReference(ra=9), t3122=20))
    assert rej.t3122 == 20 and rej.reference.ra == 9
    rel = round_trip(rr.ChannelRelease(cause=1))
    assert rel.cause == 1


def test_paging_request():
    p = rr.PagingRequestType1(
        common.MobileIdentity.from_tmsi(0x1234),
        common.MobileIdentity.imsi("00101123456789"),
    )
    out = round_trip(p)
    assert out.id1.tmsi == 0x1234
    assert out.id2.digits == "00101123456789"
    # single identity
    out1 = round_trip(rr.PagingRequestType1(
        common.MobileIdentity.imsi("123456789012345")))
    assert out1.id2 is None


def test_si3():
    msg = rr.SystemInformationType3(
        cell_id=10, lai=common.LAI("901", "55", 1000),
        rach=rr.RACHControlParameters(max_retrans=2, tx_integer=5),
        t3212=6)
    out = round_trip(msg)
    assert out.cell_id == 10 and out.lai.lac == 1000
    assert out.rach.tx_integer == 5 and out.t3212 == 6


def test_lur_flow():
    lur = mm.LocationUpdatingRequest(
        common.LAI("310", "26", 77),
        common.MobileIdentity.imsi("001010123456789"), lu_type=1)
    out = round_trip(lur)
    assert out.identity.digits == "001010123456789"
    assert out.lu_type == 1 and out.lai.lac == 77

    acc = mm.LocationUpdatingAccept(
        common.LAI("310", "26", 77),
        common.MobileIdentity.from_tmsi(0xABCD1234))
    out = round_trip(acc)
    assert out.identity.tmsi == 0xABCD1234

    rej = round_trip(mm.LocationUpdatingReject(cause=0x0B))
    assert rej.cause == 0x0B


def test_cm_service_and_identity():
    req = mm.CMServiceRequest(
        service_type=4, identity=common.MobileIdentity.from_tmsi(42))
    out = round_trip(req)
    assert out.service_type == 4 and out.identity.tmsi == 42
    round_trip(mm.CMServiceAccept())
    assert round_trip(mm.CMServiceReject(cause=0x16)).cause == 0x16
    assert round_trip(mm.IdentityRequest(id_type=2)).id_type == 2
    resp = mm.IdentityResponse(common.MobileIdentity.imsi("123456789"))
    assert round_trip(resp).identity.digits == "123456789"
    det = mm.IMSIDetachIndication(common.MobileIdentity.imsi("999"))
    assert round_trip(det).identity.digits == "999"


def test_cc_setup_and_teardown():
    s = cc.Setup(cc.CalledPartyBCDNumber("18005551212"))
    out = round_trip(s)
    assert out.called.digits == "18005551212"
    round_trip(cc.CallProceeding())
    round_trip(cc.Alerting())
    round_trip(cc.Connect())
    round_trip(cc.ConnectAcknowledge())
    d = round_trip(cc.Disconnect(cc.Cause(value=17)))
    assert d.cause.value == 17
    rel = round_trip(cc.Release(cc.Cause(value=16)))
    assert rel.cause.value == 16
    rc = round_trip(cc.ReleaseComplete())
    assert rc.cause is None
    assert round_trip(cc.StartDTMF("5")).key == "5"


def test_cc_transaction_identifier():
    s = cc.Setup()
    s.ti = 0x9  # TI flag set, value 1
    bits = s.encode()
    # TI lives in the top nibble of octet 1
    assert int(bits[0]) == 1 and int(bits[3]) == 1


def test_cc_hold_progress_status_round_trip():
    """The in-call leg set: Hold/HoldReject, Progress, EmergencySetup,
    CCStatus (GSML3CCMessages.h:164,298,597,621,639)."""
    round_trip(cc.Hold())
    round_trip(cc.EmergencySetup())
    hr = round_trip(cc.HoldReject())
    assert hr.cause.value == 0x3F  # option-not-available default
    p = round_trip(cc.Progress(cc.ProgressIndicator(progress=8,
                                                    location=2)))
    assert p.progress.progress == 8 and p.progress.location == 2
    # defaults match the reference's (Unspecified/PrivateServingLocal)
    pd = round_trip(cc.Progress())
    assert pd.progress.progress == 0 and pd.progress.location == 1
    st = round_trip(cc.CCStatus(cc.Cause(value=98), call_state=10))
    assert st.cause.value == 98 and st.call_state == 10


def test_parse_l3_preserves_cc_ti():
    """parse_l3 must carry the TI nibble through (GSM 04.07
    11.2.3.1.3): the MOC FSM keys its downlink TI off the parsed
    Setup's TI value."""
    s = cc.Setup()
    s.ti = 0x0D  # flag 1, value 5
    out = parse_l3(s.encode())
    assert out.ti == 0x0D
    h = cc.Hold()
    h.ti = 0x02
    assert parse_l3(h.encode()).ti == 0x02


def test_mm_information_short_name():
    """MMInformation carries the 7-bit-packed network short name
    (L3MMInformation + L3NetworkName, GSML3MMMessages.cpp:268,
    GSML3MMElements.cpp)."""
    m = round_trip(mm.MMInformation("TestNet"))
    assert m.short_name == "TestNet"
    # lengths that exercise every spare-bit count mod 8
    for name in ("AB", "Range", "OpenBTS", "Network09", "x" * 17):
        assert round_trip(mm.MMInformation(name)).short_name == name
    # the lengthV>1 gate: trivial names produce an empty body
    empty = mm.MMInformation("A")
    assert len(empty.encode()) == 16  # header only
    assert round_trip(mm.MMInformation("")).short_name == ""


def test_parse_l3_unknown_returns_none():
    bits = np.zeros(24, np.uint8)
    bits[4:8] = [0, 1, 1, 1]  # PD=7 (unassigned here)
    assert parse_l3(bits) is None


def test_si1_si2_si4():
    si1 = rr.SystemInformationType1(
        rr.CellChannelDescription((1, 50, 124)),
        rr.RACHControlParameters(max_retrans=3))
    out = round_trip(si1)
    assert out.cell_channels.arfcns == (1, 50, 124)
    assert out.rach.max_retrans == 3

    si2 = rr.SystemInformationType2(
        rr.CellChannelDescription((10, 20)), ncc_permitted=0x55)
    out = round_trip(si2)
    assert out.neighbors.arfcns == (10, 20)
    assert out.ncc_permitted == 0x55

    si4 = rr.SystemInformationType4(common.LAI("234", "15", 5),
                                    ms_txpwr_max_cch=9,
                                    rxlev_access_min=7)
    out = round_trip(si4)
    assert out.lai.lac == 5 and out.ms_txpwr_max_cch == 9
    assert out.rxlev_access_min == 7


def test_measurement_report():
    m = rr.MeasurementReport(rxlev_full=45, rxlev_sub=40, rxqual_full=2,
                             rxqual_sub=1, dtx_used=1)
    out = round_trip(m)
    assert out.rxlev_full == 45 and out.rxlev_sub == 40
    assert out.rxqual_full == 2 and out.rxqual_sub == 1
    assert out.dtx_used == 1


def test_mode_modify_and_rr_status_round_trip():
    """The very-early-assignment RR set: ChannelModeModify/Ack,
    AssignmentFailure, RRStatus (GSML3RRMessages.h:654,678,703,731)."""
    cmm = rr.ChannelModeModify(
        rr.ChannelDescription(type_and_offset=1, tn=5, tsc=3, arfcn=77),
        rr.ChannelMode.SpeechV1)
    out = round_trip(cmm)
    assert out.channel.tn == 5 and out.channel.tsc == 3
    assert out.channel.arfcn == 77
    assert out.mode == rr.ChannelMode.SpeechV1

    ack = rr.ChannelModeModifyAcknowledge(
        rr.ChannelDescription(type_and_offset=1, tn=5),
        rr.ChannelMode.SpeechV1)
    out = round_trip(ack)
    assert out.mode == rr.ChannelMode.SpeechV1 and out.channel.tn == 5

    fail = round_trip(rr.AssignmentFailure(cause=0x06))
    assert fail.cause == 0x06

    status = round_trip(rr.RRStatus(cause=0x62))
    assert status.cause == 0x62
