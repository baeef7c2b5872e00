import numpy as np
import pytest

from openbts_ttsou_tpu.control.common import (
    Q931CallState,
    ServiceType,
    TMSITable,
    TransactionTable,
)
from openbts_ttsou_tpu.control.hlr import AsteriskHLR, HLRCache, LocalHLR
from openbts_ttsou_tpu.control.procedures import ControlLayer
from openbts_ttsou_tpu.gsm.btsconfig import BTSConfig
from openbts_ttsou_tpu.gsm.l3 import cc, common, mm, parse_l3, rr
from openbts_ttsou_tpu.gsm.transfer import L3Frame, Primitive
from openbts_ttsou_tpu.sip.message import SIPMessage, make_response
from openbts_ttsou_tpu.utils.gsm_time import Time

IMSI = "001010123456789"


class FakeChannel:
    def __init__(self, tn=1):
        class L1:
            pass

        self.l1 = L1()
        self.l1.tn = tn
        self.l1.subchannel = 0
        self.sent = []
        self.opened_at = None

    def send(self, l3, sapi=0):
        self.sent.append((l3, sapi))

    def open(self, fn=0):
        self.opened_at = fn

    def pop_l3(self):
        l3, sapi = self.sent.pop(0)
        return parse_l3(l3.bits), sapi


@pytest.fixture
def layer():
    sip_out = []
    bts = BTSConfig()
    ctl = ControlLayer(bts, sip_send=sip_out.append)
    ctl._sip_out = sip_out
    return ctl


def _attach_sdcch(ctl, n=1):
    chans = [FakeChannel() for _ in range(n)]
    for ch in chans:
        ctl.bts.add_sdcch(ch)
    return chans


def test_access_grant_and_congestion(layer):
    chans = _attach_sdcch(layer, 1)
    ch = layer.handle_rach(0x42, Time(5000, 0), -60, 1.2)
    assert ch is chans[0]
    assert ch.opened_at == 5000
    agch = layer.bts.next_ccch_frame()
    msg = parse_l3(agch.bits)
    assert isinstance(msg, rr.ImmediateAssignment)
    assert msg.reference.ra == 0x42
    assert msg.timing_advance == 1
    # pool exhausted → reject with growing T3122
    t0 = layer.bts.t3122()
    assert layer.handle_rach(0x43, Time(5001, 0), -60, 0) is None
    rej = parse_l3(layer.bts.next_ccch_frame().bits)
    assert isinstance(rej, rr.ImmediateAssignmentReject)
    assert layer.bts.t3122() >= t0


def test_location_update_accept_flow(layer):
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    lur = mm.LocationUpdatingRequest(
        layer.bts.lai(), common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, lur.encode())
    # a REGISTER went out
    reg = SIPMessage.parse(layer._sip_out.pop())
    assert reg.method == "REGISTER"
    assert f"IMSI{IMSI}" in (reg.get("from") or "")
    # registrar accepts
    t = layer.transactions.entries()[0]
    layer.on_sip_response(t, ch, make_response(reg, 200, "OK"))
    acc, _ = ch.pop_l3()
    assert isinstance(acc, mm.LocationUpdatingAccept)
    assert acc.identity is not None  # TMSI assigned
    assert layer.tmsis.imsi(acc.identity.tmsi) == IMSI
    rel, _ = ch.pop_l3()
    assert isinstance(rel, rr.ChannelRelease)
    assert layer.transactions.size() == 0


def test_location_update_reject_flow(layer):
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    lur = mm.LocationUpdatingRequest(
        layer.bts.lai(), common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, lur.encode())
    reg = SIPMessage.parse(layer._sip_out.pop())
    t = layer.transactions.entries()[0]
    layer.on_sip_response(t, ch, make_response(reg, 404, "Not Found"))
    rej, _ = ch.pop_l3()
    assert isinstance(rej, mm.LocationUpdatingReject)


def test_moc_call_flow(layer):
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    req = mm.CMServiceRequest(service_type=1,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, req.encode())
    acc, _ = ch.pop_l3()
    assert isinstance(acc, mm.CMServiceAccept)
    setup = cc.Setup(cc.CalledPartyBCDNumber("2125551212"))
    setup.ti = 0x0  # MS-originated TI 0
    layer.dispatch_l3(ch, setup.encode())
    proc, _ = ch.pop_l3()
    assert isinstance(proc, cc.CallProceeding)
    invite = SIPMessage.parse(layer._sip_out.pop())
    assert invite.method == "INVITE"
    assert "2125551212" in invite.uri
    t = layer.transactions.entries()[0]
    assert t.state == Q931CallState.MOCProceeding
    # 180 → Alerting
    layer.on_sip_response(t, ch, make_response(invite, 180, "Ringing",
                                               to_tag="x"))
    alert, _ = ch.pop_l3()
    assert isinstance(alert, cc.Alerting)
    # 200 → ACK + Connect
    from openbts_ttsou_tpu.sip.message import make_sdp

    ok = make_response(invite, 200, "OK", to_tag="x",
                       body=make_sdp("127.0.0.1", 12345))
    layer.on_sip_response(t, ch, ok)
    ack = SIPMessage.parse(layer._sip_out.pop())
    assert ack.method == "ACK"
    conn, _ = ch.pop_l3()
    assert isinstance(conn, cc.Connect)
    assert t.state == Q931CallState.ConnectIndication
    # MS hangs up
    layer.dispatch_l3(ch, cc.Disconnect().encode())
    rel, _ = ch.pop_l3()
    assert isinstance(rel, cc.Release)
    bye = SIPMessage.parse(layer._sip_out.pop())
    assert bye.method == "BYE"
    layer.dispatch_l3(ch, cc.ReleaseComplete().encode())
    assert layer.transactions.size() == 0


def test_mtc_paging_flow(layer):
    (ch,) = _attach_sdcch(layer)
    t = layer.initiate_mtc(IMSI, calling="5551000")
    assert t.state == Q931CallState.Paging
    layer.page_tick()
    page = parse_l3(layer.bts.next_ccch_frame().bits)
    assert isinstance(page, rr.PagingRequestType1)
    # MS responds on the allocated channel
    layer.bts.get_sdcch()
    resp = rr.PagingResponse(common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, resp.encode())
    setup, _ = ch.pop_l3()
    assert isinstance(setup, cc.Setup)
    assert setup.called.digits == "5551000"
    assert t.state == Q931CallState.CallPresent


def test_mo_sms_flow(layer):
    from openbts_ttsou_tpu.sms import messages as sms_m

    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    req = mm.CMServiceRequest(service_type=4,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, req.encode())
    ch.sent.clear()
    tl = sms_m.TLSubmit(mr=0, dest="411", text="hi")
    rp = sms_m.RPData(reference=1, dest="170", tpdu=tl.encode(), mo=True)
    cp = sms_m.CPData(ti=0, rpdu=rp.encode())
    layer.handle_sms_cpdata(ch, cp.encode())
    msg = SIPMessage.parse(layer._sip_out.pop())
    assert msg.method == "MESSAGE" and msg.body == "hi"
    t = layer.transactions.entries()[0]
    layer.on_sip_response(t, ch, make_response(msg, 200, "OK"))
    # RP-ACK wrapped in CP-DATA on SAPI 3 (a CP-ACK for the MO
    # CP-DATA precedes it on the same SAP)
    datas = [l3 for (l3, sapi) in ch.sent
             if sapi == 3 and len(l3.bits)
             and isinstance(sms_m.parse_cp(
                 np.packbits(l3.bits).tobytes()), sms_m.CPData)]
    cp2 = sms_m.parse_cp(np.packbits(datas[-1].bits).tobytes())
    rp2 = sms_m.parse_rp(cp2.rpdu)
    assert isinstance(rp2, sms_m.RPAck)


def test_mt_sms_delivery(layer):
    from openbts_ttsou_tpu.sms import messages as sms_m

    (ch,) = _attach_sdcch(layer)
    t = layer.initiate_mtsms(IMSI, "5552000", "wake up")
    layer.bts.get_sdcch()
    resp = rr.PagingResponse(common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, resp.encode())
    # first an ESTABLISH on SAPI 3, then the CP-DATA
    est = ch.sent[0]
    assert est[1] == 3 and len(est[0].bits) == 0
    (l3, sapi) = ch.sent[1]
    assert sapi == 3
    cp = sms_m.parse_cp(np.packbits(l3.bits).tobytes())
    rp = sms_m.parse_rp(cp.rpdu)
    tl = sms_m.TLDeliver.parse(rp.tpdu)
    assert tl.text == "wake up" and tl.orig == "5552000"


def test_hlr_implementations(tmp_path):
    local = LocalHLR()
    local.add_user(IMSI, "5551000")
    assert local.get_clid(IMSI) == "5551000"
    assert local.get_imsi("5551000") == IMSI

    sip_conf = tmp_path / "sip.conf"
    ext_conf = tmp_path / "extensions.conf"
    sip_conf.write_text("")
    ext_conf.write_text("")
    ast = AsteriskHLR(str(sip_conf), str(ext_conf))
    ast.add_user(IMSI, "5551000")
    assert ast.get_clid(IMSI) == "5551000"
    assert ast.get_imsi("5551000") == IMSI
    # idempotent
    ast.add_user(IMSI, "5551000")
    assert sip_conf.read_text().count(f"[{IMSI}]") == 1

    cache = HLRCache(ast, ttl_s=60)
    assert cache.get_clid(IMSI) == "5551000"
    assert cache.get_clid(IMSI) == "5551000"  # cached


def test_tmsi_table_dump_restore(tmp_path):
    t = TMSITable()
    tmsi = t.assign(IMSI)
    assert t.assign(IMSI) == tmsi  # stable
    path = tmp_path / "tmsis.txt"
    t.dump(str(path))
    t2 = TMSITable()
    t2.restore(str(path))
    assert t2.imsi(tmsi) == IMSI


def test_voice_pump_round_trip():
    from openbts_ttsou_tpu.control.voice import (
        VoicePump,
        payload_to_rtp,
        rtp_to_payload,
    )

    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, 260).astype(np.uint8)
    frame = payload_to_rtp(bits)
    assert len(frame) == 33
    back = rtp_to_payload(frame)
    np.testing.assert_array_equal(back, bits)
    assert rtp_to_payload(b"\x00" * 33) is None  # bad signature

    class FakeTCH:
        def __init__(self):
            import collections

            self.speech_out = collections.deque()
            self.sent = []

        def send_tch(self, p):
            self.sent.append(p)

    class FakeEngine:
        def __init__(self):
            self.txed = []
            self.rx_queue = []

        def tx_frame(self, f):
            self.txed.append(f)

        def rx_frame(self):
            return self.rx_queue.pop(0) if self.rx_queue else None

    tch, eng = FakeTCH(), FakeEngine()
    pump = VoicePump(tch, eng)
    tch.speech_out.append(bits)
    eng.rx_queue.append(payload_to_rtp(bits))
    moved = pump.pump()
    assert moved == 2
    assert len(eng.txed) == 1 and rtp_to_payload(eng.txed[0]) is not None
    np.testing.assert_array_equal(tch.sent[0], bits)


def test_moc_with_tch_assignment(layer):
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()

    class FakeTCH:
        tn = 2

        def __init__(self):
            self.opened = None

        def open(self, fn):
            self.opened = fn

        def close(self):
            pass

    tch = FakeTCH()
    layer.bts.add_tch(tch)
    req = mm.CMServiceRequest(service_type=1,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, req.encode())
    ch.sent.clear()
    setup = cc.Setup(cc.CalledPartyBCDNumber("911"))
    layer.dispatch_l3(ch, setup.encode())
    proc, _ = ch.pop_l3()
    assert isinstance(proc, cc.CallProceeding)
    cmd, _ = ch.pop_l3()
    assert isinstance(cmd, rr.AssignmentCommand)
    assert cmd.channel.tn == 2 and cmd.channel.type_and_offset == 1
    # MS confirms the assignment
    layer.dispatch_l3(ch, rr.AssignmentComplete().encode())
    assert tch.opened is not None
    assert layer.bts.tch_available() == 0
    # teardown releases the TCH
    layer.dispatch_l3(ch, cc.Disconnect().encode())
    layer.dispatch_l3(ch, cc.ReleaseComplete().encode())
    assert layer.bts.tch_available() == 1


def test_dtmf_relay(layer):
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    req = mm.CMServiceRequest(service_type=1,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, req.encode())
    setup = cc.Setup(cc.CalledPartyBCDNumber("100"))
    layer.dispatch_l3(ch, setup.encode())
    layer._sip_out.clear()
    ch.sent.clear()
    layer.dispatch_l3(ch, cc.StartDTMF("7").encode())
    info = SIPMessage.parse(layer._sip_out.pop())
    assert info.method == "INFO"
    assert "Signal=7" in info.body
    ack, _ = ch.pop_l3()
    assert isinstance(ack, cc.StartDTMFAck) and ack.key == "7"
    layer.dispatch_l3(ch, cc.StopDTMF().encode())
    ack2, _ = ch.pop_l3()
    assert isinstance(ack2, cc.StopDTMFAck)


def test_si_rotation():
    bts = BTSConfig()
    from openbts_ttsou_tpu.gsm.l3 import parse_l3 as p3

    kinds = [type(p3(bts.si_frame_for_tc(tc).bits)).__name__
             for tc in range(8)]
    assert kinds == ["SystemInformationType1", "SystemInformationType2",
                     "SystemInformationType3", "SystemInformationType4",
                     "SystemInformationType3", "SystemInformationType2",
                     "SystemInformationType3", "SystemInformationType4"]


def test_emergency_call_routes_to_dispatch(layer):
    (ch,) = _attach_sdcch(layer)
    req = mm.CMServiceRequest(service_type=8,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, req.encode())
    t = layer.transactions.entries()[-1]
    assert t.service.name == "EmergencyCall"
    setup = cc.Setup(cc.CalledPartyBCDNumber("5551234"))
    layer.dispatch_l3(ch, setup.encode())
    assert t.called == "911"  # dialed digits overridden
    msg = SIPMessage.parse(layer._sip_out.pop(0))
    assert msg.method == "INVITE" and "911" in msg.uri


def test_emergency_setup_mti_routes_to_dispatch(layer):
    """An MS using the EmergencySetup MTI (GSM 04.08 9.3.8) — not a
    plain Setup — must still reach the emergency dispatch number
    (E-MOC, CallControl.cpp:1020-1060)."""
    (ch,) = _attach_sdcch(layer)
    layer.bts.config.set("PBX.Emergency", "112")
    req = mm.CMServiceRequest(service_type=8,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, req.encode())
    ch.sent.clear()
    es = cc.EmergencySetup()
    es.ti = 0x05  # MS TI value 5
    layer.dispatch_l3(ch, es.encode())
    t = layer.transactions.entries()[-1]
    assert t.service == ServiceType.EmergencyCall
    assert t.called == "112" and t.ti_value == 5
    proc, _ = ch.pop_l3()
    assert isinstance(proc, cc.CallProceeding)
    assert proc.ti == (1 << 3) | 5  # downlink flag flipped
    msg = SIPMessage.parse(layer._sip_out.pop(0))
    assert msg.method == "INVITE" and "112" in msg.uri


def test_hold_rejected_during_call(layer):
    """An in-call Hold gets HoldReject cause 0x3f, not silence
    (CallControl.cpp:356-360)."""
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    req = mm.CMServiceRequest(service_type=1,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, req.encode())
    setup = cc.Setup(cc.CalledPartyBCDNumber("2125551212"))
    setup.ti = 0x03  # MS TI value 3
    layer.dispatch_l3(ch, setup.encode())
    ch.sent.clear()
    hold = cc.Hold()
    hold.ti = 0x03
    layer.dispatch_l3(ch, hold.encode())
    rej, _ = ch.pop_l3()
    assert isinstance(rej, cc.HoldReject)
    assert rej.cause.value == 0x3F
    assert rej.ti == (1 << 3) | 3  # MO transaction: downlink flag 1
    # the call FSM is untouched
    t = layer.transactions.entries()[-1]
    assert t.state == Q931CallState.MOCProceeding


def test_cc_status_logged_not_fatal(layer):
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    req = mm.CMServiceRequest(service_type=1,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, req.encode())
    layer.dispatch_l3(
        ch, cc.Setup(cc.CalledPartyBCDNumber("5551212")).encode())
    n = layer.transactions.size()
    layer.dispatch_l3(ch, cc.CCStatus(cc.Cause(value=98),
                                      call_state=10).encode())
    assert layer.transactions.size() == n  # nothing torn down


def test_progress_sent_on_sip_proceeding(layer):
    """SIP 100 Trying during MOC setup → L3 Progress downlink (the
    early-media leg, CallControl.cpp:739)."""
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    req = mm.CMServiceRequest(service_type=1,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, req.encode())
    setup = cc.Setup(cc.CalledPartyBCDNumber("2125551212"))
    setup.ti = 0x01
    layer.dispatch_l3(ch, setup.encode())
    invite = SIPMessage.parse(layer._sip_out.pop())
    ch.sent.clear()
    t = layer.transactions.entries()[-1]
    layer.on_sip_response(t, ch, make_response(invite, 100, "Trying"))
    prog, _ = ch.pop_l3()
    assert isinstance(prog, cc.Progress)
    assert prog.ti == (1 << 3) | 1
    assert t.state == Q931CallState.MOCProceeding
    # ringing still follows normally
    layer.on_sip_response(t, ch, make_response(invite, 180, "Ringing",
                                               to_tag="x"))
    alert, _ = ch.pop_l3()
    assert isinstance(alert, cc.Alerting)


def test_shortname_delivered_after_lur(layer):
    """The `shortname` config is actually transmitted: MMInformation
    precedes LocationUpdatingAccept (MobilityManagement.cpp:203)."""
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    layer.bts.config.set("GSM.ShortName", "TestNet")
    lur = mm.LocationUpdatingRequest(
        layer.bts.lai(), common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(ch, lur.encode())
    reg = SIPMessage.parse(layer._sip_out.pop())
    t = layer.transactions.entries()[0]
    layer.on_sip_response(t, ch, make_response(reg, 200, "OK"))
    info, _ = ch.pop_l3()
    assert isinstance(info, mm.MMInformation)
    assert info.short_name == "TestNet"
    acc, _ = ch.pop_l3()
    assert isinstance(acc, mm.LocationUpdatingAccept)


def test_mtc_downlink_ti_flag_is_zero(layer):
    """Network-originated transactions carry downlink TI flag 0 (GSM
    04.07 11.2.3.1.3) — including the clearing leg."""
    (ch,) = _attach_sdcch(layer)
    t = layer.initiate_mtc(IMSI, calling="5551000")
    layer.page_tick()
    layer.dispatch_l3(ch, rr.PagingResponse(
        identity=common.MobileIdentity.imsi(IMSI)).encode())
    setup, _ = ch.pop_l3()
    assert isinstance(setup, cc.Setup)
    assert setup.ti >> 3 == 0
    # MS hangs up: the network's Release must also carry flag 0
    disc = cc.Disconnect()
    disc.ti = (1 << 3) | 0  # MS → network on a network-allocated TI
    layer.dispatch_l3(ch, disc.encode())
    rel, _ = ch.pop_l3()
    assert isinstance(rel, cc.Release)
    assert rel.ti >> 3 == 0


class FakeTCHChannel(FakeChannel):
    """A fake dedicated TCH/F (FACCH signalling) for very-early flows."""

    is_tch = True

    def __init__(self, tn=2):
        super().__init__(tn)
        self.tn = tn

    def close(self):
        pass


def test_veryearly_moc_mode_modify(layer):
    """Very-early assignment MOC: the call starts on a TCH/F and the
    network must switch it to speech mode with ChannelModeModify,
    blocking on the acknowledge (MOCStarter veryEarly,
    CallControl.cpp:666-680)."""
    layer.bts.config.set("GSM.AssignmentType", "veryearly")
    tch = FakeTCHChannel()
    layer.bts.add_tch(tch)
    ch = layer.handle_rach(0x21, Time(9000, 0), -60, 0.0)
    assert ch is tch, "veryearly access grant must allocate the TCH"
    ia = parse_l3(layer.bts.next_ccch_frame().bits)
    assert ia.channel.type_and_offset == 1  # TCH/F channel type

    req = mm.CMServiceRequest(service_type=1,
                              identity=common.MobileIdentity.imsi(IMSI))
    layer.dispatch_l3(tch, req.encode())
    tch.sent.clear()
    layer.dispatch_l3(
        tch, cc.Setup(cc.CalledPartyBCDNumber("2125559999")).encode())
    proc, _ = tch.pop_l3()
    assert isinstance(proc, cc.CallProceeding)
    cmm, _ = tch.pop_l3()
    assert isinstance(cmm, rr.ChannelModeModify)
    assert cmm.mode == rr.ChannelMode.SpeechV1
    assert cmm.channel.type_and_offset == 1 and cmm.channel.tn == tch.tn
    assert not tch.sent  # network waits for the acknowledge

    t = layer.transactions.entries()[-1]
    assert t.pending_mode == rr.ChannelMode.SpeechV1
    layer.dispatch_l3(tch, rr.ChannelModeModifyAcknowledge(
        cmm.channel, rr.ChannelMode.SpeechV1).encode())
    assert t.pending_mode is None
    assert getattr(t, "tch", None) is tch
    assert not any(isinstance(parse_l3(l3.bits), cc.Disconnect)
                   for l3, _ in tch.sent)


def test_veryearly_mode_modify_refused_aborts(layer):
    """A mismatched mode in the acknowledge aborts the call with cause
    0x06 "channel unacceptable" (CallControl.cpp:676-680)."""
    layer.bts.config.set("GSM.AssignmentType", "veryearly")
    tch = FakeTCHChannel()
    layer.bts.add_tch(tch)
    assert layer.handle_rach(0x22, Time(9100, 0), -60, 0.0) is tch
    layer.dispatch_l3(tch, mm.CMServiceRequest(
        service_type=1,
        identity=common.MobileIdentity.imsi(IMSI)).encode())
    layer.dispatch_l3(
        tch, cc.Setup(cc.CalledPartyBCDNumber("100")).encode())
    tch.sent.clear()
    layer.dispatch_l3(tch, rr.ChannelModeModifyAcknowledge(
        mode=rr.ChannelMode.SignallingOnly).encode())
    disc, _ = tch.pop_l3()
    assert isinstance(disc, cc.Disconnect)
    assert disc.cause.value == 0x06


def test_assignment_failure_reclaims_tch(layer):
    """L3 Assignment Failure: the MS stayed on the old channel — the
    reserved TCH returns to the pool and the call aborts
    (L3AssignmentFailure, GSML3RRMessages.h:654)."""
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()

    tch = FakeTCHChannel()
    layer.bts.add_tch(tch)
    layer.dispatch_l3(ch, mm.CMServiceRequest(
        service_type=1,
        identity=common.MobileIdentity.imsi(IMSI)).encode())
    layer.dispatch_l3(
        ch, cc.Setup(cc.CalledPartyBCDNumber("8005550000")).encode())
    assert layer.bts.tch_available() == 0  # reserved by AssignmentCommand
    ch.sent.clear()
    layer.dispatch_l3(ch, rr.AssignmentFailure(cause=0x01).encode())
    assert layer.bts.tch_available() == 1, "TCH not reclaimed"
    disc, _ = ch.pop_l3()
    assert isinstance(disc, cc.Disconnect) and disc.cause.value == 0x06


def test_rr_status_is_logged_not_fatal(layer):
    (ch,) = _attach_sdcch(layer)
    layer.bts.get_sdcch()
    layer.dispatch_l3(ch, mm.CMServiceRequest(
        service_type=1,
        identity=common.MobileIdentity.imsi(IMSI)).encode())
    n = layer.transactions.size()
    layer.dispatch_l3(ch, rr.RRStatus(cause=0x62).encode())
    assert layer.transactions.size() == n  # nothing torn down


def test_veryearly_mtc_mode_modify_after_call_confirmed(layer):
    """MTC very-early ordering (MTCStarter, CallControl.cpp:850-896):
    Setup goes out first; the mode-set exchange runs only after the MS
    answers with Call Confirmed (GSM 04.08 9.3.2)."""
    layer.bts.config.set("GSM.AssignmentType", "veryearly")
    tch = FakeTCHChannel()
    layer.bts.add_tch(tch)
    t = layer.initiate_mtc(IMSI, calling="5551000")
    layer.bts.get_tch()  # page answer grants the TCH (simulated)
    layer._bind(tch, t)
    layer.paging_response(
        tch, rr.PagingResponse(common.MobileIdentity.imsi(IMSI)))
    kinds = [type(parse_l3(l3.bits)).__name__ for l3, _ in tch.sent]
    assert "Setup" in kinds
    assert "ChannelModeModify" not in kinds, \
        "mode modify must wait for Call Confirmed"
    tch.sent.clear()
    layer.dispatch_l3(tch, cc.CallConfirmed().encode())
    cmm, _ = tch.pop_l3()
    assert isinstance(cmm, rr.ChannelModeModify)
    assert t.state == Q931CallState.MTCConfirmed
    layer.dispatch_l3(tch, rr.ChannelModeModifyAcknowledge(
        cmm.channel, cmm.mode).encode())
    assert t.pending_mode is None
    layer.bts.config.set("GSM.AssignmentType", "early")


def test_deferred_release_tracks_drain_progress(layer):
    """The T3111 drain deadline bounds a VANISHED MS, not a live one:
    queue progress (acks arriving at LAPDm pace) restarts the clock,
    while a frozen queue hard-releases at the deadline (GSM 04.08
    11.1.2; Control restarts on tx_depth() movement)."""

    class SlowChannel(FakeChannel):
        """Drains one queued frame every `ack_every` frames — the
        51-multiframe ack cadence of a real SDCCH — or never."""

        def __init__(self, depth, ack_every=None):
            super().__init__()
            self.l1.active = True
            self.depth = depth
            self.ack_every = ack_every
            self.reset_called = False
            self._t0 = None

        def tx_drained(self):
            return self.depth == 0

        def tx_depth(self):
            return self.depth

        def step_to(self, fn):
            if self.ack_every and self._t0 is None:
                self._t0 = fn
            if self.ack_every and self.depth and \
                    fn - self._t0 >= self.ack_every:
                self._t0 = fn
                self.depth -= 1

        def reset(self):
            self.reset_called = True

    layer.bts.config.set("GSM.Timer.T3111", "500")  # ~108 frames
    t3111 = int(500 / 4.615)

    # live MS: acks every 51 frames < deadline -> never wiped, drains
    live = SlowChannel(depth=3, ack_every=51)
    layer.bts.add_sdcch(live)
    layer.bts.get_sdcch()
    layer._release_channel(live)
    assert id(live) in layer.pending_release
    for fn in range(0, 400, 10):
        layer.bts.clock.set_fn(fn)
        live.step_to(fn)
        layer.release_tick()
    assert live.depth == 0
    assert id(live) not in layer.pending_release
    assert live.reset_called  # clean hard release AFTER drain

    # vanished MS: depth frozen -> hard release once T3111 passes
    dead = SlowChannel(depth=2, ack_every=None)
    layer.bts.add_sdcch(dead)
    layer.bts.get_sdcch()
    layer.bts.clock.set_fn(1000)
    layer._release_channel(dead)
    layer.bts.clock.set_fn(1000 + t3111 // 2)
    layer.release_tick()
    assert id(dead) in layer.pending_release  # deadline not yet
    layer.bts.clock.set_fn(1000 + t3111 + 10)
    layer.release_tick()
    assert id(dead) not in layer.pending_release
    assert dead.reset_called and dead.depth == 2  # wiped, not drained
