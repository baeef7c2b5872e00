import numpy as np
import pytest

from openbts_ttsou_tpu.sip.engine import SIPEngine, SIPState
from openbts_ttsou_tpu.sip.message import (
    SIPMessage,
    make_request,
    make_response,
    make_sdp,
    parse_sdp_rtp,
)
from openbts_ttsou_tpu.sip.rtp import RTPSession


def test_message_render_parse_round_trip():
    m = make_request("INVITE", "2125551212", "001010123456789",
                     "127.0.0.1", 5060, "127.0.0.1", 5062,
                     body=make_sdp("127.0.0.1", 16484))
    blob = m.render()
    back = SIPMessage.parse(blob)
    assert back.method == "INVITE"
    assert back.uri == "sip:2125551212@127.0.0.1:5060"
    assert back.call_id() == m.call_id()
    assert back.cseq() == (1, "INVITE")
    host, port = parse_sdp_rtp(back.body)
    assert (host, port) == ("127.0.0.1", 16484)
    r = make_response(back, 180, "Ringing", to_tag="abc")
    rb = SIPMessage.parse(r.render())
    assert rb.status == 180 and rb.header_param("to", "tag") == "abc"


def _pair():
    """Two engines wired back-to-back through in-memory queues."""
    a_out, b_out = [], []
    a = SIPEngine("1000", "127.0.0.1", 5062, "127.0.0.1", 5060,
                  a_out.append)
    b = SIPEngine("2000", "127.0.0.1", 5060, "127.0.0.1", 5062,
                  b_out.append)
    return a, b, a_out, b_out


def test_moc_mtc_call_flow():
    a, b, a_out, b_out = _pair()
    # A invites B
    a.moc_send_invite("2000")
    invite = SIPMessage.parse(a_out.pop())
    assert invite.method == "INVITE"
    # B answers: trying, ringing, OK
    b.mtc_accept_invite(invite)
    b.mtc_send_trying()
    b.mtc_send_ringing()
    b.mtc_send_ok()
    st = None
    for blob in list(b_out):
        st = a.receive(SIPMessage.parse(blob))
    b_out.clear()
    assert st == SIPState.Connecting
    assert a.to_tag == b.to_tag
    # A acks → both active
    a.moc_send_ack()
    ack = SIPMessage.parse(a_out.pop())
    assert ack.method == "ACK"
    b.receive(ack)
    assert a.state == SIPState.Active and b.state == SIPState.Active
    # RTP ports were negotiated via SDP
    assert a.rtp is not None and b.rtp is not None
    assert a.rtp.remote == ("127.0.0.1", b.rtp.local_port)
    assert b.rtp.remote == ("127.0.0.1", a.rtp.local_port)
    # voice path end-to-end
    frame = bytes(range(33))
    a.tx_frame(frame)
    import time

    got = None
    for _ in range(50):
        got = b.rx_frame()
        if got:
            break
        time.sleep(0.01)
    assert got == frame
    # clearing: A sends BYE, B OKs
    a.mod_send_bye()
    bye = SIPMessage.parse(a_out.pop())
    assert bye.method == "BYE"
    b.receive(bye)
    a.receive(SIPMessage.parse(b_out.pop()))
    assert a.state == SIPState.Cleared and b.state == SIPState.Cleared
    a.close()
    b.close()


def test_register_flow():
    out = []
    e = SIPEngine("IMSI001010123456789", "127.0.0.1", 5062,
                  "127.0.0.1", 5060, out.append)
    e.register()
    req = SIPMessage.parse(out.pop())
    assert req.method == "REGISTER"
    assert req.get("expires") == "3600"
    assert "IMSI001010123456789" in (req.get("from") or "")
    ok = make_response(req, 200, "OK")
    e.receive(ok)
    assert e.state == SIPState.Cleared
    # unregister = expires 0
    e.unregister()
    req = SIPMessage.parse(out.pop())
    assert req.get("expires") == "0"


def test_mosms_message_flow():
    out = []
    e = SIPEngine("1000", "127.0.0.1", 5062, "127.0.0.1", 5063,
                  out.append)
    e.mosms_send_message("411", "hello world")
    req = SIPMessage.parse(out.pop())
    assert req.method == "MESSAGE"
    assert req.body == "hello world"
    assert req.get("content-type") == "text/plain"
    e.receive(make_response(req, 200, "OK"))
    assert e.state == SIPState.Cleared


def test_invite_rejection_states():
    a, b, a_out, b_out = _pair()
    a.moc_send_invite("2000")
    invite = SIPMessage.parse(a_out.pop())
    assert a.receive(make_response(invite, 486, "Busy Here")) == \
        SIPState.Busy
    a2, _, a2_out, _ = _pair()[0:1] + _pair()[1:]
    a2.moc_send_invite("2000")
    inv2 = SIPMessage.parse(a2._last_request.render())
    assert a2.receive(make_response(inv2, 404, "Not Found")) == \
        SIPState.Fail


def test_rtp_jitter_buffer_reorder_and_loss():
    """libortp's receive-side role (SIPEngine.h:268-269): frames leave
    rx_frame in sequence order through 5% loss and local reordering."""
    import time

    tx = RTPSession()
    rx = RTPSession()
    tx.connect("127.0.0.1", rx.local_port)

    n = 100
    rng = __import__("numpy").random.default_rng(4)
    frames = [bytes([0xD0 | (i >> 8), i & 0xFF]) + bytes(31)
              for i in range(n)]
    # shuffle inside windows of 3 and drop ~5%
    order = []
    for base in range(0, n, 3):
        w = list(range(base, min(base + 3, n)))
        rng.shuffle(w)
        order += w
    dropped = set(rng.choice(n, size=5, replace=False).tolist())

    # libortp-style pacing: send a small burst, drain, repeat — the
    # jitter buffer must hand frames out strictly in order
    got = []
    sent = 0
    for i, k in enumerate(order):
        if k not in dropped:
            # stamp the true sequence into tx by aligning tx.seq
            tx.seq = (100 + k) & 0xFFFF
            tx.tx_frame(frames[k])
            sent += 1
        if i % 6 == 5 or i == len(order) - 1:
            time.sleep(0.01)
            while True:
                f = rx.rx_frame()
                if f is None:
                    break
                got.append(f)
    # flush the tail (the buffer may still hold the last window)
    for _ in range(rx.jitter_depth + 1):
        f = rx.rx_frame()
        if f is not None:
            got.append(f)
    ks = [((f[0] & 0x0F) << 8) | f[1] for f in got]
    assert ks == sorted(ks), "frames delivered out of order"
    assert len(set(ks)) == len(ks), "duplicate delivery"
    assert len(ks) >= sent - rx.jitter_depth  # at most a tail in-buffer
    assert rx.loss_skips >= 1  # the gaps were skipped, not stalled on
    tx.close()
    rx.close()


def test_rtcp_reports_and_adaptive_depth():
    """RTCP SR/RR side-channel on port+1 (RFC 3550; libortp's session
    reports): the sender's SR carries packet/octet counts, the
    receiver's report block carries loss + extended-highest-seq, and
    the jitter depth adapts — deepening on loss skips, shrinking after
    a quiet spell."""
    import time

    tx = RTPSession()
    rx = RTPSession()
    tx.connect("127.0.0.1", rx.local_port)
    rx.connect("127.0.0.1", tx.local_port)

    # stream 30 frames with one dropped so the RR reports loss
    for i in range(30):
        if i == 10:
            tx.seq = (tx.seq + 1) & 0xFFFF  # simulate one lost packet
        tx.tx_frame(bytes([0xD0, i]) + bytes(31))
        if i % 5 == 4:
            time.sleep(0.005)
            while rx.rx_frame() is not None:
                pass
    while rx.rx_frame() is not None:
        pass
    assert rx.packets_received == 30

    # force the report interval and exchange RTCP both ways
    tx._last_sr_time = -1e9
    tx.rtcp_tick()
    time.sleep(0.05)
    rx._last_sr_time = -1e9
    rx.rtcp_tick()  # drains tx's SR, sends its own SR+RR
    time.sleep(0.05)
    tx.rtcp_tick()  # drains rx's report

    assert rx.rtcp_stats.get("peer_packets_sent") == 30
    assert rx.rtcp_stats.get("peer_octets_sent") == 30 * 33
    # tx heard rx's report block about its own stream: 1 lost packet
    assert tx.rtcp_stats.get("reported_cum_lost") == 1
    assert tx.rtcp_stats.get("reported_highest_seq", 0) > 0

    # adaptive depth: a loss skip deepens the buffer...
    d0 = rx.min_jitter_depth
    assert rx.loss_skips >= 1 and rx.jitter_depth > d0 - 1
    grown = rx.jitter_depth
    if grown > rx.min_jitter_depth:
        # ...and ADAPT_QUIET clean in-order frames shrink it back
        from openbts_ttsou_tpu.sip.rtp import ADAPT_QUIET

        for i in range(ADAPT_QUIET + 5):
            tx.tx_frame(bytes([0xE0, i & 0xFF]) + bytes(31))
            if i % 20 == 19:
                time.sleep(0.002)
                while rx.rx_frame() is not None:
                    pass
        while rx.rx_frame() is not None:
            pass
        assert rx.jitter_depth < grown
    tx.close()
    rx.close()
