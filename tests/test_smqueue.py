import time

import pytest

from openbts_ttsou_tpu.sip.message import SIPMessage, make_request
from openbts_ttsou_tpu.smqueue import SMq, ShortMsgState
from openbts_ttsou_tpu.smqueue.queue import (
    INITIAL_STATE,
    STATE_TIMEOUTS,
    sm_state_name,
)


@pytest.fixture
def smq():
    sent = []
    registry = {"2001": "2001", "2002": "2002"}
    q = SMq(send=lambda to, req: sent.append((to, req)),
            resolve=lambda user: registry.get(user))
    q._sent = sent
    q._registry = registry
    return q


def drive(smq, now, n=4):
    """Advance the queue n state transitions (one per call, like the
    reference's one-action-per-pop main_loop)."""
    for _ in range(n):
        smq.process_queue(now)


def test_state_set_matches_reference():
    # the 16 states of smqueue.h:59-83
    assert len(ShortMsgState) == 16
    assert INITIAL_STATE == ShortMsgState.RequestFromAddressLookup
    assert sm_state_name(ShortMsgState.DeleteMeState) == "DeleteMeState"
    # every ASKED/AWAITING state has a timeout row falling back to a
    # REQUEST/RegisterHandset state
    for st, (timeout, nxt) in STATE_TIMEOUTS.items():
        assert timeout > 0
        assert nxt.name.startswith(("Request", "RegisterHandset"))


def test_timeout_table_matches_reference():
    """Spot-audit of the full 16×16 transition-timeout table against
    the reference values (smqueue.cpp:46-120; NT=6000, RT=600)."""
    from openbts_ttsou_tpu.smqueue.queue import NT, RT, TIMEOUTS

    S = ShortMsgState
    assert NT == 6000 and RT == 600
    # RequestFromAddressLookup row: →AF 10, →WR 1, →RH 0
    assert TIMEOUTS[S.RequestFromAddressLookup][
        S.AskedForFromAddressLookup] == 10
    assert TIMEOUTS[S.RequestFromAddressLookup][
        S.AwaitingRegisterHandset] == 1
    assert TIMEOUTS[S.RequestFromAddressLookup][S.RegisterHandset] == 0
    # AskedForFromAddressLookup: retry RF after 60 s
    assert TIMEOUTS[S.AskedForFromAddressLookup][
        S.RequestFromAddressLookup] == 60
    # delivery cluster: RM→AM 15, RM→{WM,RM,RS} 75; AM→WM 60, AM→RM 10
    assert TIMEOUTS[S.RequestMsgDelivery][S.AskedForMsgDelivery] == 15
    assert TIMEOUTS[S.RequestMsgDelivery][S.AwaitingTryMsgDelivery] == 75
    assert TIMEOUTS[S.RequestMsgDelivery][S.RequestMsgDelivery] == 75
    assert TIMEOUTS[S.RequestMsgDelivery][S.RequestDestinationSipUrl] == 75
    assert TIMEOUTS[S.AskedForMsgDelivery][S.AwaitingTryMsgDelivery] == 60
    assert TIMEOUTS[S.AskedForMsgDelivery][S.RequestMsgDelivery] == 10
    # registration cluster: RH→AR 2, AR→AR 10, WR→RH 0
    assert TIMEOUTS[S.RegisterHandset][S.AskedToRegisterHandset] == 2
    assert TIMEOUTS[S.AskedToRegisterHandset][
        S.AskedToRegisterHandset] == 10
    assert TIMEOUTS[S.AwaitingRegisterHandset][S.RegisterHandset] == 0
    # DeleteMe row is all-zero; error retries go through RT
    assert all(v == 0 for v in TIMEOUTS[S.DeleteMeState])
    assert TIMEOUTS[S.AwaitingTryDestinationImsi][
        S.RequestFromAddressLookup] == RT


def test_submit_and_deliver(smq):
    m = smq.submit("1001", "2001", "hello")
    assert m.state == INITIAL_STATE
    now = time.monotonic() + 0.01
    assert smq.queue_size() == 1
    drive(smq, now)  # from-lookup → imsi → sipurl → send
    assert len(smq._sent) == 1
    to, rendered = smq._sent[0]
    assert to == "2001"
    req = SIPMessage.parse(rendered.encode())
    assert req.method == "MESSAGE" and req.body == "hello"
    assert m.state == ShortMsgState.AskedForMsgDelivery
    assert m.dest_imsi == "2001"
    # destination acks
    smq.handle_delivery_response(m.call_id, 200)
    assert len(smq.delivered) == 1
    assert m.state == ShortMsgState.DeleteMeState
    smq.process_queue(time.monotonic() + 0.01)
    assert smq.queue_size() == 0


def test_unknown_destination_retries_then_fails(smq):
    m = smq.submit("1001", "9999", "void")
    now = time.monotonic() + 0.01
    step = STATE_TIMEOUTS[ShortMsgState.AwaitingTryDestinationImsi][0]
    for i in range(smq.MAX_RETRIES + 2):
        smq.process_queue(now + i * (step + 1))
    assert m.state == ShortMsgState.DeleteMeState
    assert len(smq.failed) == 1


def test_delivery_timeout_retries(smq):
    m = smq.submit("1001", "2002", "slow")
    now = time.monotonic() + 0.01
    drive(smq, now)
    assert len(smq._sent) == 1
    # no ack → timeout → falls back to RequestMsgDelivery, which the
    # reference re-arms with a 10 s retry delay (TIMEOUTS[AM][RM] = 10,
    # smqueue.cpp:83-84) → resend only after that delay passes
    timeout = STATE_TIMEOUTS[ShortMsgState.AskedForMsgDelivery][0]
    drive(smq, now + timeout + 1)
    assert m.state == ShortMsgState.RequestMsgDelivery
    assert len(smq._sent) == 1  # retry delay still pending
    drive(smq, now + timeout + 1 + 10 + 1, n=2)
    assert len(smq._sent) == 2
    assert m.retries == 1
    assert m.state == ShortMsgState.AskedForMsgDelivery


def test_failure_response_triggers_retry(smq):
    m = smq.submit("1001", "2001", "x")
    now = time.monotonic() + 0.01
    drive(smq, now)
    smq.handle_delivery_response(m.call_id, 480)
    assert m.state == ShortMsgState.RequestMsgDelivery


def test_handset_registration_flow():
    sent = []
    registry = {}
    reg_calls = []
    q = SMq(send=lambda to, req: sent.append((to, req)),
            resolve=lambda user: registry.get(user),
            register_handset=lambda user: reg_calls.append(user) or True)
    m = q.submit("1001", "3001", "welcome")
    now = time.monotonic() + 0.01
    # from-lookup → imsi lookup fails → RegisterHandset → asked
    q.process_queue(now)
    q.process_queue(now)
    q.process_queue(now)
    assert m.state == ShortMsgState.AskedToRegisterHandset
    assert reg_calls == ["3001"]
    # registration completes; destination becomes resolvable
    registry["3001"] = "3001"
    q.handle_registration_complete("3001", True)
    assert m.state == ShortMsgState.RequestDestinationImsi
    drive(q, time.monotonic() + 0.01)
    assert len(sent) == 1 and sent[0][0] == "3001"


def test_registration_timeout_falls_back():
    q = SMq(send=lambda to, req: None, resolve=lambda u: None,
            register_handset=lambda u: True)
    m = q.submit("1001", "3001", "hi")
    now = time.monotonic() + 0.01
    drive(q, now, n=3)
    assert m.state == ShortMsgState.AskedToRegisterHandset
    timeout = STATE_TIMEOUTS[ShortMsgState.AskedToRegisterHandset][0]
    q.process_queue(now + timeout + 1)
    assert m.state == ShortMsgState.RegisterHandset


def test_shortcode_handler(smq):
    m = smq.submit("1001", "411", "who am i")
    assert m.state == ShortMsgState.DeleteMeState
    # the canned reply was queued back toward the sender
    assert smq.queue_size() == 1
    assert smq._heap[0].to == "1001"
    assert "you are 1001" in smq._heap[0].body


def test_sip_ingress(smq):
    req = make_request("MESSAGE", "2001", "1001", "127.0.0.1", 5063,
                      "127.0.0.1", 5062, body="via sip",
                      content_type="text/plain")
    resp = smq.handle_sip_message(SIPMessage.parse(req.render()))
    assert resp.status == 200
    assert smq.queue_size() == 1
