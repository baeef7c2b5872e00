import time

import pytest

from openbts_ttsou_tpu.sip.message import SIPMessage, make_request
from openbts_ttsou_tpu.smqueue import SMq, ShortMsgState


@pytest.fixture
def smq():
    sent = []
    registry = {"2001": "2001", "2002": "2002"}
    q = SMq(send=lambda to, req: sent.append((to, req)),
            resolve=lambda user: registry.get(user))
    q._sent = sent
    q._registry = registry
    return q


def test_submit_and_deliver(smq):
    m = smq.submit("1001", "2001", "hello")
    now = time.monotonic() + 0.01
    assert smq.queue_size() == 1
    smq.process_queue(now)  # resolve → ready
    smq.process_queue(now)  # send
    assert len(smq._sent) == 1
    to, rendered = smq._sent[0]
    assert to == "2001"
    req = SIPMessage.parse(rendered.encode())
    assert req.method == "MESSAGE" and req.body == "hello"
    assert m.state == ShortMsgState.WaitingForDeliveryAck
    # destination acks
    smq.handle_delivery_response(m.call_id, 200)
    smq.process_queue(time.monotonic() + 0.01)
    assert len(smq.delivered) == 1
    assert smq.queue_size() == 0


def test_unknown_destination_retries_then_fails(smq):
    m = smq.submit("1001", "9999", "void")
    now = time.monotonic() + 0.01
    for i in range(smq.MAX_RETRIES + 1):
        smq.process_queue(now + i * (smq.RETRY_INTERVAL_S + 1))
    assert m.state == ShortMsgState.NoNotaryWhatsoever
    assert len(smq.failed) == 1


def test_delivery_timeout_retries(smq):
    m = smq.submit("1001", "2002", "slow")
    now = time.monotonic() + 0.01
    smq.process_queue(now)
    smq.process_queue(now)
    assert len(smq._sent) == 1
    # no ack → timeout → resend
    smq.process_queue(now + smq.RETRY_INTERVAL_S + 1)
    smq.process_queue(now + smq.RETRY_INTERVAL_S + 1)
    assert len(smq._sent) == 2
    assert m.retries == 1


def test_failure_response_triggers_retry(smq):
    m = smq.submit("1001", "2001", "x")
    now = time.monotonic() + 0.01
    smq.process_queue(now)
    smq.process_queue(now)
    smq.handle_delivery_response(m.call_id, 480)
    assert m.state == ShortMsgState.ReadyToSend


def test_shortcode_handler(smq):
    m = smq.submit("1001", "411", "who am i")
    assert m.state == ShortMsgState.DeleteMeState
    # the canned reply was queued back toward the sender... resolve
    # fails for 1001 (not registered) but it is in the queue
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
