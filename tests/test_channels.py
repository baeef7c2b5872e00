import numpy as np
import pytest

from openbts_ttsou_tpu.gsm import channels, fec, gsm610, l1fec, tdma
from openbts_ttsou_tpu.gsm.lapdm import L2LAPDm, LAPDState
from openbts_ttsou_tpu.gsm.transfer import (
    ChannelType,
    L2Frame,
    L3Frame,
    Primitive,
    RxBurst,
)
from openbts_ttsou_tpu.utils.gsm_time import Time

RNG = np.random.default_rng(91)


def make_sdcch(tn=0, sub=0):
    dl, ul = tdma.SDCCH_8[sub]
    l1 = channels.XCCHL1(tn, dl, ul)
    ch = channels.LogicalChannel(l1, sapis=(0, 3))
    ch.open(0)
    return ch


def bursts_to_l2(bursts):
    """Decode 4 TxBursts back into an L2 frame (MS-side FEC)."""
    block = np.stack([b.bits.astype(np.float32) for b in bursts])
    frames, ok = l1fec.xcch_decode(block[None])
    assert bool(np.asarray(ok)[0])
    return L2Frame(np.asarray(l1fec.lsb8msb(np.asarray(frames)[0])))


def l2_to_rxbursts(frame, mapping, fn_start):
    """Encode an MS L2 frame into uplink RxBursts on `mapping`."""
    bits = np.asarray(l1fec.lsb8msb(frame.bits))
    bursts = np.asarray(l1fec.xcch_encode(bits[None]))[0]
    out = []
    fn = fn_start
    for b in bursts:
        fn = mapping.next_write_time(fn)
        out.append(RxBurst(b.astype(np.float32), fn=fn, tn=0))
        fn += 1
    return out


def test_downlink_framing_on_mapping():
    ch = make_sdcch(sub=2)
    msg = RNG.integers(0, 2, 160).astype(np.uint8)
    ch.send(L3Frame(msg, Primitive.UNIT_DATA))
    q = list(ch.l1.tx_queue)
    assert len(q) == 4
    dl = tdma.SDCCH_8[2][0]
    for b in q:
        assert dl.reverse(b.fn) is not None  # on mapped frames
    # pop_due returns them in order
    got = ch.l1.pop_due(q[0].fn)
    assert got is not None and got.fn == q[0].fn


def test_lapdm_conversation_through_fec():
    """MS establishes over SDCCH through the full FEC chain and
    exchanges L3 data both ways (the stack of SURVEY §3.1 above L1)."""
    ch = make_sdcch(sub=0)
    ms = L2LAPDm(c=0, sapi=0)
    dl_map, ul_map = tdma.SDCCH_8[0]

    # MS → BTS: SABM
    ms.write_high_side(L3Frame(primitive=Primitive.ESTABLISH))
    fn = 0
    for f in ms.take_l1_out():
        for rb in l2_to_rxbursts(f, ul_map, fn):
            ch.write_low_side(rb)
            fn = rb.fn + 1
    est = ch.recv()
    assert est is not None and est.primitive == Primitive.ESTABLISH
    # BTS → MS: UA came back through the downlink queue
    q = []
    while ch.l1.tx_queue:
        q.append(ch.l1.tx_queue.popleft())
    assert len(q) == 4
    ms.write_low_side(bursts_to_l2(q))
    assert ms.state == LAPDState.LinkEstablished

    # BTS → MS: an L3 message as acknowledged data
    msg = RNG.integers(0, 2, 120).astype(np.uint8)
    ch.send(L3Frame(msg, Primitive.DATA))
    q = []
    while ch.l1.tx_queue:
        q.append(ch.l1.tx_queue.popleft())
    ms.write_low_side(bursts_to_l2(q))
    got = ms.read_high_side()
    assert got.primitive == Primitive.ESTABLISH or got.primitive == \
        Primitive.DATA
    if got.primitive == Primitive.ESTABLISH:
        got = ms.read_high_side()
    np.testing.assert_array_equal(got.bits, msg)

    # MS ack (RR) flows back up through the FEC
    for f in ms.take_l1_out():
        for rb in l2_to_rxbursts(f, ul_map, fn):
            ch.write_low_side(rb)
            fn = rb.fn + 1
    assert ch.l2[0].va == ch.l2[0].vs == 1


def test_rach_channel():
    hits = []
    rach = channels.RACHL1(0, bsic=21,
                           handler=lambda ra, t, r, te: hits.append((ra, t)))
    coded = np.asarray(l1fec.rach_encode(np.asarray([0x5A]),
                                         np.asarray(21)))[0]
    soft = np.full(148, 0.5, np.float32)
    soft[l1fec.RACH_DATA_START : l1fec.RACH_DATA_START + 36] = coded
    rach.write_low_side(RxBurst(soft, fn=1234, tn=0))
    assert hits == [(0x5A, Time(1234, 0))]
    # wrong BSIC colors are rejected
    rach2 = channels.RACHL1(0, bsic=22, handler=lambda *a: hits.append(a))
    rach2.write_low_side(RxBurst(soft, fn=1, tn=0))
    assert len(hits) == 1 and rach2.bad_frames == 1


def test_sch_fcch_generators():
    sch = channels.SCHL1(bsic=42)
    assert sch.generate(0) is None  # FN 0 is FCCH
    b = sch.generate(1)
    assert b is not None
    fields, ok = l1fec.sch_decode(b.bits.astype(np.float32)[None])
    assert bool(np.asarray(ok)[0])
    assert int(np.asarray(fields["bsic"])[0]) == 42
    assert int(np.asarray(fields["t2"])[0]) == 1 % 26
    fcch = channels.FCCHL1()
    fb = fcch.generate(10)
    assert fb is not None and fb.bits.sum() == 0
    assert fcch.generate(5) is None


def test_tch_speech_loopback():
    dl = ul = tdma.FACCH_TCHF
    tch = channels.TCHFACCHL1(2, dl, ul)
    tch.open(0)
    frames = [RNG.integers(0, 2, 260).astype(np.uint8) for _ in range(3)]
    for fr in frames:
        tch.send_tch(fr)
        tch.dispatch_block()
    sent = []
    while tch.tx_queue:
        sent.append(tch.tx_queue.popleft())
    assert len(sent) == 12
    for b in sent:
        tch.write_low_side(RxBurst(b.bits.astype(np.float32),
                                   fn=b.fn, tn=2))
    # blocks 1 and 2 are fully covered (block 0 lost its lead half)
    assert len(tch.speech_out) >= 2
    recovered = [gsm610.payload_to_coder(p) for p in tch.speech_out]
    targets = [gsm610.payload_to_coder(f) for f in frames]
    matches = sum(
        any(np.array_equal(r, t) for t in targets) for r in recovered)
    assert matches >= 2


def test_tch_facch_stealing():
    dl = ul = tdma.FACCH_TCHF
    tch = channels.TCHFACCHL1(1, dl, ul)
    mux = channels.SAPMux()
    mux.attach_l1(tch)
    received = []

    class FakeL2:
        def write_low_side(self, frame):
            received.append(frame)

    mux.attach_l2(FakeL2(), 0)
    tch.open(0)
    l2bits = np.zeros(184, np.uint8)
    l2bits[:24] = [0, 0, 0, 0, 0, 0, 1, 1,  # a plausible LAPDm header
                   0, 0, 0, 0, 0, 0, 1, 1,
                   0, 0, 0, 0, 0, 1, 0, 1]
    tch.send_l2(L2Frame(l2bits))
    tch.dispatch_block()  # FACCH stolen block
    tch.dispatch_block()  # filler block (delivers second half)
    sent = []
    while tch.tx_queue:
        sent.append(tch.tx_queue.popleft())
    assert len(sent) == 8
    # Hu set on the stolen block's first 4 bursts
    assert all(b.bits[87] == 1 for b in sent[:4])
    assert all(b.bits[60] == 1 for b in sent[4:])  # Hl on trailing half
    for b in sent:
        tch.write_low_side(RxBurst(b.bits.astype(np.float32),
                                   fn=b.fn, tn=1))
    assert len(received) == 1
    np.testing.assert_array_equal(received[0].bits, l2bits)


def test_channel_recycling_timers(monkeypatch):
    import time as _time

    dl, ul = tdma.SDCCH_8[0]
    l1 = channels.XCCHL1(0, dl, ul)
    l1.open(0)
    assert not l1.recyclable(_time.monotonic())
    # unused channel recycles after T3101
    assert l1.recyclable(_time.monotonic() + 5.0)
    # a good frame refreshes the uplink-lost timer
    l1.record_phy(-60, 0.5)
    l1.good_frames = 1
    assert not l1.recyclable(_time.monotonic() + 5.0)
    assert l1.recyclable(_time.monotonic() + 40.0)


def test_logical_channel_close_deactivates_l1():
    """LogicalChannel.close() (the reference's LogicalChannel close
    path Control's _finish_call relies on) must exist on REAL channel
    objects — a TCH released through cc_release used to crash with
    AttributeError."""
    from openbts_ttsou_tpu.gsm import channels, tdma

    l1 = channels.TCHFACCHL1(2, tdma.FACCH_TCHF, tdma.FACCH_TCHF,
                             tsc=0)
    ch = channels.TCHFACCHLogicalChannel(l1)
    ch.open(100)
    assert ch.l1.active
    ch.close()
    assert not ch.l1.active
