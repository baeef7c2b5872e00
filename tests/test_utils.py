

def test_z100_timer():
    from openbts_ttsou_tpu.utils.gsm_time import Z100Timer

    t = Z100Timer(10)
    assert not t.active() and not t.expired()
    t.set()
    assert t.active() and t.remaining() <= 10
    import time

    time.sleep(0.02)
    assert t.expired()
    t.reset()
    assert not t.active()


def test_f16_fixed_point():
    from openbts_ttsou_tpu.utils.f16 import F16

    assert abs(float(F16(1.5) * F16(2.25)) - 3.375) < 1e-4
    assert abs(float(F16(3.0) / F16(2.0)) - 1.5) < 1e-4
    assert abs(float(F16(1.0) + F16(-0.25)) - 0.75) < 1e-4
    # saturation at the 15.16 rail
    assert float(F16(40000.0) * F16(40000.0)) == (2**31 - 1) / 65536
    assert F16(2.0) > F16(1.0)


def test_resample_linear():
    import numpy as np

    from openbts_ttsou_tpu.ops.signal import resample_linear

    x = np.arange(10.0)
    y = np.asarray(resample_linear(x, 2.0, 19))
    np.testing.assert_allclose(y, np.arange(19) / 2.0)


def test_rrlp_application_information():
    from openbts_ttsou_tpu.gsm.l3 import parse_l3, rr

    m = rr.ApplicationInformation(b"\x10\x20\xfe", protocol_id=0)
    back = parse_l3(m.encode())
    assert isinstance(back, rr.ApplicationInformation)
    assert back.apdu == b"\x10\x20\xfe" and back.protocol_id == 0


def test_gsmtap_tap_point():
    """Decoded uplink frames mirror to the GSMTAP collector
    (gWriteGSMTAP, GSML1FEC.cpp:790)."""
    import socket

    import numpy as np

    from openbts_ttsou_tpu.gsm import channels, l1fec, tdma
    from openbts_ttsou_tpu.gsm.transfer import RxBurst
    from openbts_ttsou_tpu.utils import gsmtap

    sink = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sink.bind(("127.0.0.1", 0))
    sink.setblocking(False)
    gsmtap.enable("127.0.0.1", sink.getsockname()[1])
    try:
        dl, ul = tdma.SDCCH_8[0]
        l1 = channels.XCCHL1(0, dl, ul)
        l1.open(0)
        rng = np.random.default_rng(5)
        bits = rng.integers(0, 2, 184).astype(np.uint8)
        bursts = np.asarray(l1fec.xcch_encode(
            np.asarray(l1fec.lsb8msb(bits))[None]))[0]
        fn = 0
        for b in bursts:
            fn = ul.next_write_time(fn)
            l1.write_low_side(RxBurst(b.astype(np.float32), fn=fn, tn=0))
            fn += 1
        pkt, _ = sink.recvfrom(2048)
        assert pkt[0] == 2 and pkt[2] == gsmtap.GSMTAP_TYPE_UM
        payload = np.unpackbits(np.frombuffer(pkt[16:16 + 23], np.uint8))
        np.testing.assert_array_equal(payload[:184], bits)
    finally:
        gsmtap.gGSMTAP = None
        sink.close()
