import numpy as np
import pytest

from openbts_ttsou_tpu.runtime import SampleRing, UdpTransport
from openbts_ttsou_tpu.trx import protocol as proto


def test_native_lib_builds_and_loads():
    from openbts_ttsou_tpu.runtime import load_runtime

    lib = load_runtime()
    assert lib is not None


def test_sample_ring_round_trip():
    ring = SampleRing(1 << 12)
    iq = np.arange(100, dtype=np.int16).reshape(50, 2)
    assert ring.write(iq, 1000) == 50
    out, got = ring.read(50, 1000)
    assert got == 50
    np.testing.assert_array_equal(out, iq)
    assert ring.end_ts == 1050


def test_sample_ring_gap_zero_fill():
    ring = SampleRing(1 << 12)
    ring.write(np.ones((10, 2), np.int16), 0)
    ring.write(np.ones((10, 2), np.int16) * 2, 30)  # gap 10..29
    out, got = ring.read(40, 0)
    assert got == 40
    np.testing.assert_array_equal(out[:10], 1)
    np.testing.assert_array_equal(out[10:30], 0)
    np.testing.assert_array_equal(out[30:], 2)


def _usrp_packet(ts32: int, iq: np.ndarray, chan: int = 0,
                 underrun: bool = False, rssi: int = 0) -> bytes:
    """Build one 512-byte USRP-format packet (header layout per
    USRPDevice::readSamples, Transceiver52M/USRPDevice.cpp:349-386)."""
    iq = np.ascontiguousarray(iq, np.int16)
    payload = iq.tobytes()
    assert len(payload) <= 504
    word0 = (len(payload) & 0x1FF) | ((chan & 0x1F) << 16) | \
        ((rssi & 0x3F) << 21) | ((0x4 << 28) if underrun else 0)
    pkt = word0.to_bytes(4, "little") + \
        (ts32 & 0xFFFFFFFF).to_bytes(4, "little") + payload
    return pkt + b"\x00" * (512 - len(pkt))


def test_sample_ring_packet_reassembly():
    ring = SampleRing(1 << 12)
    a = np.tile([[1, -1]], (126, 1)).astype(np.int16)
    b = np.tile([[2, -2]], (126, 1)).astype(np.int16)
    pkts = _usrp_packet(1000, a) + _usrp_packet(1126, b)
    n, underrun, rssi, skipped = ring.write_packets(pkts)
    assert n == 252 and not underrun and skipped == 0
    out, got = ring.read(252, 1000)
    assert got == 252
    np.testing.assert_array_equal(out[:126], a)
    np.testing.assert_array_equal(out[126:], b)
    assert ring.last_pkt_ts == 1126


def test_sample_ring_packet_flags_and_channels():
    ring = SampleRing(1 << 12)
    data = np.ones((126, 2), np.int16)
    pkts = (_usrp_packet(0, data, rssi=17)
            + _usrp_packet(500, data[:4], chan=0x1F)  # control reply
            + _usrp_packet(126, data, underrun=True, rssi=9))
    n, underrun, rssi, skipped = ring.write_packets(pkts)
    assert n == 252  # control packet carries no ring data
    assert underrun and rssi == 9 and skipped == 1


def test_sample_ring_32bit_timestamp_wraparound():
    """The device timestamp counter is 32-bit; the ring extends it to
    64 bits by bumping hi32 whenever low-32 goes backwards
    (USRPDevice.cpp:358-363). Samples written across the wrap must
    land contiguously in 64-bit time."""
    ring = SampleRing(1 << 12)
    wrap = 1 << 32
    a = np.tile([[3, -3]], (126, 1)).astype(np.int16)
    b = np.tile([[4, -4]], (126, 1)).astype(np.int16)
    c = np.tile([[5, -5]], (126, 1)).astype(np.int16)
    ts0 = wrap - 200  # low-32 = 0xFFFFFF38
    pkts = (_usrp_packet(ts0 & 0xFFFFFFFF, a)
            + _usrp_packet((ts0 + 126) & 0xFFFFFFFF, b)   # crosses 2^32
            + _usrp_packet((ts0 + 252) & 0xFFFFFFFF, c))  # post-wrap
    n, _, _, _ = ring.write_packets(pkts)
    assert n == 378
    # the second packet starts pre-wrap (low-32 still huge): no bump
    # yet; the third packet's low-32 (52) < previous → hi32 = 1
    assert ring.last_pkt_ts == wrap + 52
    assert ring.end_ts == ts0 + 378  # contiguous across the boundary
    out, got = ring.read(378, ts0)
    assert got == 378
    np.testing.assert_array_equal(out[:126], a)
    np.testing.assert_array_equal(out[126:252], b)
    np.testing.assert_array_equal(out[252:], c)


def test_sample_ring_wrap_with_control_packet_between():
    """hi32 extension follows every packet (control replies included),
    so a chan-0x1F packet straddling the wrap still advances hi32."""
    ring = SampleRing(1 << 12)
    wrap = 1 << 32
    data = np.ones((126, 2), np.int16)
    pkts = (_usrp_packet(wrap - 126, data)          # pre-wrap data
            + _usrp_packet(10, data[:4], chan=0x1F)  # post-wrap control
            + _usrp_packet(50, data))                # post-wrap data
    n, _, _, skipped = ring.write_packets(pkts)
    assert n == 252 and skipped == 1
    assert ring.last_pkt_ts == wrap + 50
    assert ring.end_ts == wrap + 50 + 126


def test_sample_ring_complex_and_stale():
    ring = SampleRing(256)
    x = (np.arange(64) + 1j * np.arange(64)).astype(np.complex64)
    ring.write(x, 0)
    back = ring.read_complex(64, 0)
    np.testing.assert_allclose(back, x.astype(np.complex64))
    # entirely-future read → -1
    _, got = ring.read(16, 10_000)
    assert got == -1


def test_udp_transport_round_trip():
    a = UdpTransport(45710, "127.0.0.1", 45711)
    b = UdpTransport(45711, "127.0.0.1", 45710)
    try:
        a.send(b"hello plane")
        msg = b.recv(64, timeout_ms=2000)
        assert msg == b"hello plane"
        b.send(b"pong")
        assert a.recv(64, timeout_ms=2000) == b"pong"
        assert a.recv(64, timeout_ms=50) is None  # timeout
    finally:
        a.close()
        b.close()


def test_wire_format_round_trips():
    d = proto.DownlinkBurst(3, 123456, 5,
                            np.random.default_rng(0).integers(0, 2, 148)
                            .astype(np.uint8))
    blob = proto.pack_downlink(d)
    assert len(blob) == proto.DOWNLINK_LEN
    d2 = proto.unpack_downlink(blob)
    assert (d2.tn, d2.fn, d2.gain) == (3, 123456, 5)
    np.testing.assert_array_equal(d2.bits, d.bits)

    u = proto.UplinkBurst(7, 99, 40, -512,
                          np.linspace(0, 1, 148).astype(np.float32))
    blob = proto.pack_uplink(u)
    assert len(blob) == proto.UPLINK_LEN
    u2 = proto.unpack_uplink(blob)
    assert (u2.tn, u2.fn, u2.rssi, u2.toa) == (7, 99, 40, -512)
    np.testing.assert_allclose(u2.soft, u.soft, atol=1 / 255.0)


def test_control_messages():
    assert proto.pack_command("SETSLOT", 2, 1) == b"CMD SETSLOT 2 1\x00"
    kind, verb, args = proto.parse_message(b"CMD RXTUNE 890000\x00")
    assert (kind, verb, args) == ("CMD", "RXTUNE", ["890000"])
    assert proto.pack_response("RXTUNE", 0, 890000) == \
        b"RSP RXTUNE 0 890000\x00"
    assert proto.pack_clock(42) == b"IND CLOCK 42\x00"


def test_unix_datagram_transport(tmp_path):
    from openbts_ttsou_tpu.runtime.native import UnixDatagramTransport

    a_path = str(tmp_path / "a.sock")
    b_path = str(tmp_path / "b.sock")
    a = UnixDatagramTransport(a_path, b_path)
    b = UnixDatagramTransport(b_path, a_path)
    assert a.send(b"over the wall") == 13
    assert b.recv(64, timeout_ms=500) == b"over the wall"
    assert b.send(b"ack") == 3
    assert a.recv(64, timeout_ms=500) == b"ack"


def test_burst_queue_modular_time():
    """Native VectorQueue semantics (radioInterface.cpp:30-73): exact
    pop, stale drain in modular hyperframe time, latest-write-wins."""
    from openbts_ttsou_tpu.runtime import BurstQueue
    from openbts_ttsou_tpu.utils.gsm_time import HYPERFRAME

    q = BurstQueue()
    assert q.push(100, 0, 3, b"a")
    assert q.push(100, 0, 3, b"b")  # refresh: latest wins
    assert q.push(99, 1, 0, b"old")
    assert q.push(HYPERFRAME - 1, 0, 0, b"wrapped-behind")
    assert len(q) == 3
    assert q.min_fn(100) == HYPERFRAME - 1
    assert q.dump_stale(100) == 2
    assert q.pop_exact(100, 0, 3) == b"b"
    assert q.pop_exact(100, 0, 3) is None
    assert len(q) == 0


def test_burst_queue_bounded():
    from openbts_ttsou_tpu.runtime import BurstQueue

    q = BurstQueue(max_bursts=2)
    assert q.push(1, 0, 0, b"x") and q.push(2, 0, 0, b"y")
    assert not q.push(3, 0, 0, b"z")  # full
    q.dump_stale(3)
    assert q.push(3, 0, 0, b"z")
