"""Block-pipelined daemon: streaming exactness + wire-protocol drive.

The block daemon fuses each 13-frame window into one device program
(models.transceiver.duplex_block_wire) and retires the previous window
while the current one computes. These tests pin (1) exact stream
continuity of the chained tx resampler against a one-shot reference,
(2) the vectorized uplink packet builder against the scalar packer, and
(3) an end-to-end drive through the real UDP wire protocol: POWERON →
SETSLOT → downlink bursts in → modulated tx out + uplink detections
back as datagrams (an unmodified TRXManager could be the peer).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openbts_ttsou_tpu.models.transceiver import (
    RX_HALO_DEV,
    TX_DELAY_DEV,
    TX_TAIL_SYM,
    UplinkSpec,
    downlink_block,
    duplex_block_wire,
)
from openbts_ttsou_tpu.ops import fir, gmsk
from openbts_ttsou_tpu.trx import ChanType, TrxConfig, engine as eng, init_state
from openbts_ttsou_tpu.trx import protocol as proto
from openbts_ttsou_tpu.trx.daemon import BlockTrxDaemon, TrxDaemonConfig
from openbts_ttsou_tpu.trx.radio import ReplayBankRadio
from openbts_ttsou_tpu.utils import constants as C
from openbts_ttsou_tpu.utils.gsm_time import HYPERFRAME


def _norm_burst(tsc=0, seed=0):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [[0, 0, 0], rng.integers(0, 2, 57), [1], C.TRAINING_SEQUENCE[tsc],
         [1], rng.integers(0, 2, 57), [0, 0, 0]]).astype(np.uint8)


def test_duplex_tx_streaming_matches_oneshot():
    """Two chained duplex blocks must emit the same device-rate tx
    stream as one 26-frame `downlink_block` over the concatenated
    window (the overlap-save identity the reference maintains with
    sendHistory, Transceiver/radioInterface.cpp:123-186)."""
    n = 2
    cfg = TrxConfig(n_chan=n)
    spec = UplinkSpec(frames=13)
    state = init_state(cfg)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, (26, n, 8, 148)).astype(np.uint8)
    valid = rng.random((26, n, 8)) < 0.7
    atten = np.zeros((26, n, 8), np.float32)

    ul = jnp.zeros((n, spec.block_in + 2 * RX_HALO_DEV), jnp.complex64)
    tail = jnp.zeros((n, TX_TAIL_SYM), jnp.complex64)
    txs = []
    for b in range(2):
        sl = slice(13 * b, 13 * b + 13)
        state2, tx, tail, _ = duplex_block_wire(
            cfg, spec, state, ul, tail, jnp.asarray(bits[sl]),
            jnp.asarray(valid[sl]), jnp.asarray(atten[sl]),
            jnp.asarray(13 * b, jnp.int32))
        txs.append(np.asarray(tx))
        # tx depends only on the filler table (constant here); keep the
        # same state so frame numbering is the only moving part
    chained = np.concatenate(txs, axis=-1)

    spec26 = UplinkSpec(frames=26)
    one = np.asarray(downlink_block(
        cfg, spec26, state, jnp.asarray(bits), jnp.asarray(valid),
        jnp.asarray(atten), jnp.asarray(0, jnp.int32)))
    # chained covers symbols [-65, 26·1250-65): drop its first
    # TX_DELAY_DEV device samples to align with the one-shot's origin
    a = chained[:, TX_DELAY_DEV:]
    b = one[:, : a.shape[1]]
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, atol=2e-4 * scale)


def test_pack_uplink_block_matches_scalar():
    rng = np.random.default_rng(2)
    det = rng.random((13, 8)) < 0.4
    soft = rng.integers(0, 256, (13, 8, 148)).astype(np.uint8)
    rssi = rng.integers(0, 70, (13, 8))
    toa = rng.integers(-300, 300, (13, 8))
    pkts = proto.pack_uplink_block(det, soft, rssi, toa, fn0=2715640,
                                   hyperframe=HYPERFRAME)
    assert pkts.shape[0] == int(det.sum())
    k = 0
    for f in range(13):
        for tn in range(8):
            if not det[f, tn]:
                continue
            ref = proto.pack_uplink(proto.UplinkBurst(
                tn, (2715640 + f) % HYPERFRAME, int(rssi[f, tn]),
                int(toa[f, tn]), soft[f, tn].astype(np.float32) / 255.0))
            assert pkts[k].tobytes() == ref
            k += 1


@pytest.fixture(scope="module")
def wire_scenario():
    """Device-rate uplink with normal bursts planted in every slot of
    every frame (slots 1-7 as combination I; slot 0 left off)."""
    n, frames = 2, 13 * 12  # 12 blocks of replay headroom
    spec = UplinkSpec(frames=13)
    bits = np.zeros((n, 8, 148), np.uint8)
    sym = np.zeros((n, frames * 1250), np.complex64)
    for c in range(n):
        for tn in range(1, 8):
            bits[c, tn] = _norm_burst(seed=10 * c + tn)
    wave = {(c, tn): 5000.0 * np.asarray(
        gmsk.modulate_burst(bits[c, tn][None], 1))[0]
        for c in range(n) for tn in range(1, 8)}
    offs = np.concatenate([[0], np.cumsum([157, 156, 156, 156] * 2)])[:8]
    for f in range(frames):
        for c in range(n):
            for tn in range(1, 8):
                o = f * 1250 + offs[tn]
                w = wave[(c, tn)]
                sym[c, o: o + len(w)] += w
    lpf_up = fir.resampler_lpf(96, 65, 651)
    dev = np.asarray(fir.polyphase_resample(
        jnp.asarray(sym), 96, 65, lpf_up))[:, : frames * 1250 * 96 // 65]
    # headroom for the last block's right halo
    dev = np.pad(dev, ((0, 0), (0, 2 * RX_HALO_DEV)))
    return n, spec, bits, dev


def test_block_daemon_over_the_wire(wire_scenario):
    """Full wire drive: control verbs, downlink datagrams in, uplink
    detections out, tx capture demodulates back to the sent bits."""
    from openbts_ttsou_tpu.runtime import UdpTransport

    n, spec, ul_bits, dev = wire_scenario
    base = 45700
    radio = ReplayBankRadio(dev, capture_tx_blocks=8)
    daemon = BlockTrxDaemon(
        radio, TrxDaemonConfig(base_port=base, n_arfcn=n))
    # BTS side: one control+data socket pair per carrier, clock socket
    peer = base + 100
    clock = UdpTransport(peer, "127.0.0.1", base)
    ctrl = [UdpTransport(peer + 3 * i + 1, "127.0.0.1", base + 3 * i + 1)
            for i in range(n)]
    data = [UdpTransport(peer + 3 * i + 2, "127.0.0.1", base + 3 * i + 2)
            for i in range(n)]

    def cmd(i, verb, *args):
        ctrl[i].send(proto.pack_command(verb, *args))
        daemon.step()  # service it (advances a block once powered on)
        rsp = ctrl[i].recv(128, timeout_ms=200)
        assert rsp is not None and b"RSP " + verb.encode() in rsp
        return rsp

    # configure every carrier, POWERON last so no block advances during
    # setup (the reference's bring-up order, apps/OpenBTS.cpp:200-214)
    for i in range(n):
        cmd(i, "RXTUNE", 890000)
        cmd(i, "TXTUNE", 935000)
        cmd(i, "SETTSC", 0)
        for tn in range(1, 8):
            cmd(i, "SETSLOT", tn, 1)
    for i in range(n):
        cmd(i, "POWERON")
    assert daemon.on

    # queue downlink bursts for the upcoming windows
    dl_bits = _norm_burst(seed=99)
    q0 = daemon.tx_fn
    for fn in range(q0, q0 + 26):
        for i in range(n):
            for tn in range(8):
                data[i].send(proto.pack_downlink(proto.DownlinkBurst(
                    tn, fn, 0, dl_bits)))

    for _ in range(4):
        daemon.step()
    daemon.flush()

    # uplink datagrams: decode and compare against the planted bursts
    got = {i: [] for i in range(n)}
    for i in range(n):
        while True:
            d = data[i].recv(256, timeout_ms=50)
            if not d:
                break
            got[i].append(proto.unpack_uplink(d))
    for i in range(n):
        assert len(got[i]) >= 7 * 13 * 2  # ≥2 full windows of detections
        by_tn = {b.tn for b in got[i]}
        assert by_tn == set(range(1, 8))
        for b in got[i][:8]:
            hard = (b.soft > 0.5).astype(np.uint8)
            assert np.array_equal(hard, ul_bits[i, b.tn] & 1)
            assert abs(b.toa) <= 256  # within ±1 symbol
    # clock beacons announced ahead of tx_fn
    beacons = []
    while True:
        d = clock.recv(64, timeout_ms=50)
        if not d:
            break
        kind, verb, args = proto.parse_message(d)
        assert (kind, verb) == ("IND", "CLOCK")
        beacons.append(int(args[0]))
    assert beacons, "no clock beacons seen"

    # tx capture: the block covering the queued window must contain the
    # downlink burst, GMSK-demodulable back to the queued bits
    assert radio.tx_log, "no tx blocks written"
    assert radio.tx_log[0][0] == -TX_DELAY_DEV  # block 0's timestamp
    tx_fn_start = daemon.cfg.start_fn + daemon.cfg.tx_latency_frames
    qblock = (q0 - tx_fn_start) // 13
    assert qblock < len(radio.tx_log), "queued block not captured"
    tx_q = radio.tx_log[qblock][1]  # int16 [C, T, 2] — the DAC format
    tx_c = (tx_q[..., 0].astype(np.float32)
            + 1j * tx_q[..., 1].astype(np.float32))
    lpf_dn = fir.resampler_lpf(65, 96, 961)
    sym_tx = np.asarray(fir.polyphase_resample(
        jnp.asarray(tx_c), 65, 96, lpf_dn))
    # the tx block's symbol stream starts 65 symbols early (the carried
    # resampler tail); frame q0 slot 1 sits at in-block offset
    off = 65 + ((q0 - tx_fn_start) % 13) * 1250 + 157
    soft = np.asarray(gmsk.demodulate_burst(
        jnp.asarray(sym_tx[0, off: off + 157][None]), 1,
        jnp.asarray([np.complex64(daemon.engine_cfg.tx_full_scale)]),
        jnp.asarray([0.0])))[0]
    hard = (soft[:148] > 0.5).astype(np.uint8)
    assert np.array_equal(hard, dl_bits & 1)

    # stale-burst accounting: bursts queued for frames already
    # transmitted get dumped, not sent (Transceiver.cpp:144-154)
    stale_before = daemon.stale_dumped
    for i in range(n):
        data[i].send(proto.pack_downlink(proto.DownlinkBurst(
            0, (daemon.tx_fn - 30) % HYPERFRAME, 0, dl_bits)))
    daemon.step()
    daemon.flush()
    assert daemon.stale_dumped > stale_before


def test_duplex_uplink_matches_uplink_block():
    """duplex_block_wire must produce the SAME uplink results and end
    state as the standalone uplink_block on the identical device-rate
    stream: the duplex fusion changes the program shape, not the
    (always-exact) engine semantics."""
    from openbts_ttsou_tpu.models.transceiver import uplink_block

    n = 2
    cfg = TrxConfig(n_chan=n)
    spec = UplinkSpec(frames=13)
    chan_type = np.zeros((n, 8), np.int32)
    chan_type[:, 1:] = ChanType.I
    chan_type[:, 0] = ChanType.IV
    state = init_state(cfg)._replace(chan_type=jnp.asarray(chan_type))

    rng = np.random.default_rng(3)
    sym = (rng.standard_normal((n, spec.block_symbols))
           + 1j * rng.standard_normal((n, spec.block_symbols))
           ).astype(np.complex64)
    wave = 9000.0 * np.asarray(gmsk.modulate_burst(
        _norm_burst(seed=4)[None], 1, guard_len=9))[0]
    for c in range(n):
        for f in range(spec.frames):
            off = f * 1250 + 157  # slot 1 (ChanType.I → TSC expected)
            sym[c, off: off + len(wave)] += wave
    lpf_up = fir.resampler_lpf(96, 65, 651)
    dev = np.asarray(jnp.asarray(
        fir.polyphase_resample(jnp.asarray(sym), 96, 65, lpf_up)
    ))[:, : spec.block_in].astype(np.complex64)

    st_a, res_a = uplink_block(cfg, spec, state, jnp.asarray(dev))

    ul_halo = np.pad(dev, ((0, 0), (RX_HALO_DEV, RX_HALO_DEV)))
    dl_bits = jnp.zeros((spec.frames, n, 8, 148), jnp.uint8)
    dl_valid = jnp.zeros((spec.frames, n, 8), bool)
    dl_atten = jnp.zeros((spec.frames, n, 8), jnp.float32)
    st_b, _tx, _tail, wire = duplex_block_wire(
        cfg, spec, state, jnp.asarray(ul_halo),
        jnp.zeros((n, TX_TAIL_SYM), jnp.complex64), dl_bits, dl_valid,
        dl_atten, jnp.asarray(0, jnp.int32), False)

    det_a = np.asarray(res_a.detected)
    assert det_a[:, :, 1].all()  # every frame's slot 1 fired
    np.testing.assert_array_equal(det_a, np.asarray(wire.detected))
    # the duplex front-end resamples from the halo'd stream; demod soft
    # bits agree to quantization (the wire path rounds to uint8)
    soft_a = np.clip(np.round(np.asarray(res_a.soft_bits) * 255.0),
                     0, 255).astype(np.uint8)
    diff = np.abs(soft_a.astype(int)
                  - np.asarray(wire.soft_u8).astype(int))
    assert diff.max() <= 1
    np.testing.assert_allclose(np.asarray(st_a.energy_threshold),
                               np.asarray(st_b.energy_threshold))
    assert int(st_a.fn) == int(st_b.fn)


def test_compact_retire_matches_dense(wire_scenario):
    """The compacted D2H path (duplex_block_compact: prefix-packed
    detected datagrams + live-carrier DAC rows + host-side filler
    replay) must emit byte-identical uplink datagrams and DAC blocks
    to the dense path, while fetching strictly fewer result bytes
    once downlink load goes sparse."""
    from openbts_ttsou_tpu.runtime import UdpTransport

    n, spec, ul_bits, dev = wire_scenario

    def run(base, compact):
        radio = ReplayBankRadio(dev.copy(), capture_tx_blocks=10)
        daemon = BlockTrxDaemon(
            radio, TrxDaemonConfig(base_port=base, n_arfcn=n),
            compact=compact)
        peer = base + 100
        ctrl = [UdpTransport(peer + 3 * i + 1, "127.0.0.1",
                             base + 3 * i + 1) for i in range(n)]
        data = [UdpTransport(peer + 3 * i + 2, "127.0.0.1",
                             base + 3 * i + 2) for i in range(n)]
        for i in range(n):
            for verb, a in (("RXTUNE", (890000,)), ("TXTUNE", (935000,)),
                            ("SETTSC", (0,))):
                ctrl[i].send(proto.pack_command(verb, *a))
            for tn in range(1, 8):
                ctrl[i].send(proto.pack_command("SETSLOT", tn, 1))
        daemon.step()
        for i in range(n):
            ctrl[i].send(proto.pack_command("POWERON"))
        daemon.step()
        # downlink: ONE real burst window on carrier 0 only, then
        # nothing — later blocks are pure filler on every carrier, so
        # the compact path's filler suppression engages
        dl = _norm_burst(seed=7)
        q0 = daemon.tx_fn
        for fn in range(q0, q0 + 13):
            data[0].send(proto.pack_downlink(proto.DownlinkBurst(
                3, fn, 0, dl)))
        for _ in range(6):
            daemon.step()
        daemon.flush()
        got = {i: [] for i in range(n)}
        for i in range(n):
            while True:
                d = data[i].recv(256, timeout_ms=50)
                if not d:
                    break
                got[i].append(d)
        return daemon, radio, got

    d_dense, r_dense, got_dense = run(46700, compact=False)
    d_comp, r_comp, got_comp = run(46900, compact=True)

    # identical uplink datagram streams
    for i in range(n):
        assert got_comp[i] == got_dense[i], f"carrier {i} datagrams differ"
        assert len(got_comp[i]) >= 7 * 13 * 2
    # identical DAC blocks, including the filler-replayed ones
    assert len(r_comp.tx_log) == len(r_dense.tx_log)
    for (ts_c, tx_c), (ts_d, tx_d) in zip(r_comp.tx_log, r_dense.tx_log):
        assert ts_c == ts_d
        assert np.array_equal(tx_c, tx_d)
    # the filler cache engaged and bytes actually shrank
    assert d_comp._filler_tx is not None, "filler cache never captured"
    assert d_comp.d2h_bytes < d_dense.d2h_bytes, (
        d_comp.d2h_bytes, d_dense.d2h_bytes)
    assert d_comp.d2h_bytes_dense == pytest.approx(
        d_dense.d2h_bytes, rel=0.01)
