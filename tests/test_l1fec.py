import numpy as np
import pytest

import jax.numpy as jnp

from openbts_ttsou_tpu.gsm import fec, gsm610, l1fec, tdma

RNG = np.random.default_rng(61)


def test_lsb8msb():
    bits = np.array([1, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 1], np.uint8)
    out = np.asarray(l1fec.lsb8msb(bits))
    # first byte reversed, trailing 4 bits untouched
    np.testing.assert_array_equal(out[:8], [0, 0, 0, 0, 0, 0, 0, 1])
    np.testing.assert_array_equal(out[8:], [1, 1, 0, 1])
    # involution
    np.testing.assert_array_equal(np.asarray(l1fec.lsb8msb(out)), bits)


def test_pack_unpack_field():
    bits = l1fec.pack_field([jnp.asarray(5), jnp.asarray(1023), jnp.asarray(2)],
                            [6, 11, 5])
    assert bits.shape == (22,)
    assert int(l1fec.unpack_field(bits, 0, 6)) == 5
    assert int(l1fec.unpack_field(bits, 6, 11)) == 1023
    assert int(l1fec.unpack_field(bits, 17, 5)) == 2


def test_xcch_round_trip():
    frames = RNG.integers(0, 2, (3, 184)).astype(np.uint8)
    bursts = l1fec.xcch_encode(frames)
    assert bursts.shape == (3, 4, 148)
    dec, ok = l1fec.xcch_decode(np.asarray(bursts).astype(np.float32))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(dec), frames)


def test_xcch_rejects_garbage():
    noise = RNG.uniform(0, 1, (2, 4, 148)).astype(np.float32)
    _, ok = l1fec.xcch_decode(noise)
    assert not np.asarray(ok).any()


def test_rach_round_trip():
    ra = jnp.asarray(np.array([0, 7, 42, 255], np.int32))
    bsic = 21
    coded = l1fec.rach_encode(ra, jnp.asarray(bsic))
    assert coded.shape == (4, 36)
    ra2, ok = l1fec.rach_decode(np.asarray(coded).astype(np.float32), bsic)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(ra2), np.asarray(ra))
    # wrong BSIC → rejected
    _, ok_bad = l1fec.rach_decode(np.asarray(coded).astype(np.float32), 22)
    assert not np.asarray(ok_bad).any()


def test_sch_round_trip():
    bsic = jnp.asarray([21, 63])
    t1 = jnp.asarray([1024, 37])
    t2 = jnp.asarray([12, 25])
    t3p = jnp.asarray([3, 0])
    burst = l1fec.sch_encode(bsic, t1, t2, t3p)
    assert burst.shape == (2, 148)
    # extended training sequence present
    from openbts_ttsou_tpu.utils import constants as C

    np.testing.assert_array_equal(np.asarray(burst)[0, 42:106],
                                  C.SCH_SYNCH_SEQUENCE)
    fields, ok = l1fec.sch_decode(np.asarray(burst).astype(np.float32))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(fields["bsic"]), [21, 63])
    np.testing.assert_array_equal(np.asarray(fields["t1"]), [1024, 37])
    np.testing.assert_array_equal(np.asarray(fields["t2"]), [12, 25])
    np.testing.assert_array_equal(np.asarray(fields["t3p"]), [3, 0])


def test_tch_round_trip():
    d = RNG.integers(0, 2, (4, 260)).astype(np.uint8)
    c = l1fec.tch_encode(d)
    assert c.shape == (4, 456)
    d2, good = l1fec.tch_decode(np.asarray(c).astype(np.float32))
    assert np.asarray(good).all()
    np.testing.assert_array_equal(np.asarray(d2), d)


def test_tch_bad_frame_detected():
    d = RNG.integers(0, 2, (1, 260)).astype(np.uint8)
    c = np.asarray(l1fec.tch_encode(d)).astype(np.float32)
    # corrupt the class-1a region heavily
    c[0, :40] = 1.0 - c[0, :40]
    _, good = l1fec.tch_decode(c)
    assert not np.asarray(good).any()


def test_gsm610_bit_order_round_trip():
    payload = RNG.integers(0, 2, (2, 260)).astype(np.uint8)
    coder = gsm610.payload_to_coder(payload)
    back = gsm610.coder_to_payload(coder)
    np.testing.assert_array_equal(back, payload)
    assert sorted(gsm610.BIT_ORDER.tolist()) == list(range(260))


def test_tdma_mappings_sanity():
    assert tdma.FCCH.frame_mapping == (0, 10, 20, 30, 40)
    assert tdma.SCH.frame_mapping == (1, 11, 21, 31, 41)
    assert tdma.BCCH.frame_mapping == (2, 3, 4, 5)
    assert len(tdma.RACH_C5.frame_mapping) == 27
    # SDCCH/8 subchannel 3 uplink = {27,28,29,30}
    assert tdma.SDCCH_8[3][1].frame_mapping == (27, 28, 29, 30)
    # SACCH_TF per-TN tables (GSMTDMA.cpp:245-268)
    assert tdma.SACCH_TF[0].frame_mapping == (12, 38, 64, 90)
    assert tdma.SACCH_TF[1].frame_mapping == (25, 51, 77, 103)
    assert tdma.SACCH_TF[2].frame_mapping == (38, 64, 90, 12)
    assert tdma.SACCH_TF[7].frame_mapping == (103, 25, 51, 77)
    assert tdma.FACCH_TCHF.frame_mapping == tuple(
        f for f in range(25) if f != 12)


def test_tdma_reverse_map():
    rm = tdma.BCCH.reverse_map()
    assert rm[2] == 0 and rm[5] == 3 and rm[0] == -1
    assert tdma.BCCH.reverse(53) == 0  # 53 % 51 == 2
    assert tdma.BCCH.reverse(0) is None
    assert tdma.SCH.next_write_time(2) == 11
    assert tdma.SCH.next_write_time(52) == 52  # 52 % 51 == 1 occupied


def test_sch_decode_in_program_over_the_air():
    """Fused beacon scan (MS-side / iq_tool use; the reference BTS only
    ENCODES SCH — GSML1FEC.cpp:880-925 has no SCH decoder): one jitted
    program modulates an SCH burst, coherently demodulates it at the
    symbol rate, and runs sch_decode — encode→air→decode without
    leaving the device."""
    import jax

    from openbts_ttsou_tpu.ops import gmsk

    @jax.jit
    def scan(bsic, t1, t2, t3p):
        burst = l1fec.sch_encode(bsic, t1, t2, t3p)
        wave = gmsk.modulate_burst(burst, 1)
        soft = gmsk.demodulate_burst(
            wave, 1, jnp.ones(burst.shape[:-1], jnp.complex64),
            jnp.zeros(burst.shape[:-1], jnp.float32))
        return l1fec.sch_decode(soft)

    fields, ok = scan(jnp.asarray([21, 5]), jnp.asarray([1024, 2047]),
                      jnp.asarray([12, 0]), jnp.asarray([3, 7]))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(fields["bsic"]), [21, 5])
    np.testing.assert_array_equal(np.asarray(fields["t1"]), [1024, 2047])
    np.testing.assert_array_equal(np.asarray(fields["t2"]), [12, 0])
    np.testing.assert_array_equal(np.asarray(fields["t3p"]), [3, 7])


def test_tch_tx_window_matches_host_encoder():
    """The windowed device TCH/FS + FACCH downlink encoder
    (l1fec.tch_tx_window) is burst-for-burst identical to the
    sequential host encoder (TCHFACCHL1.dispatch_block,
    gsm/channels.py) across window boundaries, FACCH steals, speech
    and silence filler — including the diagonal halves that split
    across windows."""
    from openbts_ttsou_tpu.gsm import channels
    from openbts_ttsou_tpu.gsm.transfer import L2Frame

    rng = np.random.default_rng(3)
    host = channels.TCHFACCHL1(2, tdma.FACCH_TCHF, tdma.FACCH_TCHF,
                               tsc=None)
    host.open(0)
    rev = tdma.FACCH_TCHF.reverse_map()
    fn0 = int(np.where(rev == 0)[0][0])  # 8-burst-aligned start
    host.next_write_fn = fn0

    content = []
    for i in range(12):
        r = rng.random()
        if r < 0.3:
            content.append(("f", rng.integers(0, 2, 184).astype(np.uint8)))
        elif r < 0.7:
            content.append(("s", rng.integers(0, 2, 260).astype(np.uint8)))
        else:
            content.append(("x", None))
    for kind, data in content:
        if kind == "f":
            host._facch_q.append(
                L2Frame(np.asarray(l1fec.lsb8msb(data))))
        elif kind == "s":
            host.speech_in.append(gsm610.coder_to_payload(data))
        host.dispatch_block()
    host_bursts = {b.fn: np.asarray(b.bits) for b in host.tx_queue}

    F = 13
    carry = l1fec.TchTxCarry.zeros(1)
    disp_i = 0
    dev_bits = {}
    fn = fn0
    for w in range(4):
        _, _, nd_t = l1fec._tch_tx_tables(F)
        ndisp = int(nd_t[fn % 26])
        sp = np.zeros((3, 1, 260), np.uint8)
        spv = np.zeros((3, 1), bool)
        fa = np.zeros((3, 1, 184), np.uint8)
        fav = np.zeros((3, 1), bool)
        for j in range(ndisp):
            if disp_i < len(content):
                kind, data = content[disp_i]
                if kind == "f":
                    fa[j, 0], fav[j, 0] = data, True
                elif kind == "s":
                    sp[j, 0], spv[j, 0] = data, True
            disp_i += 1
        bits, is_burst, _hu, carry = l1fec.tch_tx_window(
            jnp.asarray(sp), jnp.asarray(spv), jnp.asarray(fa),
            jnp.asarray(fav), carry, jnp.asarray(fn), F)
        bits, is_burst = np.asarray(bits), np.asarray(is_burst)
        for f in range(F):
            if is_burst[f, 0]:
                dev_bits[fn + f] = bits[f, 0]
        fn += F

    compared = 0
    for f, hb in sorted(host_bursts.items()):
        if f in dev_bits:
            assert np.array_equal(hb, dev_bits[f]), f"frame {f} differs"
            compared += 1
    assert compared >= 40


def test_downlink_block_tch_speech_loopback():
    """Fused FEC-in-program downlink WITH speech: downlink_block_tch
    modulates TCH/FS + FACCH + XCCH in one device program; looping the
    device-rate samples back through the fused uplink decoder
    (uplink_block_decoded) recovers the vocoder frames, the stolen
    FACCH and the XCCH frames (the downlink mirror of decode_block —
    GSML1FEC.cpp:1106-1120 vs :1031-1175)."""
    from openbts_ttsou_tpu.models.transceiver import (
        UplinkSpec,
        downlink_block_tch,
        uplink_block_decoded,
    )
    from openbts_ttsou_tpu.trx import engine as eng

    rng = np.random.default_rng(9)
    cfg = eng.TrxConfig(n_chan=1)
    spec = UplinkSpec()
    state = eng.init_state(cfg)
    # slot 2 = TCH/F; slot 5 = SDCCH-like XCCH; start at an FN that is
    # both 4-aligned (XCCH groups) and an 8-burst TCH boundary
    rev = tdma.FACCH_TCHF.reverse_map()
    fn0 = int(np.where(rev == 0)[0][0])
    while fn0 % 4:
        fn0 += 26
    tch_mask = np.zeros((1, 8), bool)
    tch_mask[0, 2] = True
    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 2] = eng.ChanType.I
    chan_type[0, 5] = eng.ChanType.I
    state = state._replace(chan_type=jnp.asarray(chan_type),
                           fn=jnp.asarray(fn0, jnp.int32))

    # dispatch 2's 8-burst diagonal spans the window boundary — the
    # uplink decoder only decodes groups fully inside one window, so
    # the asserted content sits at dispatches 0/1 of each window
    speech = np.zeros((3, 1, 8, 260), np.uint8)
    sp_valid = np.zeros((3, 1, 8), bool)
    facch = np.zeros((3, 1, 8, 184), np.uint8)
    fa_valid = np.zeros((3, 1, 8), bool)
    sent_speech = [rng.integers(0, 2, 260).astype(np.uint8)
                   for _ in range(2)]
    speech[0, 0, 2], sp_valid[0, 0, 2] = sent_speech[0], True
    sent_facch = rng.integers(0, 2, 184).astype(np.uint8)
    facch[1, 0, 2], fa_valid[1, 0, 2] = sent_facch, True
    speech_w1 = np.zeros((3, 1, 8, 260), np.uint8)
    spv_w1 = np.zeros((3, 1, 8), bool)
    speech_w1[0, 0, 2], spv_w1[0, 0, 2] = sent_speech[1], True

    xcch = np.zeros((3, 1, 8, 184), np.uint8)
    xv = np.zeros((3, 1, 8), bool)
    sent_xcch = rng.integers(0, 2, 184).astype(np.uint8)
    xcch[0, 0, 5], xv[0, 0, 5] = sent_xcch, True

    carry = l1fec.TchTxCarry.zeros(8)
    atten = np.zeros((13, 1, 8), np.float32)
    outs = []
    for w in range(2):  # 2 windows so diagonal halves cross a boundary
        dev, carry = downlink_block_tch(
            cfg, spec, state, jnp.asarray(xcch if w == 0 else xcch * 0),
            jnp.asarray(xv if w == 0 else xv & False),
            jnp.asarray(speech if w == 0 else speech_w1),
            jnp.asarray(sp_valid if w == 0 else spv_w1),
            jnp.asarray(facch if w == 0 else facch * 0),
            jnp.asarray(fa_valid if w == 0 else fa_valid & False),
            jnp.asarray(tch_mask), jnp.asarray(atten), carry,
            jnp.asarray(fn0 + 13 * w, jnp.int32))
        outs.append(np.asarray(dev))

    # loop back: scale to a sane rx amplitude and decode on device
    got_speech, got_facch, got_xcch = [], [], []
    st = state
    for w, dev in enumerate(outs):
        st = st._replace(fn=jnp.asarray(fn0 + 13 * w, jnp.int32))
        st, res, blocks = uplink_block_decoded(
            cfg, spec, st, jnp.asarray(dev / cfg.tx_full_scale * 9000.0))
        tg = np.asarray(blocks.tch_good)
        fo = np.asarray(blocks.facch_ok)
        for gidx in range(tg.shape[0]):
            if tg[gidx, 0, 2]:
                got_speech.append(np.asarray(
                    blocks.tch_speech)[gidx, 0, 2])
            if fo[gidx, 0, 2]:
                got_facch.append(np.asarray(
                    blocks.facch_bits)[gidx, 0, 2])
        ok = np.asarray(blocks.ok)
        for gidx in range(ok.shape[0]):
            if ok[gidx, 0, 5]:
                got_xcch.append(np.asarray(blocks.bits)[gidx, 0, 5])

    assert any(np.array_equal(s, sent_speech[0]) for s in got_speech), \
        f"speech frame 0 not recovered ({len(got_speech)} good)"
    assert any(np.array_equal(s, sent_speech[1]) for s in got_speech)
    assert any(np.array_equal(fb, sent_facch) for fb in got_facch), \
        f"FACCH not recovered ({len(got_facch)} ok)"
    assert any(np.array_equal(xb, sent_xcch) for xb in got_xcch), \
        "XCCH leg broken"


def test_streaming_decode_recovers_boundary_spanning_groups():
    """uplink_block_decoded_stream: FEC groups whose 8-burst diagonal
    (or 4-burst XCCH block) spans the window boundary decode via the
    DECODE_PRELUDE carry — the reference's persistent per-burst mI[]
    semantics (GSML1FEC.cpp:572-630, 1031-1100) restored on the
    windowed path. Every dispatched speech/FACCH frame is recovered
    exactly once across 3 windows."""
    from openbts_ttsou_tpu.models.transceiver import (
        DECODE_PRELUDE,
        UplinkSpec,
        downlink_block_tch,
        uplink_block_decoded_stream,
    )
    from openbts_ttsou_tpu.trx import engine as eng

    rng = np.random.default_rng(21)
    cfg = eng.TrxConfig(n_chan=1)
    spec = UplinkSpec()
    state = eng.init_state(cfg)
    rev = tdma.FACCH_TCHF.reverse_map()
    fn0 = int(np.where(rev == 0)[0][0])
    while fn0 % 4:
        fn0 += 26
    tch_mask = np.zeros((1, 8), bool)
    tch_mask[0, 2] = True
    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 2] = eng.ChanType.I
    state = state._replace(chan_type=jnp.asarray(chan_type))

    n_win = 3  # content windows; one silent flush window follows so
    # the final dispatch's diagonal second half gets on the air
    sent = []  # (kind, payload) per dispatch, in order
    carry = l1fec.TchTxCarry.zeros(8)
    xcch = jnp.zeros((3, 1, 8, 184), jnp.uint8)
    xv = jnp.zeros((3, 1, 8), bool)
    atten = jnp.zeros((13, 1, 8), jnp.float32)
    devs = []
    for w in range(n_win + 1):
        sp = np.zeros((3, 1, 8, 260), np.uint8)
        spv = np.zeros((3, 1, 8), bool)
        fa = np.zeros((3, 1, 8, 184), np.uint8)
        fav = np.zeros((3, 1, 8), bool)
        for j in range(3 if w < n_win else 0):
            if (w + j) % 2:
                d = rng.integers(0, 2, 184).astype(np.uint8)
                fa[j, 0, 2], fav[j, 0, 2] = d, True
                sent.append(("f", d))
            else:
                d = rng.integers(0, 2, 260).astype(np.uint8)
                sp[j, 0, 2], spv[j, 0, 2] = d, True
                sent.append(("s", d))
        dev, carry = downlink_block_tch(
            cfg, spec, state, xcch, xv, jnp.asarray(sp),
            jnp.asarray(spv), jnp.asarray(fa), jnp.asarray(fav),
            jnp.asarray(tch_mask), atten, carry,
            jnp.asarray(fn0 + 13 * w, jnp.int32))
        devs.append(np.asarray(dev))

    st = state._replace(fn=jnp.asarray(fn0, jnp.int32))
    prev = jnp.zeros((DECODE_PRELUDE, 1, 8, 148), jnp.float32)
    pvalid = jnp.asarray(False)
    got = []
    for w, dev in enumerate(devs):
        st = st._replace(fn=jnp.asarray(fn0 + 13 * w, jnp.int32))
        st, res, blocks, prev, pvalid = uplink_block_decoded_stream(
            cfg, spec, st, jnp.asarray(dev / cfg.tx_full_scale * 9000.0),
            0, prev, pvalid)
        tg = np.asarray(blocks.tch_good)
        fo = np.asarray(blocks.facch_ok)
        ef = np.asarray(blocks.tch_end_fn)
        for gi in range(tg.shape[0]):
            if tg[gi, 0, 2]:
                got.append(("s", np.asarray(blocks.tch_speech)[gi, 0, 2],
                            int(ef[gi])))
            if fo[gi, 0, 2]:
                got.append(("f", np.asarray(blocks.facch_bits)[gi, 0, 2],
                            int(ef[gi])))
    # every sent frame decoded exactly once (no duplicates across the
    # carry: end_fns must be unique)
    end_fns = [g[2] for g in got]
    assert len(end_fns) == len(set(end_fns)), "group decoded twice"
    assert len(got) == len(sent), (len(got), len(sent))
    for kind, payload in sent:
        assert any(k == kind and np.array_equal(v, payload)
                   for k, v, _ in got), f"{kind} frame lost"


def test_duplex_decoded_fully_resident_roundtrip():
    """duplex_block_decoded: the fully-resident L1 — TCH/FS + FACCH +
    XCCH encode AND streaming decode in ONE device program per block.
    Pass 1 drives the duplex's tx leg with real content (XCCH groups on
    the ABSOLUTE FN%4 grid via the streaming tx carry, TCH/FACCH via
    the diagonal carry); the resulting device-rate stream is looped
    back as pass 2's uplink, and every frame must be recovered exactly
    once through the rx soft-bit prelude — L2/vocoder frames are the
    ONLY content that crosses the host boundary in either direction."""
    from openbts_ttsou_tpu.models.transceiver import (
        DECODE_PRELUDE,
        RX_HALO_DEV,
        TX_TAIL_SYM,
        UplinkSpec,
        XcchTxCarry,
        duplex_block_decoded,
    )
    from openbts_ttsou_tpu.trx import engine as eng

    rng = np.random.default_rng(31)
    cfg = eng.TrxConfig(n_chan=1)
    spec = UplinkSpec()
    state = eng.init_state(cfg)
    rev = tdma.FACCH_TCHF.reverse_map()
    fn0 = int(np.where(rev == 0)[0][0])
    while fn0 % 4:
        fn0 += 26
    tch_mask = np.zeros((1, 8), bool)
    tch_mask[0, 2] = True
    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 2] = eng.ChanType.I
    chan_type[0, 4] = eng.ChanType.I  # XCCH slot
    state = state._replace(chan_type=jnp.asarray(chan_type))

    n_win = 4
    atten = jnp.zeros((13, 1, 8), np.float32)
    b = spec.block_in

    # --- per-window content: TCH dispatches + absolute-grid XCCH ------
    sent_tch, sent_xcch, contents, phases = [], [], [], []
    for w in range(n_win + 1):
        fnw = fn0 + 13 * w
        phase = fnw % 4
        off = (-phase) % 4
        sp = np.zeros((3, 1, 8, 260), np.uint8)
        spv = np.zeros((3, 1, 8), bool)
        fa = np.zeros((3, 1, 8, 184), np.uint8)
        fav = np.zeros((3, 1, 8), bool)
        xcch = np.zeros((4, 1, 8, 184), np.uint8)
        xv = np.zeros((4, 1, 8), bool)
        if w < n_win:
            for j in range(3):
                if (w + j) % 2:
                    d = rng.integers(0, 2, 184).astype(np.uint8)
                    fa[j, 0, 2], fav[j, 0, 2] = d, True
                    sent_tch.append(("f", d))
                else:
                    d = rng.integers(0, 2, 260).astype(np.uint8)
                    sp[j, 0, 2], spv[j, 0, 2] = d, True
                    sent_tch.append(("s", d))
            # groups whose START lies inside this window (off+4g ≤ 12)
            for g in range((12 - off) // 4 + 1):
                x = rng.integers(0, 2, 184).astype(np.uint8)
                xcch[g, 0, 4], xv[g, 0, 4] = x, True
                sent_xcch.append(x)
        contents.append(tuple(jnp.asarray(a) for a in
                              (xcch, xv, sp, spv, fa, fav, tch_mask)))
        phases.append(phase)

    def drive(get_ul):
        st = state._replace(fn=jnp.asarray(fn0, jnp.int32))
        tx_tail = jnp.zeros((1, TX_TAIL_SYM), jnp.complex64)
        tx_carry = (l1fec.TchTxCarry.zeros(8), XcchTxCarry.zeros(1))
        prev = jnp.zeros((DECODE_PRELUDE, 1, 8, 148), jnp.float32)
        pvalid = jnp.asarray(False)
        txs, all_blocks = [], []
        for w in range(n_win + 1):
            st = st._replace(fn=jnp.asarray(fn0 + 13 * w, jnp.int32))
            (st, tx, tx_tail, blocks, tx_carry, prev,
             pvalid) = duplex_block_decoded(
                cfg, spec, st, get_ul(w), tx_tail, contents[w], atten,
                tx_carry, jnp.asarray(fn0 + 13 * w, jnp.int32), prev,
                pvalid, 0, phases[w])
            txs.append(np.asarray(tx))
            all_blocks.append(blocks)
        return txs, all_blocks

    # --- pass 1: generate the air stream (uplink is silence) ----------
    zero_ul = jnp.zeros((1, b + 2 * RX_HALO_DEV), jnp.complex64)
    txs, _ = drive(lambda w: zero_ul)

    # tx covers device timestamps TX_DELAY_DEV early (the daemon
    # writes block w at w·block_in − TX_DELAY_DEV); with RX_HALO_DEV ==
    # TX_DELAY_DEV the plain concatenation IS the halo'd rx input
    # stream: ul_halo(w) = air[w·b : (w+1)·b + 2·RX_HALO_DEV]
    air = np.concatenate(
        [t / cfg.tx_full_scale * 9000.0 for t in txs]
        + [np.zeros((1, 2 * RX_HALO_DEV), np.complex64)], axis=-1)

    # --- pass 2: decode the duplex's own stream -----------------------
    _, all_blocks = drive(
        lambda w: jnp.asarray(air[:, w * b: (w + 1) * b
                                  + 2 * RX_HALO_DEV]))

    got, got_x = [], []
    for blocks in all_blocks:
        tg = np.asarray(blocks.tch_good)
        fo = np.asarray(blocks.facch_ok)
        ef = np.asarray(blocks.tch_end_fn)
        for gi in range(tg.shape[0]):
            if tg[gi, 0, 2]:
                got.append(("s", np.asarray(blocks.tch_speech)[gi, 0, 2],
                            int(ef[gi])))
            if fo[gi, 0, 2]:
                got.append(("f", np.asarray(blocks.facch_bits)[gi, 0, 2],
                            int(ef[gi])))
        ok = np.asarray(blocks.ok)[:, 0, 4]
        bts = np.asarray(blocks.bits)[:, 0, 4]
        for gi in np.flatnonzero(ok):
            got_x.append(bts[gi])

    # every TCH/FACCH frame recovered exactly once
    end_fns = [g[2] for g in got]
    assert len(end_fns) == len(set(end_fns)), "group decoded twice"
    assert len(got) == len(sent_tch), (len(got), len(sent_tch))
    for kind, payload in sent_tch:
        assert any(k == kind and np.array_equal(v, payload)
                   for k, v, _ in got), f"{kind} frame lost"
    # every XCCH frame recovered exactly once (boundary-spanning groups
    # ride the tx carry out and the rx prelude back)
    assert len(got_x) == len(sent_xcch), (len(got_x), len(sent_xcch))
    for x in sent_xcch:
        assert any(np.array_equal(g, x) for g in got_x), "XCCH lost"


def test_resident_l1_wrapper_matches_manual_threading():
    """ResidentL1 (models/resident.py) drives duplex_block_decoded
    with identical results to hand-threading the five carries + FN%4
    phase cycling — and its carry()/restore() checkpoint round-trips
    mid-stream (the resident path's save/resume contract)."""
    import jax.numpy as jnp

    from openbts_ttsou_tpu.gsm import l1fec as L
    from openbts_ttsou_tpu.models.resident import ResidentL1
    from openbts_ttsou_tpu.models.transceiver import (
        DECODE_PRELUDE,
        RX_HALO_DEV,
        TX_TAIL_SYM,
        UplinkSpec,
        XcchTxCarry,
        duplex_block_decoded,
    )
    from openbts_ttsou_tpu.trx import engine as eng

    rng = np.random.default_rng(17)
    c = 1
    cfg = eng.TrxConfig(n_chan=c)
    spec = UplinkSpec()
    f = spec.frames
    fn0 = 52  # FN%4 == 0; phases then cycle 0,1,2,3 over windows
    tch_mask = np.zeros((c, 8), bool)
    tch_mask[0, 3] = True
    n_win = 3

    contents = []
    for w in range(n_win):
        sp = rng.integers(0, 2, (3, c, 8, 260)).astype(np.uint8)
        spv = np.ones((3, c, 8), bool)
        fa = np.zeros((3, c, 8, 184), np.uint8)
        fav = np.zeros((3, c, 8), bool)
        xcch = rng.integers(0, 2, (4, c, 8, 184)).astype(np.uint8)
        xv = np.ones((4, c, 8), bool)
        contents.append(tuple(jnp.asarray(a) for a in
                              (xcch, xv, sp, spv, fa, fav, tch_mask)))
    uls = [jnp.asarray((rng.standard_normal((c, spec.block_in
                                             + 2 * RX_HALO_DEV))
                        + 1j * rng.standard_normal(
                            (c, spec.block_in + 2 * RX_HALO_DEV))
                        ).astype(np.complex64) * 50.0)
           for _ in range(n_win)]
    atten = jnp.zeros((f, c, 8), jnp.float32)

    # --- manual threading (the pattern every caller used to repeat) ---
    st = eng.init_state(cfg)
    tail = jnp.zeros((c, TX_TAIL_SYM), jnp.complex64)
    tc = (L.TchTxCarry.zeros(c * 8), XcchTxCarry.zeros(c))
    prev = jnp.zeros((DECODE_PRELUDE, c, 8, 148), jnp.float32)
    pv = jnp.asarray(False)
    manual = []
    for w in range(n_win):
        fnw = fn0 + f * w
        st = st._replace(fn=jnp.asarray(fnw, jnp.int32))
        (st, tx, tail, blocks, tc, prev, pv) = duplex_block_decoded(
            cfg, spec, st, uls[w], tail, contents[w], atten, tc,
            jnp.asarray(fnw, jnp.int32), prev, pv, 0, fnw % 4)
        manual.append((np.asarray(tx), blocks))

    # --- the wrapper, with a checkpoint round-trip between windows ----
    r = ResidentL1(cfg, spec, fn0=fn0)
    got = []
    for w in range(n_win):
        if w == 2:  # save/restore mid-stream must be transparent
            snap = r.carry()
            r = ResidentL1(cfg, spec, fn0=0)
            r.restore(snap)
        got.append(r.step(uls[w], contents[w]))

    for (tx_m, bl_m), (tx_w, bl_w) in zip(manual, got):
        np.testing.assert_array_equal(tx_m, np.asarray(tx_w))
        np.testing.assert_array_equal(np.asarray(bl_m.bits),
                                      np.asarray(bl_w.bits))
        np.testing.assert_array_equal(np.asarray(bl_m.ok),
                                      np.asarray(bl_w.ok))
        np.testing.assert_array_equal(np.asarray(bl_m.tch_speech),
                                      np.asarray(bl_w.tch_speech))
        np.testing.assert_array_equal(np.asarray(bl_m.rach_ok),
                                      np.asarray(bl_w.rach_ok))
