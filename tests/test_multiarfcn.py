"""Multi-ARFCN BTS end-to-end: a 2-carrier BTSApp against the N-carrier
transceiver daemon through the real per-carrier wire protocol
(one ARFCNManager per carrier, TRXManager.h:62,115; the daemon batches
all carriers into one engine step).

Carrier 0 keeps the beacon + RACH (its mappings are C0-only); carrier 1
carries TCH/F. The test brings both carriers up over the control
sockets, performs an over-the-air RACH on carrier 0, and receives
over-the-air TCH/FS voice on carrier 1."""

import threading
import time as systime

import numpy as np

from openbts_ttsou_tpu.apps.openbts import BTSApp
from openbts_ttsou_tpu.gsm import channels, l1fec, tdma
from openbts_ttsou_tpu.ops import gmsk
from openbts_ttsou_tpu.trx import protocol as proto
from openbts_ttsou_tpu.trx.daemon import (
    SLOT_OFFSETS,
    TrxDaemon,
    TrxDaemonConfig,
)
from openbts_ttsou_tpu.trx.radio import DuplexLoopbackRadio
from openbts_ttsou_tpu.utils import constants as C
from openbts_ttsou_tpu.utils.config import ConfigurationTable

BASE = 45900
AMPL = 9000.0


class DaemonClock:
    def __init__(self, daemon):
        self.daemon = daemon

    def fn(self):
        return self.daemon.tx_fn

    def set_fn(self, fn):
        pass


def pump(app, daemon, frames=1):
    for _ in range(frames):
        daemon.step()
        app.step()


def test_two_carrier_bts_over_the_air():
    radios = [DuplexLoopbackRadio(), DuplexLoopbackRadio()]
    daemon = TrxDaemon(radios, TrxDaemonConfig(base_port=BASE, n_arfcn=2))

    cfg = ConfigurationTable()
    cfg.set("GSM.NumARFCNs", "2")
    cfg.set("GSM.NumTCH", "9")  # fills C0 TN1-7 then carrier-1 TN0-1
    cfg.set("GSM.Timer.T3101", "600000")
    cfg.set("GSM.Timer.T3109", "600000")
    app = BTSApp(cfg, trx_base_port=BASE)
    app.bts.clock = DaemonClock(daemon)
    for ch in app.dcch:
        ch.l1.clock = app.bts.clock.fn
        if ch.sacch is not None:
            ch.sacch.clock = app.bts.clock.fn
    assert app.n_arfcn == 2
    carriers = sorted({app._carrier_of(t) for t in app.bts.tch_pool})
    assert carriers == [0, 1], "TCH pool must span both carriers"

    # warm the engine jit first: the first step_frame compiles rx/tx,
    # which would otherwise starve the control plane mid-bring-up
    from openbts_ttsou_tpu.trx import engine as eng

    daemon.carrier_on = [True, True]
    daemon.step_frame()
    daemon.carrier_on = [False, False]
    daemon.state = eng.init_state(daemon.engine_cfg)
    daemon.fn = daemon.cfg.start_fn
    daemon.tx_fn = daemon.cfg.start_fn + daemon.cfg.tx_latency_frames

    # --- bring-up through the real control sockets --------------------
    stop = threading.Event()

    def serve():
        while not stop.is_set():
            daemon.step()
            systime.sleep(0.0005)

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        ok = app.bringup()
    finally:
        stop.set()
        t.join(timeout=2.0)
    assert ok, "multi-carrier bring-up failed over the wire"
    assert daemon.carrier_on == [True, True]
    assert daemon.rx_freq[0] == 890000e3 and daemon.rx_freq[1] == 890200e3
    # SETSLOT landed per carrier: C-V beacon on (0, TN0), C-I on c1 TN0
    ct = np.asarray(daemon.state.chan_type)
    assert ct[0, 0] == 5 and ct[1, 0] == 1

    pump(app, daemon, 5)  # beacon warm-up

    # --- over-the-air RACH on carrier 0 -------------------------------
    fn_r = daemon.fn + 8
    while fn_r % 51 not in range(14, 37):  # C-V access window
        fn_r += 1
    coded = np.asarray(l1fec.rach_encode(
        np.asarray([0x2A]), np.asarray(app.bts.bcc)))[0]
    bits = np.zeros(148, np.uint8)
    bits[:8] = [0, 1, 0, 1, 0, 1, 0, 1]
    bits[8:49] = C.RACH_SYNCH_SEQUENCE
    bits[49:85] = coded
    wave = AMPL * gmsk.modulate_burst_np(bits[None], 1, guard_len=9)[0]
    radios[0].ms_write(wave, daemon._frame_ts(fn_r))
    for _ in range(60):
        pump(app, daemon)
        if app.bts.sdcch_available() < app.bts.sdcch_total():
            break
    assert app.bts.sdcch_available() < app.bts.sdcch_total(), \
        "carrier-0 RACH not granted"

    # --- over-the-air TCH/FS voice on carrier 1 -----------------------
    tch = next(t for t in app.bts.tch_pool if app._carrier_of(t) == 1)
    tn = tch.l1.tn
    fn_now = daemon.tx_fn
    tch.l1.open(fn_now)
    tch.l1.resync(fn_now)

    ms = channels.TCHFACCHL1(tn, tdma.FACCH_TCHF, tdma.FACCH_TCHF,
                             tsc=app.bts.bcc)
    ms.open(0)
    ms.next_write_fn = ms._align_block_start(
        (daemon.fn + 6) % 2715648, modulus=8)
    ms._offset = 0
    rng = np.random.default_rng(5)
    payloads = [rng.integers(0, 2, 260).astype(np.uint8) for _ in range(4)]
    for pl in payloads:
        ms.send_tch(pl)
    for _ in range(4):
        ms.dispatch_block()
    for b in ms.tx_queue:
        w = AMPL * gmsk.modulate_burst_np(b.bits[None], 1, guard_len=9)[0]
        radios[1].ms_write(w, daemon._frame_ts(b.fn) + int(SLOT_OFFSETS[tn]))

    last_fn = max(b.fn for b in ms.tx_queue)
    while daemon.fn <= last_fn + 2:
        pump(app, daemon)
    assert len(tch.l1.speech_out) >= 2, "no voice decoded on carrier 1"
    np.testing.assert_array_equal(tch.l1.speech_out[0], payloads[0])
