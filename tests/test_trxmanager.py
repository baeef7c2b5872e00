import time

import numpy as np
import pytest

from openbts_ttsou_tpu.gsm import tdma
from openbts_ttsou_tpu.gsm.transfer import RxBurst
from openbts_ttsou_tpu.gsm.trxmanager import DEMUX_MODULUS, Clock
from openbts_ttsou_tpu.utils.gsm_time import FRAME_SECONDS


def test_demux_modulus_covers_all_repeats():
    for rep in (26, 51, 102, 104):
        assert DEMUX_MODULUS % rep == 0


def test_clock_advances_in_real_time():
    c = Clock()
    c.set_fn(1000)
    assert c.fn() in (1000, 1001)
    time.sleep(3 * FRAME_SECONDS)
    assert c.fn() >= 1002


class _Decoder:
    def __init__(self, tn, mapping):
        self.tn = tn
        self.uplink = mapping
        self.got = []

    def write_low_side(self, burst):
        self.got.append(burst.fn)


def test_demux_dispatch_without_sockets():
    # Exercise receive_burst directly (the socket paths are covered by
    # the full-stack test).
    from openbts_ttsou_tpu.gsm.trxmanager import ARFCNManager

    mgr = ARFCNManager.__new__(ARFCNManager)
    mgr._demux = {}
    import threading

    mgr._demux_lock = threading.Lock()
    dec = _Decoder(0, tdma.SDCCH_8[0][1])  # uplink frames 15..18 mod 51
    mgr.install_decoder(dec)
    soft = np.zeros(148, np.float32)
    mgr.receive_burst(RxBurst(soft, fn=51 + 16, tn=0))
    mgr.receive_burst(RxBurst(soft, fn=51 + 20, tn=0))  # unmapped
    mgr.receive_burst(RxBurst(soft, fn=16, tn=3))  # wrong slot
    assert dec.got == [67]


def test_iq_tool_record_replay(tmp_path):
    import sys

    sys.path.insert(0, "tools")
    import iq_tool

    path = str(tmp_path / "capture.npz")
    iq_tool.record(path, frames=13, n_chan=1, snr_db=18)
    hits, total, errors, bits = iq_tool.replay(path)
    assert hits >= total - 1
    assert errors / max(bits, 1) < 0.02
