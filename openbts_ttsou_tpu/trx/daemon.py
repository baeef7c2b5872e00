"""The transceiver daemon: the `runTransceiver` equivalent.

Binds the three UDP planes (clock = base, control = base+1, data =
base+2; peer at base+100+i — Transceiver52M/Transceiver.cpp:42-44,
runTransceiver.cpp:68-74), drives the radio one GSM frame at a time
through the jitted engine, and speaks the reference's wire protocol so
an unmodified BTS stack (TRXManager) can control it.

The reference uses three service threads; here a single `step()`
processes control messages, ingests downlink bursts, advances one frame
of radio I/O through `rx_step`/`tx_step`, and emits the clock beacon —
callable from a `run()` loop or directly from tests.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from openbts_ttsou_tpu.runtime import UdpTransport
from openbts_ttsou_tpu.trx import engine as eng
from openbts_ttsou_tpu.trx import protocol as proto
from openbts_ttsou_tpu.trx.radio import Radio
from openbts_ttsou_tpu.utils.gsm_time import (
    FRAME_SYMBOLS,
    HYPERFRAME,
    SLOT_SAMPLE_PATTERN,
)

SLOT_OFFSETS = np.concatenate([[0], np.cumsum(SLOT_SAMPLE_PATTERN)])[:-1]


@dataclasses.dataclass
class TrxDaemonConfig:
    base_port: int = 5700
    peer_host: str = "127.0.0.1"
    peer_port_offset: int = 100  # BTS listens at base+100+i
    sps: int = 1
    start_fn: int = 0
    tx_latency_frames: int = 2  # initial latency (runTransceiver.cpp:71)


class TrxDaemon:
    """One-ARFCN transceiver daemon over a pluggable radio."""

    def __init__(self, radio: Radio, cfg: TrxDaemonConfig = TrxDaemonConfig()):
        self.radio = radio
        self.cfg = cfg
        base, peer = cfg.base_port, cfg.base_port + cfg.peer_port_offset
        self.clock_sock = UdpTransport(base, cfg.peer_host, peer)
        self.ctrl_sock = UdpTransport(base + 1, cfg.peer_host, peer + 1)
        self.data_sock = UdpTransport(base + 2, cfg.peer_host, peer + 2)
        self.engine_cfg = eng.TrxConfig(n_chan=1, sps=cfg.sps)
        self.state = eng.init_state(self.engine_cfg)
        self.on = False
        self.tx_freq = 0.0
        self.rx_freq = 0.0
        self.power = -10
        self.fn = cfg.start_fn  # receive-side frame clock
        self.tx_fn = cfg.start_fn + cfg.tx_latency_frames
        self.last_clock_fn = None
        self.pending_tx: dict[tuple[int, int], proto.DownlinkBurst] = {}

    # ------------------------------------------------------------------
    # control plane (driveControl, Transceiver.cpp:423-569)
    # ------------------------------------------------------------------
    def handle_control(self, data: bytes) -> bytes | None:
        try:
            kind, verb, args = proto.parse_message(data)
        except ValueError:
            return None
        if kind != "CMD":
            return None
        self._send_clock()
        ok = 0
        extra: tuple = ()
        if verb == "POWEROFF":
            self.on = False
        elif verb == "POWERON":
            if not self.tx_freq or not self.rx_freq:
                ok = 1
            else:
                if not self.on:
                    self.radio.start()
                    self.on = True
        elif verb == "RXTUNE":
            self.rx_freq = float(args[0]) * 1e3
            ok = 0 if self.radio.set_rx_freq(self.rx_freq) else 1
            extra = (args[0],)
        elif verb == "TXTUNE":
            self.tx_freq = float(args[0]) * 1e3
            ok = 0 if self.radio.set_tx_freq(self.tx_freq) else 1
            extra = (args[0],)
        elif verb == "SETTSC":
            tsc = int(args[0])
            if 0 <= tsc <= 7:
                self.state = self.state._replace(
                    tsc=self.state.tsc.at[0].set(tsc))
            else:
                ok = 1
            extra = (tsc,)
        elif verb == "SETSLOT":
            tn, combo = int(args[0]), int(args[1])
            if 0 <= tn <= 7:
                self.state = self.state._replace(
                    chan_type=self.state.chan_type.at[0, tn].set(combo))
            else:
                ok = 1
            extra = (tn, combo)
        elif verb == "SETPOWER":
            self.power = int(args[0])
            extra = (self.power,)
        elif verb == "ADJPOWER":
            self.power += int(args[0])
            extra = (self.power,)
        elif verb == "SETMAXDELAY":
            self.state = self.state._replace(
                max_expected_delay=self.state.max_expected_delay.at[0]
                .set(int(args[0])))
            extra = (args[0],)
        else:
            return None  # bogus command: reference just logs
        return proto.pack_response(verb, ok, *extra)

    # ------------------------------------------------------------------
    # data plane
    # ------------------------------------------------------------------
    def handle_downlink(self, data: bytes) -> None:
        try:
            burst = proto.unpack_downlink(data)
        except ValueError:
            return
        self.pending_tx[(burst.fn % HYPERFRAME, burst.tn)] = burst

    def _frame_ts(self, fn: int) -> int:
        return (fn - self.cfg.start_fn) * FRAME_SYMBOLS * self.cfg.sps

    def step_frame(self) -> list[proto.UplinkBurst]:
        """Advance one GSM frame: transmit tx_fn, receive fn."""
        sps = self.cfg.sps
        # ---- downlink (driveTransmitFIFO + pushRadioVector) ----------
        bits = np.zeros((1, 8, 148), np.uint8)
        valid = np.zeros((1, 8), bool)
        atten = np.zeros((1, 8), np.float32)
        for tn in range(8):
            b = self.pending_tx.pop((self.tx_fn, tn), None)
            if b is not None:
                bits[0, tn] = b.bits & 1
                valid[0, tn] = True
                atten[0, tn] = b.gain
        slots = np.asarray(eng.tx_step(
            self.engine_cfg, self.state, jnp.asarray(bits),
            jnp.asarray(valid), jnp.asarray(atten),
            jnp.asarray(self.tx_fn, jnp.int32)))
        frame_samples = np.zeros(FRAME_SYMBOLS * sps, np.complex64)
        for tn in range(8):
            off = SLOT_OFFSETS[tn] * sps
            ln = SLOT_SAMPLE_PATTERN[tn] * sps
            frame_samples[off: off + ln] += slots[0, tn, :ln]
        self.radio.write_samples(frame_samples, self._frame_ts(self.tx_fn))
        self.tx_fn = (self.tx_fn + 1) % HYPERFRAME

        # ---- uplink (driveReceiveFIFO + pullRadioVector) -------------
        ts = self._frame_ts(self.fn)
        raw = self.radio.read_samples(FRAME_SYMBOLS * sps + sps, ts)
        frame = np.zeros((1, 8, eng.SLOT_SAMPLES * sps), np.complex64)
        for tn in range(8):
            off = SLOT_OFFSETS[tn] * sps
            frame[0, tn] = raw[off: off + eng.SLOT_SAMPLES * sps]
        self.state = self.state._replace(fn=jnp.asarray(self.fn, jnp.int32))
        self.state, res = eng.rx_step(self.engine_cfg, self.state,
                                      jnp.asarray(frame))
        out = []
        det = np.asarray(res.detected)[0]
        soft = np.asarray(res.soft_bits)[0]
        rssi = np.asarray(res.rssi)[0]
        timing = np.asarray(res.timing)[0]
        for tn in range(8):
            if det[tn]:
                out.append(proto.UplinkBurst(tn, self.fn, int(rssi[tn]),
                                             int(timing[tn]), soft[tn]))
        self.fn = (self.fn + 1) % HYPERFRAME
        return out

    def _send_clock(self) -> None:
        self.clock_sock.send(proto.pack_clock(
            (self.tx_fn + proto.CLOCK_LEAD_FRAMES) % HYPERFRAME))
        self.last_clock_fn = self.tx_fn

    def step(self) -> None:
        """One service iteration: control, data ingest, one frame."""
        msg = self.ctrl_sock.recv(256, timeout_ms=0)
        if msg:
            resp = self.handle_control(msg)
            if resp:
                self.ctrl_sock.send(resp)
        while True:
            d = self.data_sock.recv(512, timeout_ms=0)
            if not d:
                break
            self.handle_downlink(d)
        if not self.on:
            return
        for burst in self.step_frame():
            self.data_sock.send(proto.pack_uplink(burst))
        if (self.last_clock_fn is None or
                (self.tx_fn - self.last_clock_fn) % HYPERFRAME
                >= proto.CLOCK_PERIOD_FRAMES):
            self._send_clock()

    def run(self, max_frames: int | None = None) -> None:
        n = 0
        while max_frames is None or n < max_frames:
            self.step()
            n += 1


def main():  # pragma: no cover - manual entry point
    import argparse

    from openbts_ttsou_tpu.trx.radio import LoopbackRadio

    ap = argparse.ArgumentParser(description="TPU GSM transceiver daemon")
    ap.add_argument("--base-port", type=int, default=5700)
    ap.add_argument("--peer", default="127.0.0.1")
    ap.add_argument("--loopback-delay", type=int, default=0)
    args = ap.parse_args()
    daemon = TrxDaemon(LoopbackRadio(delay_samples=args.loopback_delay),
                       TrxDaemonConfig(base_port=args.base_port,
                                       peer_host=args.peer))
    daemon.run()


if __name__ == "__main__":  # pragma: no cover
    main()
