"""RTP session for GSM 06.10 full-rate voice with a jitter buffer.

Reference behavior: the libortp usage inside `SIP/SIPEngine.cpp`
(`TxFrame`/`RxFrame`, SIPEngine.h:268-269): payload type 3 (GSM-FR),
33-byte frames, 160 samples (20 ms) per frame at 8 kHz. libortp's
receive side reorders by sequence number and rides over loss; the
small sequence-ordered jitter buffer here covers that role — frames
come out of `rx_frame` in sequence order, out-of-order arrivals up to
`jitter_depth` frames (default 4 ≈ 80 ms) are re-slotted, late
duplicates are dropped, and a loss is skipped once the buffer backs up
behind the gap.
"""

from __future__ import annotations

import random
import socket
import struct
from typing import Dict, Optional, Tuple

GSM_PAYLOAD_TYPE = 3
SAMPLES_PER_FRAME = 160  # 20 ms @ 8 kHz
GSM_FRAME_BYTES = 33


def _seq_lt(a: int, b: int) -> bool:
    """a strictly before b in modular 16-bit sequence space."""
    return ((b - a) & 0xFFFF) < 0x8000 and a != b


class RTPSession:
    """Symmetric UDP RTP endpoint."""

    def __init__(self, local_port: int = 0, payload_type: int =
                 GSM_PAYLOAD_TYPE, jitter_depth: int = 4):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("0.0.0.0", local_port))
        self.sock.setblocking(False)
        self.local_port = self.sock.getsockname()[1]
        self.payload_type = payload_type
        self.ssrc = random.getrandbits(32)
        self.seq = random.getrandbits(16)
        self.timestamp = random.getrandbits(31)
        self.remote: Optional[Tuple[str, int]] = None
        self.jitter_depth = jitter_depth
        self._jitter: Dict[int, bytes] = {}
        self._next_seq: Optional[int] = None
        self.late_drops = 0
        self.loss_skips = 0

    def connect(self, host: str, port: int) -> None:
        self.remote = (host, port)

    def tx_frame(self, payload: bytes) -> None:
        """Send one voice frame (SIPEngine::TxFrame)."""
        if self.remote is None:
            return
        header = struct.pack(
            "!BBHII",
            0x80,  # V=2
            self.payload_type & 0x7F,
            self.seq & 0xFFFF,
            self.timestamp & 0xFFFFFFFF,
            self.ssrc,
        )
        self.sock.sendto(header + payload, self.remote)
        self.seq = (self.seq + 1) & 0xFFFF
        self.timestamp = (self.timestamp + SAMPLES_PER_FRAME) & 0xFFFFFFFF

    def _drain_socket(self) -> None:
        """Pull every queued datagram into the jitter buffer."""
        while True:
            try:
                data, _ = self.sock.recvfrom(2048)
            except BlockingIOError:
                return
            if len(data) < 12:
                continue
            v_p_x_cc = data[0]
            cc = v_p_x_cc & 0x0F
            offset = 12 + 4 * cc
            if (v_p_x_cc >> 6) != 2 or len(data) <= offset:
                continue
            if (data[1] & 0x7F) != self.payload_type:
                continue  # foreign payload type (ortp filters these)
            seq = struct.unpack_from("!H", data, 2)[0]
            if self._next_seq is not None and _seq_lt(seq,
                                                     self._next_seq):
                self.late_drops += 1  # already played past it
                continue
            self._jitter[seq] = data[offset:]

    def rx_frame(self) -> Optional[bytes]:
        """Next voice frame in SEQUENCE order, or None
        (SIPEngine::RxFrame; ordering/loss handling is libortp's jitter
        compensation role)."""
        self._drain_socket()
        if not self._jitter:
            return None
        if self._next_seq is None:  # first packet(s) seed the cursor
            anchor = next(iter(self._jitter))

            def signed_dist(s: int) -> int:
                d = (s - anchor) & 0xFFFF
                return d - 0x10000 if d >= 0x8000 else d

            self._next_seq = min(self._jitter, key=signed_dist)
        if self._next_seq in self._jitter:
            p = self._jitter.pop(self._next_seq)
            self._next_seq = (self._next_seq + 1) & 0xFFFF
            return p
        if len(self._jitter) >= self.jitter_depth:
            # the expected frame is lost and the line is backing up:
            # skip the gap to the oldest buffered frame
            s = min(self._jitter,
                    key=lambda s: (s - self._next_seq) & 0xFFFF)
            p = self._jitter.pop(s)
            self._next_seq = (s + 1) & 0xFFFF
            self.loss_skips += 1
            return p
        return None  # wait for the reordered frame to arrive

    def close(self) -> None:
        self.sock.close()
