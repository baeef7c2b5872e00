"""Minimal RTP session for GSM 06.10 full-rate voice.

Reference behavior: the libortp usage inside `SIP/SIPEngine.cpp`
(`TxFrame`/`RxFrame`, SIPEngine.h:268-269): payload type 3 (GSM-FR),
33-byte frames, 160 samples (20 ms) per frame at 8 kHz.
"""

from __future__ import annotations

import random
import socket
import struct
from typing import Optional, Tuple

GSM_PAYLOAD_TYPE = 3
SAMPLES_PER_FRAME = 160  # 20 ms @ 8 kHz
GSM_FRAME_BYTES = 33


class RTPSession:
    """Symmetric UDP RTP endpoint."""

    def __init__(self, local_port: int = 0, payload_type: int =
                 GSM_PAYLOAD_TYPE):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("0.0.0.0", local_port))
        self.sock.setblocking(False)
        self.local_port = self.sock.getsockname()[1]
        self.payload_type = payload_type
        self.ssrc = random.getrandbits(32)
        self.seq = random.getrandbits(16)
        self.timestamp = random.getrandbits(31)
        self.remote: Optional[Tuple[str, int]] = None

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

    def rx_frame(self) -> Optional[bytes]:
        """Receive one voice frame if available (SIPEngine::RxFrame)."""
        try:
            data, addr = self.sock.recvfrom(2048)
        except BlockingIOError:
            return None
        if len(data) < 12:
            return None
        v_p_x_cc = data[0]
        cc = v_p_x_cc & 0x0F
        offset = 12 + 4 * cc
        if (v_p_x_cc >> 6) != 2 or len(data) <= offset:
            return None
        return data[offset:]

    def close(self) -> None:
        self.sock.close()
