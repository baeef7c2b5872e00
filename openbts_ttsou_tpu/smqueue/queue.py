"""RFC 3428 store-and-forward SMS daemon.

Reference behavior: `smqueue/` — `short_msg`/`short_msg_pending` with a
~25-state per-message machine (smqueue.h:100,306), a time-sorted queue,
the `main_loop` (smqueue.cpp:1819) over its own SIP mini-stack
(`smnet.{h,cpp}`), and shortcode command plugins (`smcommands.cpp`).

This implementation keeps the same shape — a priority queue of pending
messages with per-state timeouts and retries, destination lookup via a
registry, and pluggable shortcode handlers — condensed to the states the
daemon actually transitions through.
"""

from __future__ import annotations

import dataclasses
import enum
import heapq
import itertools
import time as systime
from typing import Callable, Dict, List, Optional

from openbts_ttsou_tpu.sip.message import SIPMessage, make_request, make_response
from openbts_ttsou_tpu.utils.logger import get_logger

log = get_logger("smqueue")


class ShortMsgState(enum.Enum):
    """Condensed short_msg_pending states (smqueue.h:306)."""

    InitialState = 0
    RequestFromAddressLookup = 1
    RequestDestinationImsiLookup = 2
    RequestDestinationSipUrl = 3
    ReadyToSend = 4
    AwaitingTryDestination = 5
    WaitingForDeliveryAck = 6
    DeliveredAndAcked = 7
    DeleteMeState = 8
    NoNotaryWhatsoever = 9  # terminal failure


@dataclasses.dataclass(order=True)
class ShortMsg:
    """One queued message (short_msg_pending)."""

    next_action_time: float
    seq: int = dataclasses.field(compare=True)
    frm: str = dataclasses.field(compare=False, default="")
    to: str = dataclasses.field(compare=False, default="")
    body: str = dataclasses.field(compare=False, default="")
    state: ShortMsgState = dataclasses.field(
        compare=False, default=ShortMsgState.InitialState)
    retries: int = dataclasses.field(compare=False, default=0)
    call_id: str = dataclasses.field(compare=False, default="")


class SMq:
    """The store-and-forward engine (SMq, smqueue.h; main_loop
    smqueue.cpp:1819). Transport is injected for testability."""

    MAX_RETRIES = 5
    RETRY_INTERVAL_S = 30.0

    def __init__(self, send: Callable[[str, str], None],
                 resolve: Callable[[str], Optional[str]],
                 local_host: str = "127.0.0.1", local_port: int = 5063):
        """send(dest_uri_user, rendered_request): deliver a SIP MESSAGE;
        resolve(user): user/shortcode → registered destination user, or
        None if unknown."""
        self._send = send
        self._resolve = resolve
        self.local_host = local_host
        self.local_port = local_port
        self._heap: List[ShortMsg] = []
        self._seq = itertools.count()
        self.shortcodes: Dict[str, Callable[[ShortMsg], Optional[str]]] = {}
        self.install_default_shortcodes()
        self.delivered: List[ShortMsg] = []
        self.failed: List[ShortMsg] = []

    # -- shortcode plugins (smcommands.cpp) ----------------------------
    def install_default_shortcodes(self) -> None:
        self.shortcodes["411"] = lambda m: f"you are {m.frm}"
        self.shortcodes["666"] = lambda m: None  # blackhole test code

    # -- ingress -------------------------------------------------------
    def submit(self, frm: str, to: str, body: str,
               call_id: str = "") -> ShortMsg:
        """Accept a MESSAGE into the queue (handles shortcodes
        immediately, like the reference's originate/shortcode path)."""
        msg = ShortMsg(systime.monotonic(), next(self._seq), frm, to,
                       body, ShortMsgState.RequestDestinationSipUrl,
                       call_id=call_id)
        handler = self.shortcodes.get(to)
        if handler is not None:
            reply = handler(msg)
            msg.state = ShortMsgState.DeleteMeState
            if reply is not None:
                # shortcode response goes back to the sender
                self.submit(to, frm, reply)
            return msg
        heapq.heappush(self._heap, msg)
        return msg

    def handle_sip_message(self, sip_msg: SIPMessage) -> SIPMessage:
        """Inbound SIP MESSAGE → queue + 200 OK (the smnet ingress)."""
        frm = sip_msg.uri_user("from") or ""
        to = sip_msg.uri_user("to") or ""
        self.submit(frm, to, sip_msg.body, sip_msg.call_id() or "")
        return make_response(sip_msg, 200, "OK")

    def handle_delivery_response(self, call_id: str, status: int) -> None:
        """A response for a forwarded MESSAGE arrived."""
        for m in self._heap:
            if m.call_id == call_id and \
                    m.state == ShortMsgState.WaitingForDeliveryAck:
                if status == 200:
                    m.state = ShortMsgState.DeliveredAndAcked
                    m.next_action_time = systime.monotonic()
                elif status >= 400:
                    m.state = ShortMsgState.ReadyToSend  # retry later
                    m.next_action_time = systime.monotonic() + \
                        self.RETRY_INTERVAL_S
                heapq.heapify(self._heap)
                return

    # -- the queue engine (main_loop) ----------------------------------
    def queue_size(self) -> int:
        return len(self._heap)

    def process_queue(self, now: Optional[float] = None) -> int:
        """Run all due state transitions; returns actions taken."""
        now = systime.monotonic() if now is None else now
        actions = 0
        requeue: List[ShortMsg] = []
        while self._heap and self._heap[0].next_action_time <= now:
            msg = heapq.heappop(self._heap)
            actions += 1
            st = msg.state
            if st in (ShortMsgState.InitialState,
                      ShortMsgState.RequestDestinationSipUrl):
                dest = self._resolve(msg.to)
                if dest is None:
                    msg.retries += 1
                    if msg.retries > self.MAX_RETRIES:
                        msg.state = ShortMsgState.NoNotaryWhatsoever
                        self.failed.append(msg)
                        continue
                    msg.next_action_time = now + self.RETRY_INTERVAL_S
                    requeue.append(msg)
                    continue
                msg.state = ShortMsgState.ReadyToSend
                msg.next_action_time = now
                requeue.append(msg)
            elif st == ShortMsgState.ReadyToSend:
                req = make_request("MESSAGE", msg.to, msg.frm,
                                   self.local_host, self.local_port,
                                   self.local_host, self.local_port,
                                   call_id=msg.call_id or None,
                                   body=msg.body,
                                   content_type="text/plain")
                msg.call_id = req.call_id() or msg.call_id
                self._send(msg.to, req.render().decode())
                msg.state = ShortMsgState.WaitingForDeliveryAck
                msg.next_action_time = now + self.RETRY_INTERVAL_S
                requeue.append(msg)
            elif st == ShortMsgState.WaitingForDeliveryAck:
                # ack timeout → retry
                msg.retries += 1
                if msg.retries > self.MAX_RETRIES:
                    msg.state = ShortMsgState.NoNotaryWhatsoever
                    self.failed.append(msg)
                    continue
                msg.state = ShortMsgState.ReadyToSend
                msg.next_action_time = now
                requeue.append(msg)
            elif st == ShortMsgState.DeliveredAndAcked:
                self.delivered.append(msg)
            elif st in (ShortMsgState.DeleteMeState,
                        ShortMsgState.NoNotaryWhatsoever):
                pass  # dropped
            else:
                requeue.append(msg)
        for m in requeue:
            heapq.heappush(self._heap, m)
        return actions


def main():  # pragma: no cover - manual entry point
    """Run smqueue as a standalone daemon over UDP (smqueue.cpp:1819)."""
    import argparse
    import time as systime

    from openbts_ttsou_tpu.runtime import UdpTransport
    from openbts_ttsou_tpu.sip.message import SIPMessage

    ap = argparse.ArgumentParser(description="SMS store-and-forward")
    ap.add_argument("--port", type=int, default=5063)
    ap.add_argument("--relay-host", default="127.0.0.1")
    ap.add_argument("--relay-port", type=int, default=5062)
    args = ap.parse_args()
    sock = UdpTransport(args.port, args.relay_host, args.relay_port)
    registry: dict[str, str] = {}

    smq = SMq(send=lambda to, req: sock.send(req.encode()),
              resolve=lambda u: u if (u in registry or u.isdigit())
              else None,
              local_port=args.port)
    log.warning("smqueue listening on %d", args.port)
    while True:
        data = sock.recv(4096, timeout_ms=200)
        if data:
            try:
                msg = SIPMessage.parse(data)
            except Exception:
                continue
            if msg.is_request and msg.method == "MESSAGE":
                sock.send(smq.handle_sip_message(msg).render())
            elif msg.is_request and msg.method == "REGISTER":
                user = msg.uri_user("from") or ""
                registry[user] = user
                from openbts_ttsou_tpu.sip.message import make_response

                sock.send(make_response(msg, 200, "OK").render())
            elif not msg.is_request:
                smq.handle_delivery_response(msg.call_id() or "",
                                             msg.status)
        smq.process_queue()


if __name__ == "__main__":  # pragma: no cover
    main()
