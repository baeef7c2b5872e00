#!/usr/bin/env python
"""Standalone SIP MESSAGE injector (the apps/sendSimple.cpp equivalent):
sends one text message to an smqueue/SIP endpoint and prints the
response."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from openbts_ttsou_tpu.runtime import UdpTransport  # noqa: E402
from openbts_ttsou_tpu.sip.message import SIPMessage, make_request  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("to")
    ap.add_argument("text", nargs="+")
    ap.add_argument("--from-user", default="sendSimple")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5063)
    ap.add_argument("--local-port", type=int, default=5069)
    args = ap.parse_args()
    sock = UdpTransport(args.local_port, args.host, args.port)
    req = make_request("MESSAGE", args.to, args.from_user, args.host,
                       args.port, "127.0.0.1", args.local_port,
                       body=" ".join(args.text),
                       content_type="text/plain")
    sock.send(req.render())
    resp = sock.recv(2048, timeout_ms=3000)
    if resp is None:
        print("no response")
        sys.exit(1)
    msg = SIPMessage.parse(resp)
    print(f"{msg.status} {msg.reason}")
    sock.close()


if __name__ == "__main__":
    main()
