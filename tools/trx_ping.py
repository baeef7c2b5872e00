#!/usr/bin/env python
"""Transceiver control-plane ping (the USRPping.cpp equivalent):
verifies the daemon responds to control verbs and reports round-trip
latency per verb."""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from openbts_ttsou_tpu.runtime import UdpTransport  # noqa: E402
from openbts_ttsou_tpu.trx import protocol as proto  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--base-port", type=int, default=5700)
    ap.add_argument("--local-port", type=int, default=5801)
    args = ap.parse_args()
    sock = UdpTransport(args.local_port, args.host, args.base_port + 1)
    for verb, vargs in [("RXTUNE", (890000,)), ("TXTUNE", (935000,)),
                        ("SETTSC", (0,)), ("POWEROFF", ())]:
        t0 = time.perf_counter()
        sock.send(proto.pack_command(verb, *vargs))
        resp = sock.recv(256, timeout_ms=2000)
        dt = (time.perf_counter() - t0) * 1e3
        if resp is None:
            print(f"{verb}: NO RESPONSE")
        else:
            kind, rverb, rargs = proto.parse_message(resp)
            print(f"{verb}: {kind} {rverb} {' '.join(rargs)} ({dt:.1f} ms)")
    sock.close()


if __name__ == "__main__":
    main()
