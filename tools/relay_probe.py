#!/usr/bin/env python
"""Measure the host↔device transfer path of the current attachment.

The wire daemon's real-time frontier on a dev relay is set by this
tunnel, not by device compute (ARCHITECTURE.md's soak table); this
probe records what the tunnel actually delivers TODAY — small-transfer
round-trip time and large-transfer bandwidth each way — so a soak
artifact can be normalized against the attachment it ran on.

    python tools/relay_probe.py [--mb 4] [--reps 5]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=4.0)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(args.mb * (1 << 20) // 4)
    x = np.arange(n, dtype=np.float32)
    probe = jax.jit(lambda a: a + 1.0)

    # warm (compile + first transfers)
    d = jax.device_put(x)
    np.asarray(probe(d))

    rtts, h2d, d2h = [], [], []
    tiny = np.zeros(16, np.float32)
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_put(tiny))
        rtts.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        d = jax.device_put(x)
        jax.block_until_ready(d)
        h2d.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        np.asarray(d)
        d2h.append(time.perf_counter() - t0)

    rtt = min(rtts)
    # on a fast local attachment min(h2d) can be ≤ rtt (rtt is a
    # separate tiny transfer, not a floor of the large one) — clamp
    # the denominator and report the raw times alongside
    out = {
        "metric": "relay_transfer_path",
        "device": str(jax.devices()[0]),
        "rtt_ms": round(rtt * 1e3, 2),
        "h2d_MBps": round(args.mb / max(min(h2d) - rtt, 1e-6), 1),
        "d2h_MBps": round(args.mb / max(min(d2h) - rtt, 1e-6), 1),
        "h2d_s_min": round(min(h2d), 6),
        "d2h_s_min": round(min(d2h), 6),
        "probe_mb": args.mb,
        "reps": args.reps,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
