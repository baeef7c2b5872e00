#!/usr/bin/env python
"""Mode × carriers bench sweep on the real TPU.

Runs bench.py as a subprocess for every (mode, carriers) combination
and writes the results to BENCH_r03_sweep.json at the repo root — the
tracked artifact behind ARCHITECTURE.md's throughput table and the
choice of bench.py's default mode (the driver records only one
configuration; this sweep is the evidence for which one).

    python tools/bench_sweep.py            # full sweep (~30 min cold)
    python tools/bench_sweep.py --quick    # 128-carrier modes only
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(mode: str, carriers: int, iters: int,
            max_toa: int = 0) -> dict:
    env = dict(os.environ, BENCH_MODE=mode, BENCH_CHANNELS=str(carriers),
               BENCH_ITERS=str(iters), BENCH_MAX_TOA=str(max_toa))
    try:
        p = subprocess.run([sys.executable,
                            os.path.join(REPO, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=1500)
    except subprocess.TimeoutExpired:
        return {"error": "bench.py wedged past 1500 s (relay hang)"}
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {"error": p.stderr[-400:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_r05_sweep.json"))
    args = ap.parse_args()

    if args.quick:
        grid = [(m, 128, 0) for m in ("exact", "decoded", "downlink",
                                      "duplex", "duplex_decoded")]
    else:
        # round 5: fast mode is deleted (dominated by batched-exact at
        # every geometry, EXACT_BAKEOFF.json); every uplink/duplex row
        # is exact semantics. duplex_decoded = the fully-resident L1
        # (FEC both directions in-program) at every carrier count.
        grid = ([("exact", c, 0) for c in (8, 128, 512, 1024)]
                + [("decoded", 128, 0), ("decoded", 512, 0),
                   ("decoded", 1024, 0),
                   ("downlink", 128, 0),
                   ("downlink", 512, 0),
                   ("downlink", 1024, 0)]
                + [("duplex", c, 0) for c in (8, 128, 512, 1024)]
                + [("duplex_decoded", c, 0) for c in (128, 512, 1024)]
                # the SETMAXDELAY windowed TSC correlation
                + [("exact", 1024, 4)])

    results = []
    for mode, carriers, max_toa in grid:
        # keep the timed span well above bench.py's noise guard
        # (dt > 0.02 s): the exact engine and the downlink chain run
        # fast enough at ≤128 carriers that 8 iters is only ~20 ms
        iters = 8 if carriers <= 256 else 4
        if carriers <= 128:  # every chain clears ~25 ms of overhead
            iters = 32 if mode in ("exact", "decoded", "downlink") else 24
        print(f"[sweep] {mode} @ {carriers} max_toa={max_toa}...",
              file=sys.stderr, flush=True)
        # a wedged relay attachment never recovers in-process; a fresh
        # bench.py subprocess does (same pattern as daemon_soak)
        for attempt in range(3):
            r = run_one(mode, carriers, iters, max_toa)
            if "error" not in r and r.get("value"):
                break
            print(f"[sweep]   attempt {attempt} failed; retrying",
                  file=sys.stderr, flush=True)
        r["mode"], r["carriers"] = mode, carriers
        if max_toa:
            r["max_toa"] = max_toa
        results.append(r)
        print(f"[sweep]   -> {r.get('value')} {r.get('unit', '')}",
              file=sys.stderr, flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
