#!/usr/bin/env python
"""Wire-soak sweep on the real TPU → SOAK_r0N.json.

Runs tools/daemon_soak.py across carriers × load × submode and writes
the tracked artifact behind ARCHITECTURE.md's real-time table: the
ms/frame frontier of the block daemon through the actual 3-plane UDP
protocol on this host/relay, with measured D2H bytes per block for the
dense vs compacted result paths (round-3 verdict items 2 and 8).

    python tools/soak_sweep.py                 # full grid (~30 min)
    python tools/soak_sweep.py --quick         # 8-carrier rows only
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(carriers: int, blocks: int, exact: int, compact: int,
            ul_slots: int, dl_carriers: int, depth: int = 2,
            block_frames: int = 26) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "tools", "daemon_soak.py"),
           "--carriers", str(carriers), "--blocks", str(blocks),
           "--exact", str(exact), "--compact", str(compact),
           "--ul-slots", str(ul_slots), "--dl-carriers",
           str(dl_carriers), "--depth", str(depth),
           "--block-frames", str(block_frames)]
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=3000)
    except subprocess.TimeoutExpired:
        return {"error": "daemon_soak wedged past 3000 s (relay hang)"}
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {"error": (p.stderr or "")[-400:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "SOAK_r04.json"))
    args = ap.parse_args()

    # (carriers, exact, compact, ul_slots, dl_carriers)
    if args.quick:
        grid = [(8, 1, 1, 7, -1), (8, 1, 0, 7, -1)]
    else:
        grid = [
            # fully loaded frontier, exact (daemon default), compacted
            (8, 1, 1, 7, -1), (16, 1, 1, 7, -1), (32, 1, 1, 7, -1),
            # dense-path baseline at the same points (bytes before)
            (8, 1, 0, 7, -1), (16, 1, 0, 7, -1),
            # exact-mode cost reference vs block refresh on the wire
            (8, 0, 1, 7, -1), (16, 0, 1, 7, -1),
            # realistic partial load: 2/7 uplink slots busy, 1/4 of
            # carriers with live downlink — compaction's target regime
            (16, 1, 1, 2, 4), (32, 1, 1, 2, 8), (64, 1, 1, 2, 16),
            (128, 1, 1, 2, 32),
            # same sparse points on the dense path (bytes before)
            (32, 1, 0, 2, 8), (64, 1, 0, 2, 16),
        ]

    results = []
    for carriers, exact, compact, ul_slots, dl_c in grid:
        blocks = 25 if carriers <= 32 else 15  # 26-frame blocks
        tag = (f"c={carriers} exact={exact} compact={compact} "
               f"ul_slots={ul_slots} dl={dl_c}")
        print(f"[soak-sweep] {tag}...", file=sys.stderr, flush=True)
        r = run_one(carriers, blocks, exact, compact, ul_slots, dl_c)
        r["config"] = {"carriers": carriers, "exact": bool(exact),
                       "compact": bool(compact), "ul_slots": ul_slots,
                       "dl_carriers": dl_c}
        results.append(r)
        print(f"[soak-sweep]   -> {r.get('value')} {r.get('unit', '')} "
              f"realtime={r.get('detail', {}).get('realtime')}",
              file=sys.stderr, flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
