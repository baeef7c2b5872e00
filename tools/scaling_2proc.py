#!/usr/bin/env python
"""Measured 2-process scaling efficiency in the compute-dominated
regime (round-3 verdict #7).

Runs the SAME global sharded-duplex program twice on this host:
  1. one process owning all D virtual CPU devices (no DCN);
  2. two `jax.distributed` processes with D/2 devices each — every
     ppermute halo / psum clock crossing the Gloo transport.

Efficiency = per_step(1 proc) / per_step(2 proc). With enough carriers
per shard the per-step compute dwarfs the Gloo RTT, so the measured
number itself — not an RTT argument — supports the >=80% claim
(BASELINE config 5). Writes SCALING_2PROC.json.

    python tools/scaling_2proc.py --carriers 96 --devices 2 --steps 4
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_workers(nproc: int, dev_per_proc: int, carriers: int,
                steps: int, duplex: bool) -> list[dict]:
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(nproc),
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS=(f"--xla_force_host_platform_device_count="
                       f"{dev_per_proc}"),
            WORKER_CARRIERS=str(carriers),
            WORKER_VERIFY="0",
            WORKER_DUPLEX="1" if duplex else "",
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(steps)], env=env,
            stdout=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        assert p.returncode == 0, f"worker failed rc={p.returncode}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--carriers", type=int, default=96)
    ap.add_argument("--devices", type=int, default=2,
                    help="total virtual devices (time shards)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--duplex", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "SCALING_2PROC.json"))
    args = ap.parse_args()
    duplex = bool(args.duplex)

    print(f"[2proc] single-process run ({args.devices} devices, "
          f"{args.carriers} carriers)...", file=sys.stderr, flush=True)
    t0 = time.time()
    single = run_workers(1, args.devices, args.carriers, args.steps,
                         duplex)
    print(f"[2proc]   {single[0]['per_step_s']} s/step "
          f"({time.time()-t0:.0f}s wall)", file=sys.stderr, flush=True)

    print("[2proc] two-process run (Gloo DCN)...", file=sys.stderr,
          flush=True)
    t0 = time.time()
    two = run_workers(2, args.devices // 2, args.carriers, args.steps,
                      duplex)
    print(f"[2proc]   {max(w['per_step_s'] for w in two)} s/step "
          f"({time.time()-t0:.0f}s wall)", file=sys.stderr, flush=True)

    t1 = single[0]["per_step_s"]
    t2 = max(w["per_step_s"] for w in two)
    eff = t1 / t2 if t2 else 0.0
    result = {
        "metric": "two_process_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "per-step time ratio (1 proc / 2 proc), same program",
        "detail": {
            "carriers": args.carriers,
            "devices_total": args.devices,
            "steps": args.steps,
            "duplex": duplex,
            "per_step_s_1proc": t1,
            "per_step_s_2proc": t2,
            "workers_2proc": two,
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
