#!/usr/bin/env python
"""Roofline placement of the uplink block program on the TPU chip.

Uses XLA's own compiled-program cost model (`compiled.cost_analysis()`:
FLOPs and bytes accessed, the compiler's accounting — not an estimate)
for the fused uplink block at each carrier count, and combines it with
the measured block time (BENCH_r03_sweep.json if present, else a quick
in-process timing) to place each configuration against the chip's
compute and HBM-bandwidth ceilings.

This is the evidence behind ARCHITECTURE.md's roofline note: what bound
the 512→1024-carrier falloff, and how far from speed-of-light the
chain runs.

Caveats on reading the numbers:
- "bytes accessed" is the pre-fusion logical count — an upper bound on
  HBM traffic (fusion keeps intermediates on-chip), which is why the
  fast mode's achieved GB/s can exceed nominal HBM bandwidth.
- XLA counts a lax.scan body ONCE, not per trip: `exact` mode's
  figures are per-frame-body counts plus the front-end, NOT the
  13-frame block totals, so compare exact rows to fast rows only via
  the measured wall-clock columns.

    python tools/roofline.py                 # 128/512/1024, fast mode
    BENCH_MODE=exact python tools/roofline.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# TPU v5e (v5 lite) public peaks: 197 TFLOP/s bf16, one QUARTER of
# that for fp32 matmul on the MXU (fp32 operands take 4 bf16 passes),
# 819 GB/s HBM BW.
PEAK_BF16 = 197e12
PEAK_F32 = 49e12  # fp32 matmul on the MXU (no bf16 downcast in this chain)
PEAK_HBM = 819e9


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openbts_ttsou_tpu.models.transceiver import (UplinkSpec,
                                                      uplink_block)
    from openbts_ttsou_tpu.trx import ChanType, TrxConfig, init_state
    from openbts_ttsou_tpu.utils.xfer import device_put_safe

    mode = os.environ.get("BENCH_MODE", "exact")
    max_toa = int(os.environ.get("BENCH_MAX_TOA", "0")) or None
    block_fn = {"exact": uplink_block}[mode]
    spec = UplinkSpec(frames=13)

    # measured seconds-per-block from the sweep artifact, if present
    sweep = {}
    sweep_path = os.path.join(REPO, "BENCH_r03_sweep.json")
    if os.path.exists(sweep_path):
        for r in json.load(open(sweep_path)):
            d = r.get("detail", {})
            if (r.get("mode") == mode and d
                    and d.get("max_toa") == max_toa):
                sweep[r["carriers"]] = (d["seconds"] / d["iters"],
                                        r["value"])

    rows = []
    for n_chan in (128, 512, 1024):
        cfg = TrxConfig(n_chan=n_chan, max_toa=max_toa)
        chan_type = np.zeros((n_chan, 8), np.int32)
        chan_type[:, 1:] = ChanType.I
        chan_type[:, 0] = ChanType.IV
        state = init_state(cfg)._replace(
            chan_type=jnp.asarray(chan_type))
        rng = np.random.default_rng(0)
        dev = device_put_safe(
            (rng.standard_normal((n_chan, spec.block_in))
             + 1j * rng.standard_normal((n_chan, spec.block_in))
             ).astype(np.complex64) * 50)

        lowered = jax.jit(
            lambda s, x: block_fn(cfg, spec, s, x)).lower(state, dev)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))

        t_block, msps = sweep.get(n_chan, (None, None))
        row = {
            "carriers": n_chan,
            "mode": mode,
            "max_toa": max_toa,
            "gflop_per_block": round(flops / 1e9, 2),
            "mb_per_block": round(byts / 1e6, 1),
            "arith_intensity_flop_per_byte": round(flops / byts, 2),
            # the knee of the v5e fp32 roofline sits at 49e12/819e9 ≈ 60
            # FLOP/byte; intensity below that ⇒ HBM-bandwidth-bound
        }
        if t_block:
            row.update({
                "measured_ms_per_block": round(t_block * 1e3, 2),
                "Msps": msps,
                "achieved_tflops": round(flops / t_block / 1e12, 3),
                "achieved_GBps": round(byts / t_block / 1e9, 1),
                "pct_hbm_peak": round(100 * byts / t_block / PEAK_HBM, 1),
                "pct_f32_peak": round(100 * flops / t_block / PEAK_F32, 1),
            })
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
