#!/usr/bin/env python
"""Bake-off: hand-written Pallas kernels vs their XLA counterparts.

Times each (kernel, batch-size) pair on the current backend with the
same fused-scan method as tools/stage_bench.py (one jit program scans
ITERS iterations with a carry perturbation, one scalar fetch), and
prints a JSON line per pair plus a winner per kernel. The production
defaults follow the measured winners (see ARCHITECTURE.md "Kernel
bake-off"); env vars OPENBTS_TPU_DEMOD / OPENBTS_TPU_RESAMPLE override.

Geometry mirrors production exactly:
  resample   — [n_chan, 24000] complex64, 65/96 polyphase, 961 taps
               (the rx device-rate block of UplinkSpec(frames=13))

The round-2 bake-off (table in ARCHITECTURE.md) also measured a fused
Pallas demodulator and a windowed-correlate kernel; both lost to the
XLA paths at every batch size on TPU v5 lite and were deleted —
`git show 'HEAD:openbts_ttsou_tpu/ops/pallas_demod.py'` in history.
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import numpy as np

    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openbts_ttsou_tpu.ops import fir
    from openbts_ttsou_tpu.ops.pallas_fir import polyphase_resample_pallas
    from openbts_ttsou_tpu.utils.xfer import device_put_safe

    on_tpu = "cpu" not in str(jax.devices()[0]).lower()
    iters = int(os.environ.get("BAKEOFF_ITERS", "16"))
    rng = np.random.default_rng(0)

    def probe(r):
        return jnp.sum(jnp.abs(r).astype(jnp.float32))

    def timeit(fn, x, *extra):
        @jax.jit
        def fused(x0, *ex):
            def body(c, _):
                return probe(fn(x0 * (1.0 + 1e-12 * c), *ex)), None
            out, _ = lax.scan(body, jnp.float32(0), None, length=iters)
            return out
        float(np.asarray(fused(x, *extra)))  # compile + warm + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fused(x, *extra)))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3  # ms/iter

    results = []

    def report(kernel, batch, ms_xla, ms_pallas):
        row = {"kernel": kernel, "batch": batch,
               "xla_ms": round(ms_xla, 3), "pallas_ms": round(ms_pallas, 3),
               "winner": "pallas" if ms_pallas < ms_xla else "xla",
               "device": str(jax.devices()[0])}
        results.append(row)
        print(json.dumps(row), flush=True)

    # --- polyphase resample (rx geometry: 65/96, 961 taps) ---------------
    lpf = fir.resampler_lpf(65, 96, 961)
    for n_chan in (32, 128, 512):
        x = device_put_safe(
            (rng.standard_normal((n_chan, 24000))
             + 1j * rng.standard_normal((n_chan, 24000))
             ).astype(np.complex64))
        ms_xla = timeit(lambda a: fir.polyphase_resample(a, 65, 96, lpf), x)
        ms_pl = timeit(
            lambda a: polyphase_resample_pallas(a, 65, 96, lpf,
                                                interpret=not on_tpu), x)
        report("resample_65_96_961t", n_chan, ms_xla, ms_pl)

    by_kernel = {}
    for r in results:
        by_kernel.setdefault(r["kernel"], []).append(r)
    summary = {k: ("pallas" if sum(r["pallas_ms"] < r["xla_ms"]
                                   for r in v) > len(v) / 2 else "xla")
               for k, v in by_kernel.items()}
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
