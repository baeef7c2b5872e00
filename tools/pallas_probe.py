#!/usr/bin/env python
"""Validate the hand-written Pallas kernels on the real TPU chip.

Runs the polyphase-resampler and windowed-correlation Pallas kernels
against their XLA-path references on-device and prints one JSON line
per kernel with the max abs error. Exercised on CPU meshes the kernels
run in interpret mode (tests/test_pallas*.py); this tool is the
real-hardware check.
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from openbts_ttsou_tpu.ops import fir
    from openbts_ttsou_tpu.ops.pallas_correlate import windowed_correlate
    from openbts_ttsou_tpu.ops.pallas_fir import polyphase_resample_pallas
    from openbts_ttsou_tpu.utils.xfer import device_get_safe, device_put_safe

    rng = np.random.default_rng(0)
    on_tpu = "cpu" not in str(jax.devices()[0]).lower()

    # resampler
    x = (rng.standard_normal((8, 2400))
         + 1j * rng.standard_normal((8, 2400))).astype(np.complex64)
    lpf = fir.resampler_lpf(65, 96, 961)
    xd = device_put_safe(x)
    ref = device_get_safe(fir.polyphase_resample(xd, 65, 96, lpf))
    got = device_get_safe(polyphase_resample_pallas(
        xd, 65, 96, lpf,
        interpret=not on_tpu))
    err = float(np.max(np.abs(ref - got)))
    print(json.dumps({"kernel": "pallas_resampler", "max_abs_err": err,
                      "ok": err < 1e-3, "device": str(jax.devices()[0])}))

    # windowed correlation
    xc = (rng.standard_normal((16, 157))
          + 1j * rng.standard_normal((16, 157))).astype(np.complex64)
    t = (rng.standard_normal((2, 16))
         + 1j * rng.standard_normal((2, 16))).astype(np.complex64)
    xcd, td = device_put_safe(xc), device_put_safe(t)
    ref = device_get_safe(windowed_correlate(xcd, td, 50, 21))
    got = device_get_safe(windowed_correlate(
        xcd, td, 50, 21,
        method="pallas" if on_tpu else "interpret"))
    err = float(np.max(np.abs(ref - got)))
    print(json.dumps({"kernel": "pallas_windowed_correlate",
                      "max_abs_err": err, "ok": err < 1e-3,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
