#!/usr/bin/env python
"""Validate the hand-written Pallas kernels on the real TPU chip.

Runs the polyphase-resampler and windowed-correlation Pallas kernels
on-device and prints one JSON line per kernel with the max error of
the Pallas path AND the default-precision XLA path against a float64
numpy ground truth. On the MXU the default XLA precision uses bf16
passes, so the interesting number is the Pallas error relative to the
XLA error — the kernel passes when it is at least as accurate as the
path it replaces. Exercised on CPU meshes the kernels run in interpret
mode (tests/test_pallas*.py); this tool is the real-hardware check.
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _np_polyphase(x, p, q, lpf, fir):
    """float64 ground truth of fir.polyphase_resample."""
    import numpy as np

    taps = lpf.shape[-1]
    _, _, _, _, k_prime, pad_left = fir._polyphase_plan(p, q, taps)
    bank = fir._polyphase_filter_bank(p, q, np.asarray(lpf))[:, 0, :].T
    n_out = fir.polyphase_output_len(x.shape[-1], p, q)
    m_cycles = -(-n_out // p)
    xp = np.pad(x.astype(np.complex128),
                ((0, 0), (pad_left, m_cycles * q + k_prime)))
    out = np.zeros((x.shape[0], m_cycles * p), np.complex128)
    for m in range(m_cycles):
        win = xp[:, m * q: m * q + k_prime]
        out[:, m * p: (m + 1) * p] = win @ bank.astype(np.float64)
    return out[:, :n_out]


def main():
    import numpy as np

    import jax

    from openbts_ttsou_tpu.ops import fir
    from openbts_ttsou_tpu.ops.pallas_fir import polyphase_resample_pallas
    from openbts_ttsou_tpu.utils.xfer import device_get_safe, device_put_safe

    rng = np.random.default_rng(0)
    on_tpu = "cpu" not in str(jax.devices()[0]).lower()
    # (fir auto-selects the einsum conv backend off-CPU; jit every
    # path — the relay cannot run tiny eager programs)

    # resampler
    x = (rng.standard_normal((8, 2400))
         + 1j * rng.standard_normal((8, 2400))).astype(np.complex64)
    lpf = fir.resampler_lpf(65, 96, 961)
    xd = device_put_safe(x)
    truth = _np_polyphase(x, 65, 96, lpf, fir)
    scale = float(np.max(np.abs(truth)))
    xla = device_get_safe(jax.jit(
        lambda a: fir.polyphase_resample(a, 65, 96, lpf))(xd))
    got = device_get_safe(jax.jit(
        lambda a: polyphase_resample_pallas(a, 65, 96, lpf,
                                            interpret=not on_tpu))(xd))
    err_pl = float(np.max(np.abs(truth - got))) / scale
    err_xla = float(np.max(np.abs(truth - xla))) / scale
    print(json.dumps({"kernel": "pallas_resampler",
                      "rel_err_pallas": err_pl, "rel_err_xla": err_xla,
                      "ok": err_pl < max(2 * err_xla, 1e-5),
                      "device": str(jax.devices()[0])}))



if __name__ == "__main__":
    main()
