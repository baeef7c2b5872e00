"""Convolution, FIR design and polyphase rational resampling.

Reference behavior: `Transceiver/sigProcLib.cpp:267-408` (convolve with
span modes), `:1102-1150` (createLPF), `:1154-1210`
(polyphaseResampleVector), and the 52M CUSTOM windowed span
(`Transceiver52M/sigProcLib.h:47`).

TPU-first design notes
----------------------
* The reference convolves one pointer-chased vector at a time; here every
  convolution is a batched `lax.conv_general_dilated` over a
  ``[batch, time]`` layout, which XLA lowers to MXU matmuls.
* Complex convolution is decomposed into real convolutions (3 or 4 real
  planes) because the MXU is a real systolic array; static ``a_real`` /
  ``b_real`` flags skip dead planes exactly like the reference's
  `isRealOnly` fast paths.
* The polyphase resampler is expressed as a single strided/dilated
  convolution (zero-stuff by P → FIR → take every Q-th output), instead
  of the reference's per-output-branch scalar loop. The group-delay
  offset (`(len-1)/2/Q`, sigProcLib.cpp:1177) is folded into the
  convolution padding.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Span modes, mirroring ConvType (Transceiver/sigProcLib.h:41-48 + 52M CUSTOM).
FULL_SPAN = "full"
OVERLAP_ONLY = "overlap"
START_ONLY = "start"
WITH_TAIL = "with_tail"
NO_DELAY = "no_delay"
CUSTOM = "custom"


def _as_2d(x: Array):
    """Collapse leading axes to one batch axis; return (x2d, unflatten)."""
    lead = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    return x2, lead


# Convolution backend: "conv" uses lax.conv_general_dilated; "einsum"
# lowers everything to slice-window contractions (pure MXU matmuls) —
# needed on TPU backends where the strided conv op is slow or
# unsupported (the axon relay errors on it). Resolution order: the
# OPENBTS_TPU_CONV env var, then an explicit CONV_IMPL assignment, then
# the backend default (einsum on anything that is not CPU).
import os

CONV_IMPL = os.environ.get("OPENBTS_TPU_CONV")  # None → auto

# Resampler backend: "xla" (the mm filter-bank path) or "pallas" (the
# VMEM slab kernel in ops/pallas_fir.py). "auto" follows the round-2
# bake-off on TPU v5 lite (tools/kernel_bakeoff.py; table in
# ARCHITECTURE.md): pallas wins only at small batch (≤64 rows), XLA
# everywhere else.
RESAMPLE_IMPL = os.environ.get("OPENBTS_TPU_RESAMPLE")  # None → auto
_PALLAS_RESAMPLE_MAX_BATCH = 64


def _resample_use_pallas(x, q: int) -> bool:
    """Measured-fastest dispatch for `polyphase_resample` (method='mm')."""
    if RESAMPLE_IMPL == "xla":
        return False
    if q > 128:  # the kernel's q-row lane layout needs q ≤ one lane tile
        return False
    if RESAMPLE_IMPL == "pallas":
        return True
    # auto: pallas only wins on TPU at small batch (bake-off table)
    try:
        import jax as _jax

        if _jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    batch = 1
    for d in x.shape[:-1]:
        batch *= int(d)
    return batch <= _PALLAS_RESAMPLE_MAX_BATCH


def _conv_impl() -> str:
    if CONV_IMPL in ("conv", "einsum"):
        return CONV_IMPL
    try:
        import jax as _jax

        return "conv" if _jax.default_backend() == "cpu" else "einsum"
    except Exception:
        return "conv"


def _windows(a: Array, lb: int, stride: int = 1,
             pad: tuple[int, int] = (0, 0)) -> Array:
    """[B, T] → sliding windows [B, n_out, lb] (zero-padded).

    Unit-stride windows are built from lb stride-1 slices (cheap
    relayouts XLA fuses away); TPU gathers run element-at-a-time and
    dominate the profile otherwise. Strided windows keep the gather.
    """
    ap = jnp.pad(a, ((0, 0), pad))
    t = ap.shape[-1]
    n_out = (t - lb) // stride + 1
    if stride == 1 and lb <= 128:
        return jnp.stack(
            [lax.slice_in_dim(ap, u, u + n_out, axis=-1)
             for u in range(lb)], axis=-1)
    idx = (np.arange(n_out)[:, None] * stride + np.arange(lb)[None, :])
    return ap[:, jnp.asarray(idx)]


def _real_conv_full(a: Array, b: Array) -> Array:
    """Real full convolution along the last axis.

    a: [B, La] float32. b: [Lb] (shared) or [B, Lb] (per-batch) float32.
    Returns [B, La + Lb - 1].
    """
    B, La = a.shape
    b = jnp.asarray(b, a.dtype)
    Lb = b.shape[-1]
    bk = jnp.flip(b, axis=-1)  # XLA convs are cross-correlations
    pad = [(Lb - 1, Lb - 1)]
    if b.ndim == 1:
        if _conv_impl() == "einsum":
            t_out = La + Lb - 1
            if 16 <= Lb <= 128 and t_out <= 512:
                # Banded-matrix MXU path: out[t] = Σ_j ap[t+j]·bk[j] is
                # one [B, t_out+Lb−1] @ [t_out+Lb−1, t_out] matmul
                # against the trace-time constant M[s, v] = bk[s−v]
                # (zero off the band). No window duplication, and the
                # burst-length correlations move off the VPU onto the
                # MXU — measured ~3× over shift-and-accumulate on the
                # 41-tap RACH correlator at large batch.
                ap = jnp.pad(a, ((0, 0), (Lb - 1, Lb - 1)))
                s = jnp.arange(t_out + Lb - 1)[:, None]
                v = jnp.arange(t_out)[None, :]
                d = s - v
                m = jnp.where((d >= 0) & (d < Lb),
                              bk[jnp.clip(d, 0, Lb - 1)], 0.0)
                return jnp.matmul(ap, m, precision=lax.Precision.HIGHEST)
            if Lb <= 128:
                # Shift-and-accumulate over Lb stride-1 slices: XLA
                # fuses it into one VPU stencil pass. The windowed
                # einsum below materializes [B, T_out, Lb] (hundreds of
                # MB at bench batch sizes) for what is only a matvec —
                # measured 4-6x slower on the RACH correlator.
                ap = jnp.pad(a, ((0, 0), (Lb - 1, Lb - 1)))
                acc = lax.slice_in_dim(ap, 0, t_out, axis=-1) * bk[0]
                for j in range(1, Lb):
                    acc = acc + (lax.slice_in_dim(ap, j, j + t_out,
                                                  axis=-1) * bk[j])
                return acc
            wins = _windows(a, Lb, pad=(Lb - 1, Lb - 1))
            return jnp.einsum("btj,j->bt", wins, bk,
                              precision=lax.Precision.HIGHEST)
        out = lax.conv_general_dilated(
            a[:, None, :], bk[None, None, :], (1,), pad,
            precision=lax.Precision.HIGHEST,
        )
        return out[:, 0, :]
    # Per-batch filters. A grouped convolution with thousands of groups
    # lowers poorly on TPU, and a gathered [B, T_out, Lb] einsum pays an
    # element-at-a-time gather for the windows. For the short per-burst
    # filters of the hot path (fractional delay 21 taps, DFE
    # feedforward 7) a shift-and-accumulate over Lb stride-1 slices
    # fuses into pure VPU FMAs.
    t_out = La + Lb - 1
    ap = jnp.pad(a, ((0, 0), (Lb - 1, Lb - 1)))
    if Lb <= 128:
        acc = lax.slice_in_dim(ap, 0, t_out, axis=-1) * bk[:, 0][:, None]
        for j in range(1, Lb):
            acc = acc + (lax.slice_in_dim(ap, j, j + t_out, axis=-1)
                         * bk[:, j][:, None])
        return acc
    idx = np.arange(t_out)[:, None] + np.arange(Lb)[None, :]
    wins = ap[:, jnp.asarray(idx)]  # [B, T_out, Lb]
    return jnp.einsum("btj,bj->bt", wins, bk,
                      precision=lax.Precision.HIGHEST)


def conv_full_complex(a: Array, b: Array, *, a_real: bool = False,
                      b_real: bool = False) -> Array:
    """Complex full convolution via real planes. Shapes as _real_conv_full."""
    ar = jnp.real(a).astype(jnp.float32)
    br = jnp.real(b).astype(jnp.float32)
    if a_real and b_real:
        return _real_conv_full(ar, br).astype(jnp.complex64)
    if a_real:
        bi = jnp.imag(b).astype(jnp.float32)
        return (_real_conv_full(ar, br) + 1j * _real_conv_full(ar, bi)).astype(
            jnp.complex64)
    if b_real:
        ai = jnp.imag(a).astype(jnp.float32)
        return (_real_conv_full(ar, br) + 1j * _real_conv_full(ai, br)).astype(
            jnp.complex64)
    ai = jnp.imag(a).astype(jnp.float32)
    bi = jnp.imag(b).astype(jnp.float32)
    rr = _real_conv_full(ar, br)
    ii = _real_conv_full(ai, bi)
    ri = _real_conv_full(ar, bi)
    ir = _real_conv_full(ai, br)
    return ((rr - ii) + 1j * (ri + ir)).astype(jnp.complex64)


def _mode_window(La: int, Lb: int, mode: str, start: Optional[int],
                 length: Optional[int]):
    """(start, size) into the full convolution, per span mode.

    Mirrors the startIndex/outSize switch at sigProcLib.cpp:276-304.
    Out-of-range taps read as zero (the reference's iterator guards).
    """
    if mode == FULL_SPAN:
        return 0, La + Lb - 1
    if mode == OVERLAP_ONLY:
        return La, abs(La - Lb) + 1
    if mode == START_ONLY:
        return 0, La
    if mode == WITH_TAIL:
        return Lb, La
    if mode == NO_DELAY:
        return (Lb // 2 if Lb % 2 else Lb // 2 - 1), La
    if mode == CUSTOM:
        if start is None or length is None:
            raise ValueError("custom span needs start and length")
        return start, length
    raise ValueError(f"unknown span mode {mode!r}")


def convolve(a: Array, b: Array, mode: str = FULL_SPAN, *,
             a_real: bool = False, b_real: bool = False,
             start: Optional[int] = None,
             length: Optional[int] = None) -> Array:
    """Batched complex convolution with the reference's span modes.

    a: [..., La]; b: [Lb] shared or [..., Lb] per-batch (leading axes must
    match a's). Returns [..., outSize] complex64.
    """
    a2, lead = _as_2d(jnp.asarray(a))
    if jnp.asarray(b).ndim > 1:
        b2 = jnp.asarray(b).reshape((-1, jnp.asarray(b).shape[-1]))
    else:
        b2 = jnp.asarray(b)
    La, Lb = a2.shape[-1], b2.shape[-1]
    s, n = _mode_window(La, Lb, mode, start, length)
    full = conv_full_complex(a2, b2, a_real=a_real, b_real=b_real)
    # Zero-pad so any window inside [0, s+n) is valid.
    deficit = s + n - full.shape[-1]
    if deficit > 0:
        full = jnp.pad(full, ((0, 0), (0, deficit)))
    out = lax.slice_in_dim(full, s, s + n, axis=-1)
    return out.reshape(lead + (n,))


def correlate(a: Array, b: Array, mode: str = NO_DELAY, *,
              a_real: bool = False, b_real: bool = False,
              start: Optional[int] = None,
              length: Optional[int] = None) -> Array:
    """Correlation = convolution with the time-reversed conjugate of b.

    (reference: Transceiver/sigProcLib.cpp:474-503; the 52M variant
    precomputes reversed-conjugated templates — here that fold happens at
    trace time, so it is free after jit.)
    """
    brc = jnp.flip(jnp.conj(jnp.asarray(b)), axis=-1)
    return convolve(a, brc, mode, a_real=a_real, b_real=b_real,
                    start=start, length=length)


@functools.lru_cache(maxsize=None)
def design_lpf(cutoff: float, num_taps: int, dc_gain: float = 1.0) -> np.ndarray:
    """Windowed-sinc low-pass FIR, DC-gain normalized.

    Same design rule as the reference's (commented) general createLPF loop
    (Transceiver/sigProcLib.cpp:1106-1118): sinc at `cutoff` (normalized to
    the sampling rate), Hamming-family window over L+1, then scale so the
    tap sum equals `dc_gain` (sigProcLib.cpp:1141-1147). The reference
    ships two baked tables (rcvLPF_651/sendLPF_961) produced by this rule;
    we synthesize them.
    """
    i = np.arange(num_taps, dtype=np.float64)
    t = i - (num_taps + 1) / 2.0
    ys = np.sinc(2.0 * cutoff * t)  # sin(2π fc t)/(2π fc t)
    yw = 0.53836 - 0.46164 * np.cos(2.0 * np.pi * i / (num_taps + 1))
    taps = ys * yw
    taps *= dc_gain / taps.sum()
    return taps.astype(np.float32)


def resampler_lpf(p: int, q: int, num_taps: int) -> np.ndarray:
    """LPF for a P/Q rational resampler: anti-image/anti-alias cutoff
    0.5/max(P,Q) (at the P-upsampled rate), DC gain P.

    The reference requests 651 taps for the 96/65 send path and 961 for
    the 65/96 receive path (Transceiver/radioInterface.cpp:130-133,
    218-222); createLPF ignores the requested cutoff and loads baked
    tables (sigProcLib.cpp:1122-1138) whose measured cutoff is ≈0.5/96 —
    the textbook choice reproduced here. The chain is then
    amplitude-preserving (unit passband gain after the DC-gain-P
    normalization at sigProcLib.cpp:1141-1147).
    """
    cutoff = 0.5 / max(p, q)
    return design_lpf(cutoff, num_taps, dc_gain=float(p))


def polyphase_output_len(in_len: int, p: int, q: int) -> int:
    """ceil(in_len * P / Q) (sigProcLib.cpp:1171)."""
    return -(-in_len * p // q)


@functools.lru_cache(maxsize=None)
def _polyphase_plan(p: int, q: int, taps: int):
    """Static per-(P,Q,filter) geometry for the matmul-form resampler.

    Output i corresponds to full-conv index j=(i0+i)·q with branch
    j mod p and input offset j//p. Outputs sharing i mod p share a
    branch and advance q input samples per step — so the whole resampler
    is ONE strided convolution with p output channels (the polyphase
    branches as a [p, K'] filter bank) followed by a phase interleave.
    This keeps the MXU fed with dense work (≈taps/p MACs per output)
    instead of convolving through the zero-stuffed upsampled signal.
    """
    i0 = (taps - 1) // 2 // q
    r = np.arange(p)
    j = (i0 + r) * q
    branch = j % p
    off = j // p
    k_max = -(-taps // p)  # ceil: taps per branch
    min_off = int(off.min())
    delta = off - min_off
    k_prime = k_max + int(delta.max())
    pad_left = (k_max - 1) - min_off
    return i0, branch, delta, k_max, k_prime, pad_left


def _polyphase_filter_bank(p: int, q: int, lpf: np.ndarray) -> np.ndarray:
    """rhs [p, 1, K'] float32 for the strided conv (see _polyphase_plan)."""
    taps = len(lpf)
    _, branch, delta, k_max, k_prime, _ = _polyphase_plan(p, q, taps)
    rhs = np.zeros((p, 1, k_prime), np.float32)
    lpf = np.asarray(lpf, np.float32)
    for r in range(p):
        for t in range(k_max):
            h_idx = branch[r] + t * p
            if h_idx < taps:
                rhs[r, 0, (k_max - 1) + delta[r] - t] = lpf[h_idx]
    return rhs


def polyphase_resample_mm(x: Array, p: int, q: int, lpf: Array, *,
                          x_real: bool = False) -> Array:
    """Matmul-form P/Q resampler: identical output to
    `polyphase_resample`, computed as one p-output-channel strided
    convolution (the TPU-native polyphase formulation)."""
    x2, lead = _as_2d(jnp.asarray(x))
    if isinstance(lpf, jax.core.Tracer):
        raise TypeError(
            "polyphase_resample_mm needs a concrete (numpy) filter — the "
            "bank layout is built at trace time; pass the design-time LPF "
            "array, not a traced value")
    lpf_np = np.asarray(lpf)
    taps = lpf_np.shape[-1]
    T = x2.shape[-1]
    n_out = polyphase_output_len(T, p, q)
    _, _, _, k_max, k_prime, pad_left = _polyphase_plan(p, q, taps)
    m_cycles = -(-n_out // p)
    # required right padding so the conv yields m_cycles windows
    need = (m_cycles - 1) * q + k_prime
    pad_right = max(0, need - pad_left - T)
    rhs = jnp.asarray(_polyphase_filter_bank(p, q, lpf_np))

    def _plane(xr):
        if _conv_impl() == "einsum":
            # strided windows [B, M, K'] × bank [p, K'] → [B, M, p]
            wins = _windows(xr, k_prime, stride=q,
                            pad=(pad_left, pad_right))[:, :m_cycles]
            out = jnp.einsum("bmu,pu->bmp", wins, rhs[:, 0, :],
                             precision=lax.Precision.HIGHEST)
            return out.reshape(out.shape[0], -1)[:, :n_out]
        out = lax.conv_general_dilated(
            xr[:, None, :], rhs, window_strides=(q,),
            padding=[(pad_left, pad_right)],
            precision=lax.Precision.HIGHEST,
        )  # [B, p, M]
        out = out[:, :, :m_cycles]
        # interleave phases: out[i = m·p + r] = out[r, m]
        return jnp.transpose(out, (0, 2, 1)).reshape(out.shape[0], -1)[
            :, :n_out]

    re = _plane(jnp.real(x2).astype(jnp.float32))
    if x_real:
        res = re.astype(jnp.complex64)
    else:
        im = _plane(jnp.imag(x2).astype(jnp.float32))
        res = (re + 1j * im).astype(jnp.complex64)
    return res.reshape(lead + (n_out,))


def polyphase_resample(x: Array, p: int, q: int, lpf: Array, *,
                       x_real: bool = False,
                       method: str = "mm") -> Array:
    """P/Q rational resampling with group-delay compensation.

    x: [..., T]. Returns [..., ceil(T*P/Q)] complex64. Matches the
    reference's branch indexing (sigProcLib.cpp:1177-1205): output i is
    the full convolution of the P-zero-stuffed input with the LPF,
    sampled at index (i0 + i)*Q where i0 = (len(lpf)-1)//(2*Q).

    method "mm" (default) uses the dense polyphase filter-bank
    formulation (`polyphase_resample_mm`); "dilated" keeps the direct
    zero-stuffed dilated convolution (reference formulation, used for
    cross-checking).
    """
    if method == "mm":
        if _resample_use_pallas(x, q):
            from openbts_ttsou_tpu.ops.pallas_fir import (
                polyphase_resample_pallas,
            )

            try:
                import jax as _jax

                interpret = _jax.default_backend() == "cpu"
            except Exception:
                interpret = True
            return polyphase_resample_pallas(x, p, q, np.asarray(lpf),
                                             x_real=x_real,
                                             interpret=interpret)
        return polyphase_resample_mm(x, p, q, lpf, x_real=x_real)
    x2, lead = _as_2d(jnp.asarray(x))
    lpf = jnp.asarray(lpf)
    Lh = lpf.shape[-1]
    T = x2.shape[-1]
    n_out = polyphase_output_len(T, p, q)
    i0 = (Lh - 1) // 2 // q
    pad_left = Lh - 1 - i0 * q
    eff_len = (T - 1) * p + 1  # zero-stuffed input length
    last_idx = (i0 + n_out - 1) * q  # last full-conv index needed
    pad_right = max(0, last_idx - pad_left - eff_len + Lh)

    def _plane(xr):
        out = lax.conv_general_dilated(
            xr[:, None, :],
            jnp.flip(lpf.astype(jnp.float32))[None, None, :],
            window_strides=(q,),
            padding=[(pad_left, pad_right)],
            lhs_dilation=(p,),
            precision=lax.Precision.HIGHEST,
        )
        return out[:, 0, :n_out]

    re = _plane(jnp.real(x2).astype(jnp.float32))
    if x_real:
        out = re.astype(jnp.complex64)
    else:
        im = _plane(jnp.imag(x2).astype(jnp.float32))
        out = (re + 1j * im).astype(jnp.complex64)
    return out.reshape(lead + (n_out,))
