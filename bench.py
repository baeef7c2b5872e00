#!/usr/bin/env python
"""Benchmark: uplink DSP chain throughput on one TPU chip.

Runs the flagship pipeline — 961-tap polyphase resample (65/96) →
energy detect → TSC/RACH correlate → peak detect → channel est/DFE →
demodulate — batched over many ARFCN channels, and reports device-rate
complex Msamples/s/chip. Baseline: the REAL reference sigProcLib chain
compiled from /root/reference (bench/ref_bench.cpp), measured
single-core on this machine and cached; bench/cpu_baseline.cpp (a
hand-written mirror) is the fallback when the reference is absent.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_CACHE = os.path.join(REPO, "bench", "baseline_cpu.json")
REF_BASELINE_CACHE = os.path.join(REPO, "bench", "baseline_ref.json")
REF_DIR = "/root/reference"


def measure_mirror_baseline() -> float:
    """Hand-written single-core mirror of the hot path (fallback)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["samples_per_s"]
    exe = os.path.join(REPO, "bench", "cpu_baseline")
    src = os.path.join(REPO, "bench", "cpu_baseline.cpp")
    subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src], check=True)
    out = subprocess.run([exe, "400"], check=True, capture_output=True,
                        text=True).stdout.strip()
    data = json.loads(out)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(data, f)
    return data["samples_per_s"]


def measure_ref_baseline() -> dict:
    """The REAL reference sigProcLib chains, compiled from
    /root/reference (bench/ref_bench.cpp): the uplink receive chain,
    the downlink transmit chain, and the full duplex per-block work.
    Returns {} if the reference tree is unavailable (the mirror then
    stands in)."""
    src = os.path.join(REPO, "bench", "ref_bench.cpp")
    if os.path.exists(REF_BASELINE_CACHE):
        with open(REF_BASELINE_CACHE) as f:
            cached = json.load(f)
        if "samples_per_s_duplex" in cached:  # current harness rev
            return cached
    if not os.path.isdir(os.path.join(REF_DIR, "Transceiver")):
        return {}
    exe = os.path.join(REPO, "bench", "ref_bench")
    try:
        if (not os.path.exists(exe)
                or os.path.getmtime(exe) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-include", "unistd.h",
                 "-I" + os.path.join(REF_DIR, "CommonLibs"),
                 "-I" + os.path.join(REF_DIR, "Transceiver"),
                 "-I" + os.path.join(REF_DIR, "GSM"),
                 "-o", exe, src,
                 os.path.join(REF_DIR, "Transceiver", "sigProcLib.cpp"),
                 os.path.join(REF_DIR, "GSM", "GSMCommon.cpp")]
                + [os.path.join(REF_DIR, "CommonLibs", f + ".cpp")
                   for f in ("BitVector", "Logger", "Sockets", "Threads",
                             "Timeval", "Configuration")]
                + ["-lpthread"], check=True, capture_output=True)
        best = None
        for _ in range(3):
            out = subprocess.run([exe, "400"], check=True,
                                 capture_output=True, text=True
                                 ).stdout.strip()
            data = json.loads(out)
            if best is None or data["samples_per_s"] > best["samples_per_s"]:
                best = data
    except (subprocess.CalledProcessError, OSError, json.JSONDecodeError):
        return {}
    with open(REF_BASELINE_CACHE, "w") as f:
        json.dump(best, f)
    return best


def measure_cpu_baseline(mode: str) -> tuple:
    """Returns (baseline_sps, harness_name, mirror_sps) for the given
    bench mode's chain (uplink modes / downlink / duplex)."""
    mirror = measure_mirror_baseline()
    ref = measure_ref_baseline()
    key = {"downlink": "samples_per_s_downlink",
           "duplex": "samples_per_s_duplex",
           "duplex_decoded": "samples_per_s_duplex"}.get(
               mode, "samples_per_s")
    if ref.get(key, 0.0) > 0.0:
        return ref[key], "reference sigProcLib", mirror
    return mirror, "hand-written mirror", mirror


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    import numpy as np

    # Defaults follow the tracked sweep artifacts (tools/bench_sweep.py
    # → BENCH_r0N_sweep.json): the exact engine — the faithful mode,
    # the live daemon's frame-walk semantics — measures fastest at
    # production carrier counts (1464 Msps at 512 in BENCH_r04_sweep),
    # so the driver-recorded default is the best faithful configuration.
    n_chan = int(os.environ.get("BENCH_CHANNELS", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    # exact | decoded (uplink) | downlink | duplex | duplex_decoded
    mode = os.environ.get("BENCH_MODE", "exact")

    baseline_sps, baseline_harness, mirror_sps = measure_cpu_baseline(mode)

    import jax

    # Persistent compilation cache: the first TPU compile of the full
    # pipeline is expensive (slow host + relay); later runs reuse it.
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    # conv backend: fir._conv_impl() auto-selects einsum on non-CPU
    # backends (the axon relay errors on strided convolutions)
    from openbts_ttsou_tpu.models.transceiver import (
        UplinkSpec,
        uplink_block,
        uplink_block_decoded,
    )
    from openbts_ttsou_tpu.ops import gmsk
    from openbts_ttsou_tpu.trx import ChanType, TrxConfig, init_state
    from openbts_ttsou_tpu.utils import constants as C

    # BENCH_MAX_TOA=<symbols> applies the 52M windowed TSC correlation
    # (2·maxTOA+1 lags) — the SETMAXDELAY-driven compute win
    max_toa = int(os.environ.get("BENCH_MAX_TOA", "0")) or None
    # BENCH_RACH_SLOTS: comma-separated TNs that can carry RACH, or
    # "all" for the dense engine (the default: measured FASTER than the
    # restricted path at production carrier counts — 1526 vs 1346 Msps
    # at exact@512 — because the full [C·8]-burst batch keeps the VPU
    # lanes full where the per-slot slice leaves them under-occupied).
    rs_env = os.environ.get("BENCH_RACH_SLOTS", "all")
    rach_slots = None if rs_env == "all" else tuple(
        int(t) for t in rs_env.split(","))
    log(f"devices={jax.devices()} mode={mode} chan={n_chan} "
        f"iters={iters} max_toa={max_toa} rach_slots={rach_slots}")
    cfg = TrxConfig(n_chan=n_chan, max_toa=max_toa,
                    rach_slots=rach_slots)
    spec = UplinkSpec(frames=13)

    chan_type = np.zeros((n_chan, 8), np.int32)
    chan_type[:, 1:] = ChanType.I
    chan_type[:, 0] = ChanType.IV
    state = init_state(cfg)._replace(chan_type=jnp.asarray(chan_type))

    # synthesize device-rate IQ with real bursts planted (keeps every
    # detection path honest; compute is data-independent anyway)
    rng = np.random.default_rng(0)
    sym = (rng.standard_normal((n_chan, spec.block_symbols))
           + 1j * rng.standard_normal((n_chan, spec.block_symbols))
           ).astype(np.complex64) * 10.0
    bits = np.concatenate(
        [[0, 0, 0], rng.integers(0, 2, 57), [1], C.TRAINING_SEQUENCE[0], [1],
         rng.integers(0, 2, 57), [0, 0, 0]]).astype(np.uint8)
    wave = 9000.0 * gmsk.modulate_burst_np(bits[None], 1)[0]
    for c in range(n_chan):
        for f in range(spec.frames):
            off = f * 1250 + 157
            sym[c, off: off + 148] += wave
    from openbts_ttsou_tpu.ops import fir
    from openbts_ttsou_tpu.utils.xfer import device_put_safe
    _lpf_up = fir.resampler_lpf(96, 65, 651)
    # tiny end-to-end relay check first: compile+exec+fetch a scalar
    log("relay check: scalar round trip")
    chk = jax.jit(lambda a: jnp.sum(a * a))(jnp.asarray(
        np.ones((128,), np.float32)))
    float(np.asarray(chk))
    log("relay check done; prep: compiling+running device-rate resample")
    dev = jax.jit(
        lambda s: fir.polyphase_resample(s, 96, 65, _lpf_up)
        [:, : spec.block_in]
    )(device_put_safe(sym))  # one compiled prep program
    # force prep execution to complete before timing anything
    float(np.asarray(jnp.sum(jnp.abs(dev[:, :8]))))
    log("prep done (synced)")

    # One fused program: scan `iters` chained uplink blocks and return a
    # scalar probe. Exactly one compile, one execute, one device→host
    # fetch per run — immune to per-dispatch relay overhead (the axon
    # relay's block_until_ready is async; a result fetch is the only
    # true synchronization).
    import jax.lax as lax

    if mode in ("downlink", "duplex", "duplex_decoded"):
        from openbts_ttsou_tpu.models.transceiver import (
            RX_HALO_DEV,
            TX_TAIL_SYM,
            downlink_block,
            duplex_block_decoded,
            duplex_block_wire,
        )

        rng2 = np.random.default_rng(1)
        dl_bits = jnp.asarray(rng2.integers(
            0, 2, (spec.frames, n_chan, 8, 148)).astype(np.uint8))
        dl_valid = jnp.asarray(np.ones((spec.frames, n_chan, 8), bool))
        dl_atten = jnp.asarray(np.zeros((spec.frames, n_chan, 8),
                                        np.float32))

    if mode == "downlink":
        def make_fused(length):
            @jax.jit
            def fused(state, samples):
                del samples

                def body(fn, _):
                    # perturb the gains by the loop counter: tx_step
                    # ignores fn, so an unperturbed body is
                    # loop-invariant and XLA hoists the entire block
                    # out of the scan (measured dt ≈ 0 at any length)
                    a = dl_atten + (fn % 977).astype(jnp.float32) * 1e-6
                    tx = downlink_block(cfg, spec, state, dl_bits,
                                        dl_valid, a, fn)
                    return fn + spec.frames, (jnp.sum(jnp.real(tx[..., 0])),
                                              jnp.sum(dl_valid))
                _, (probes, dets) = lax.scan(
                    body, jnp.asarray(0, jnp.int32), None, length=length)
                return jnp.sum(probes), jnp.sum(dets)
            return fused
    elif mode == "duplex":
        # uplink samples in the daemon's int16 ADC format, halo'd
        ul_i16 = jax.jit(lambda s: jnp.clip(jnp.round(jnp.stack(
            [jnp.real(s), jnp.imag(s)], -1)), -32767, 32767
        ).astype(jnp.int16))(jnp.pad(
            dev, ((0, 0), (RX_HALO_DEV, RX_HALO_DEV))))

        def make_fused(length):
            @jax.jit
            def fused(state, samples):
                del samples
                tail0 = jnp.zeros((n_chan, TX_TAIL_SYM), jnp.complex64)

                def body(carry, _):
                    st, tail, fn = carry
                    # carrier roll + gain perturbation defeat
                    # loop-invariant hoisting of the rx resample
                    # front-end and the whole tx modulate+resample leg
                    # (tx_step is fn-independent; see the uplink and
                    # downlink modes)
                    ul = jnp.roll(ul_i16, fn % 3, axis=0)
                    da = dl_atten + (fn % 977).astype(jnp.float32) * 1e-6
                    st2, tx, tail2, wire = duplex_block_wire(
                        cfg, spec, st, ul, tail, dl_bits, dl_valid,
                        da, fn, True)
                    probe = (jnp.sum(wire.soft_u8[..., 0].astype(
                        jnp.int32)) + jnp.sum(tx[:, 0, :].astype(
                            jnp.int32)))
                    return (st2, tail2, fn + spec.frames), \
                        (probe, jnp.sum(wire.detected))
                carry, (probes, dets) = lax.scan(
                    body, (state, tail0, jnp.asarray(0, jnp.int32)),
                    None, length=length)
                return jnp.sum(probes), jnp.sum(dets)
            return fused
    elif mode == "duplex_decoded":
        # the fully-resident configuration: FEC both directions INSIDE
        # the device program — XCCH + TCH/FS + FACCH encode on the tx
        # leg, streaming XCCH/RACH/TCH decode on the rx leg; L2 frames
        # and vocoder bits are the only host payloads
        from openbts_ttsou_tpu.gsm import l1fec
        from openbts_ttsou_tpu.models.transceiver import (
            DECODE_PRELUDE,
            XcchTxCarry,
            duplex_block_decoded as _dbd,
        )

        rng3 = np.random.default_rng(2)
        tch_mask = np.zeros((n_chan, 8), bool)
        tch_mask[:, 2:6] = True  # 4 TCH slots, 4 signalling slots
        frames184 = jnp.asarray(rng3.integers(
            0, 2, (4, n_chan, 8, 184)).astype(np.uint8))
        xv = jnp.asarray(np.ones((4, n_chan, 8), bool))
        speech = jnp.asarray(rng3.integers(
            0, 2, (3, n_chan, 8, 260)).astype(np.uint8))
        spv = jnp.asarray(np.ones((3, n_chan, 8), bool))
        facch = jnp.zeros((3, n_chan, 8, 184), jnp.uint8)
        fav = jnp.zeros((3, n_chan, 8), bool)
        content = (frames184, xv, speech, spv, facch, fav,
                   jnp.asarray(tch_mask))

        def make_fused(length):
            @jax.jit
            def fused(state, samples):
                # the halo'd uplink comes from the ARGUMENT (a
                # complex64 closure constant would need a host fetch
                # the relay cannot do)
                ul_halo = jnp.pad(samples,
                                  ((0, 0), (RX_HALO_DEV, RX_HALO_DEV)))
                tail0 = jnp.zeros((n_chan, TX_TAIL_SYM), jnp.complex64)
                tc0 = (l1fec.TchTxCarry.zeros(n_chan * 8),
                       XcchTxCarry.zeros(n_chan))
                prev0 = jnp.zeros((DECODE_PRELUDE, n_chan, 8, 148),
                                  jnp.float32)

                def body(carry, _):
                    st, tail, tc, prev, pv, fn = carry
                    ul = jnp.roll(ul_halo, fn % 3, axis=0)
                    da = dl_atten + (fn % 977).astype(jnp.float32) * 1e-6
                    st = st._replace(fn=fn % 2715648)
                    # static slot split matching tch_mask: the decode
                    # leg runs each Viterbi only on its configured TNs
                    (st2, tx, tail2, blocks, tc2, prev2,
                     pv2) = _dbd(cfg, spec, st, ul, tail, content, da,
                                 tc, fn, prev, pv, 0, 0,
                                 (0, 1, 6, 7), (2, 3, 4, 5))
                    probe = (jnp.sum(blocks.bits[..., 0].astype(
                        jnp.int32)) + jnp.sum(jnp.real(tx[:, 0]))
                        + jnp.sum(blocks.tch_speech[..., 0].astype(
                            jnp.int32)))
                    dets = jnp.sum(blocks.ok) + jnp.sum(blocks.tch_good)
                    return (st2, tail2, tc2, prev2, pv2,
                            fn + spec.frames), (probe, dets)
                carry, (probes, dets) = lax.scan(
                    body, (state, tail0, tc0, prev0,
                           jnp.asarray(False), jnp.asarray(0, jnp.int32)),
                    None, length=length)
                return jnp.sum(probes), jnp.sum(dets)
            return fused
    else:
        block_fn = {"exact": uplink_block,
                    "decoded": uplink_block_decoded}[mode]

        def make_fused(length):
            @jax.jit
            def fused(state, samples):
                def body(st, _):
                    # rotate the carrier axis by the (carried) frame
                    # counter: with loop-invariant samples XLA hoists
                    # the whole 961-tap resampler out of the scan and
                    # the bench times a chain that skips it (measured
                    # +12% at exact@512). The roll forces every block
                    # to ingest "new" data, as streaming does.
                    s = jnp.roll(samples, st.fn % 3, axis=0)
                    out = block_fn(cfg, spec, st, s)
                    st, res = out[0], out[1]
                    probe = jnp.sum(res.soft_bits[..., 0])
                    if mode == "decoded":  # include FEC output
                        probe = probe + jnp.sum(out[2].bits[..., 0])
                    return st, (probe, jnp.sum(res.detected))
                st, (probes, dets) = lax.scan(body, state, None,
                                              length=length)
                return jnp.sum(probes), jnp.sum(dets)
            return fused

    # Two scan lengths, k and 2k: sps is computed from t(2k) − t(k),
    # which cancels ALL fixed per-dispatch costs (relay RTT, result
    # fetch, host dispatch) exactly instead of subtracting a separately
    # measured — and jittery — fetch RTT.
    fused_1 = make_fused(iters)
    fused_2 = make_fused(2 * iters)

    def timed(fn):
        t0 = time.perf_counter()
        probe, dets = fn(state, dev)
        float(np.asarray(probe))
        return time.perf_counter() - t0, dets

    # warm runs (compile + execute once each)
    log("fused: compile+warm run (k)")
    probe, dets = fused_1(state, dev)
    float(np.asarray(probe))
    log("fused: compile+warm run (2k)")
    probe, _ = fused_2(state, dev)
    float(np.asarray(probe))
    log("fused warm done; timing")

    from openbts_ttsou_tpu.utils.profiling import maybe_trace

    reps = int(os.environ.get("BENCH_REPS", "3"))
    with maybe_trace():  # OPENBTS_TPU_TRACE=<dir> for an XPlane trace
        t1 = min(timed(fused_1)[0] for _ in range(reps))
        t2, dets = float("inf"), None
        for _ in range(reps):
            t, d = timed(fused_2)
            if t < t2:
                t2, dets = t, d
    dt = t2 - t1  # time for `iters` blocks, fixed overhead cancelled
    if not (dt > 0.02 and dt > 0.1 * t1):
        # overhead noise swamped the difference: the measurement is
        # unreliable — fail this attempt so the watchdog loop retries
        raise RuntimeError(
            f"timing too noisy: t1={t1:.4f}s t2={t2:.4f}s")
    fetch_rtt = max(2 * t1 - t2, 0.0)  # implied fixed overhead

    total_samples = iters * n_chan * spec.block_in
    sps = total_samples / dt
    try:
        detected = int(np.asarray(dets))
    except Exception:
        detected = -1  # relay D2H hiccup; timing is already measured

    metric = {"downlink": "downlink_chain_throughput",
              "duplex": "duplex_chain_throughput",
              "duplex_decoded": "duplex_decoded_chain_throughput"}.get(
                  mode, "uplink_chain_throughput")
    print(json.dumps({
        "metric": metric,
        "value": round(sps / 1e6, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sps / baseline_sps, 2),
        "detail": {
            "n_chan": n_chan,
            "iters": iters,
            "frame_latency_ms": round(dt / (iters * spec.frames) * 1e3,
                                      3),
            "mode": mode,
            # duplex runs are ALWAYS exact semantics since round 5
            # (the approximate block-refresh mode was deleted; see
            # EXACT_BAKEOFF.json for the implementation dispatch)
            **({"duplex_exact": True}
               if mode.startswith("duplex") else {}),
            "seconds": round(dt, 4),
            "fetch_rtt_s": round(fetch_rtt, 4),
            "detections_last_block": detected,
            "max_toa": max_toa,
            "rach_slots": rs_env,
            "cpu_baseline_Msps": round(baseline_sps / 1e6, 3),
            "cpu_baseline_harness": baseline_harness,
            "mirror_baseline_Msps": round(mirror_sps / 1e6, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    import signal
    import traceback

    def _alarm(signum, frame):
        raise TimeoutError("attempt watchdog fired (relay hang)")

    signal.signal(signal.SIGALRM, _alarm)
    last_err = None
    for attempt in range(3):
        try:
            signal.alarm(int(os.environ.get("BENCH_ATTEMPT_TIMEOUT",
                                            "420")))
            main()
            signal.alarm(0)
            break
        except Exception as e:  # relay hiccups/hangs: retry the run
            signal.alarm(0)
            last_err = e
            log(f"attempt {attempt} failed: {type(e).__name__}: {e}")
            time.sleep(10)
    else:
        print(json.dumps({
            "metric": "uplink_chain_throughput",
            "value": 0.0,
            "unit": "Msamples/s/chip",
            "vs_baseline": 0.0,
            "error": f"{type(last_err).__name__}: {str(last_err)[:200]}",
        }))
        traceback.print_exception(last_err, file=sys.stderr)
