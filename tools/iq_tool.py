#!/usr/bin/env python
"""IQ capture record/replay tool.

- `record`: synthesize a GSM uplink capture (planted normal/RACH bursts
  at known frames) to an .npz file — the golden-vector source for
  regression runs (BASELINE "recorded IQ captures").
- `replay`: run a capture through the uplink pipeline and report
  detections/BER against the recorded truth.

The reference's equivalents are the SWLOOPBACK buffer plus
sweepGenerator/testRadio diagnostics.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def record(path: str, frames: int = 26, n_chan: int = 1, seed: int = 0,
           snr_db: float = 20.0):
    from openbts_ttsou_tpu.ops import gmsk
    from openbts_ttsou_tpu.utils import constants as C

    rng = np.random.default_rng(seed)
    sym = np.zeros((n_chan, frames * 1250), np.complex64)
    truth = []
    for c in range(n_chan):
        for f in range(frames):
            if f % 3 == 2:
                continue  # leave idle frames
            bits = np.concatenate(
                [[0, 0, 0], rng.integers(0, 2, 57), [1],
                 C.TRAINING_SEQUENCE[0], [1], rng.integers(0, 2, 57),
                 [0, 0, 0]]).astype(np.uint8)
            wave = gmsk.modulate_burst_np(bits[None], 1)[0]
            off = f * 1250 + 157  # slot 1
            sym[c, off : off + 148] += wave * 9000.0
            truth.append((c, f, 1, bits))
        sig = 9000.0**2
        noise = sig / 10 ** (snr_db / 10)
        sym[c] += (rng.normal(0, np.sqrt(noise / 2), sym.shape[1])
                   + 1j * rng.normal(0, np.sqrt(noise / 2), sym.shape[1])
                   ).astype(np.complex64)
    np.savez(path, iq=sym,
             truth_chan=[t[0] for t in truth],
             truth_fn=[t[1] for t in truth],
             truth_tn=[t[2] for t in truth],
             truth_bits=np.stack([t[3] for t in truth]))
    print(f"wrote {path}: {n_chan} chan x {frames} frames, "
          f"{len(truth)} bursts at {snr_db:.0f} dB")


def replay(path: str):
    import jax.numpy as jnp

    from openbts_ttsou_tpu.parallel.sharded import _slot_windows
    from openbts_ttsou_tpu.trx import ChanType, TrxConfig, init_state, rx_step

    data = np.load(path)
    iq = data["iq"]
    n_chan, total = iq.shape
    frames = total // 1250
    cfg = TrxConfig(n_chan=n_chan)
    ct = np.zeros((n_chan, 8), np.int32)
    ct[:, 1] = ChanType.I
    state = init_state(cfg)._replace(chan_type=jnp.asarray(ct))
    wins = _slot_windows(jnp.asarray(iq), frames)
    hits = 0
    errors = 0
    total_bits = 0
    det_map = {}
    for f in range(frames):
        state, res = rx_step(cfg, state, wins[f])
        det = np.asarray(res.detected)
        soft = np.asarray(res.soft_bits)
        for c in range(n_chan):
            if det[c, 1]:
                det_map[(c, f)] = soft[c, 1]
    for c, f, tn, bits in zip(data["truth_chan"], data["truth_fn"],
                              data["truth_tn"], data["truth_bits"]):
        soft = det_map.get((int(c), int(f)))
        if soft is None:
            continue
        hits += 1
        errors += int(((soft > 0.5).astype(np.uint8) != bits).sum())
        total_bits += len(bits)
    n_truth = len(data["truth_fn"])
    print(f"detected {hits}/{n_truth} bursts; "
          f"BER {errors}/{total_bits} = "
          f"{errors / max(total_bits, 1):.5f}")
    return hits, n_truth, errors, total_bits


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("record")
    r.add_argument("path")
    r.add_argument("--frames", type=int, default=26)
    r.add_argument("--chans", type=int, default=1)
    r.add_argument("--snr", type=float, default=20.0)
    p = sub.add_parser("replay")
    p.add_argument("path")
    args = ap.parse_args()
    if args.cmd == "record":
        record(args.path, args.frames, args.chans, snr_db=args.snr)
    else:
        replay(args.path)


if __name__ == "__main__":
    main()
