#!/usr/bin/env python
"""RF sweep synthesizer (the sweepGenerator.cpp equivalent): writes a
stepped-frequency complex tone sweep into an .npz IQ file or a radio."""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_sweep(sample_rate: float, start_hz: float, stop_hz: float,
               steps: int, samples_per_step: int,
               amplitude: float = 10000.0) -> np.ndarray:
    out = []
    for f in np.linspace(start_hz, stop_hz, steps):
        t = np.arange(samples_per_step)
        out.append(amplitude *
                   np.exp(2j * np.pi * f / sample_rate * t))
    return np.concatenate(out).astype(np.complex64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--rate", type=float, default=1625e3 / 6.0)
    ap.add_argument("--start", type=float, default=-100e3)
    ap.add_argument("--stop", type=float, default=100e3)
    ap.add_argument("--steps", type=int, default=41)
    ap.add_argument("--samples-per-step", type=int, default=1250)
    args = ap.parse_args()
    iq = make_sweep(args.rate, args.start, args.stop, args.steps,
                    args.samples_per_step)
    np.savez(args.path, iq=iq[None], rate=args.rate)
    print(f"wrote {args.path}: {len(iq)} samples, "
          f"{args.start/1e3:.0f}..{args.stop/1e3:.0f} kHz")


if __name__ == "__main__":
    main()
