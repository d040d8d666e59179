#!/usr/bin/env python3
"""Generate a synthetic multi-speaker corpus for accuracy experiments.

Each "speaker" is a source-filter voice: a glottal-like pulse train at a
speaker-specific F0 (with jitter and drift) filtered by speaker-specific
formant resonators, plus breath noise and amplitude modulation. This is not
a substitute for the reference's real 102-speaker corpus (unavailable
here), but it exercises the same pipeline decisions and gives a stable
accuracy yardstick across rounds.

Usage: python experiments/make_synth_corpus.py /tmp/synthcorpus --speakers 20 --seconds 60
"""

import argparse
import os

import numpy as np
import scipy.io.wavfile as wavfile
import scipy.signal as sig

FS = 8000


def make_speaker(rng):
    return {
        "f0": 80 + rng.rand() * 160,                 # 80..240 Hz
        "formants": sorted(300 + rng.rand(4) * 2700),
        "bandwidths": 60 + rng.rand(4) * 120,
        "breath": 0.02 + rng.rand() * 0.08,
        "vibrato": 2 + rng.rand() * 4,
    }


def synth(spk, seconds, rng):
    n = int(FS * seconds)
    t = np.arange(n) / FS
    # pulse train with vibrato + jitter
    f0 = spk["f0"] * (1 + 0.03 * np.sin(2 * np.pi * spk["vibrato"] * t)
                      + 0.01 * rng.randn())
    phase = np.cumsum(f0) / FS
    pulses = (np.diff(np.floor(phase), prepend=0.0) > 0).astype(np.float64)
    excitation = pulses + spk["breath"] * rng.randn(n)
    # cascade of formant resonators
    out = excitation
    for f, bw in zip(spk["formants"], spk["bandwidths"]):
        r = np.exp(-np.pi * bw / FS)
        theta = 2 * np.pi * f / FS
        a = [1, -2 * r * np.cos(theta), r * r]
        out = sig.lfilter([1 - r], a, out)
    # syllable-ish amplitude modulation with pauses
    env = np.clip(np.sin(2 * np.pi * (2.5 + rng.rand()) * t
                         + rng.rand() * 6.28), 0, None) ** 0.5
    out = out * (0.25 + 0.75 * env)
    out = out / (np.abs(out).max() + 1e-9)
    return (out * 12000).astype(np.int16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--speakers", type=int, default=20)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for i in range(args.speakers):
        spk = make_speaker(rng)
        wav = synth(spk, args.seconds, rng)
        wavfile.write(os.path.join(args.outdir, f"spk_{i:03d}.wav"), FS, wav)
    print(f"wrote {args.speakers} speakers x {args.seconds}s to {args.outdir}")


if __name__ == "__main__":
    main()
