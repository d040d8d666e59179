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


# -- hard mode (VERDICT r3 item 5): a corpus whose closed-set accuracy
# lands in the reference's 0.92-0.99 regime instead of saturating at 1.0.
# Speakers are drawn as SMALL perturbations around a few shared prototype
# voices (overlapping formant families), every utterance gets per-session
# drift of the vocal-tract parameters (within-speaker variance comparable
# to between-speaker distances), and babble-ish additive noise at a fixed
# SNR. The difficulty knobs are (n_prototypes, speaker_spread,
# session_spread, snr_db). Defaults are tuned (r3) so the closed-set
# curve lands at ~0.93-0.97 for 20-40 speakers — the reference's golden
# regime — instead of saturating.

def make_prototypes(rng, n_prototypes=6):
    protos = []
    for _ in range(n_prototypes):
        protos.append({
            "f0": 90 + rng.rand() * 130,
            "formants": np.sort(np.array(
                [300 + rng.rand() * 500, 900 + rng.rand() * 700,
                 1800 + rng.rand() * 800, 2700 + rng.rand() * 900])),
            "bandwidths": 70 + rng.rand(4) * 100,
        })
    return protos


def make_hard_speaker(rng, protos, speaker_spread=0.06):
    p = protos[rng.randint(len(protos))]
    return {
        "f0": p["f0"] * (1 + speaker_spread * rng.randn()),
        "formants": p["formants"] * (1 + speaker_spread * rng.randn(4)),
        "bandwidths": p["bandwidths"] * (1 + 0.2 * rng.randn(4)),
        "breath": 0.04 + rng.rand() * 0.06,
        "vibrato": 2 + rng.rand() * 4,
    }


def synth(spk, seconds, rng, session_spread=0.0, snr_db=None):
    n = int(FS * seconds)
    t = np.arange(n) / FS
    # per-session (per-utterance) drift of the voice parameters
    f0_base = spk["f0"] * (1 + session_spread * rng.randn())
    formants = np.asarray(spk["formants"]) * (
        1 + session_spread * rng.randn(len(spk["formants"])))
    # pulse train with vibrato + jitter
    f0 = f0_base * (1 + 0.03 * np.sin(2 * np.pi * spk["vibrato"] * t)
                    + 0.01 * rng.randn())
    phase = np.cumsum(f0) / FS
    pulses = (np.diff(np.floor(phase), prepend=0.0) > 0).astype(np.float64)
    excitation = pulses + spk["breath"] * rng.randn(n)
    # cascade of formant resonators
    out = excitation
    for f, bw in zip(formants, spk["bandwidths"]):
        f = float(np.clip(f, 120.0, FS / 2 - 200.0))
        r = np.exp(-np.pi * bw / FS)
        theta = 2 * np.pi * f / FS
        a = [1, -2 * r * np.cos(theta), r * r]
        out = sig.lfilter([1 - r], a, out)
    # syllable-ish amplitude modulation with pauses
    env = np.clip(np.sin(2 * np.pi * (2.5 + rng.rand()) * t
                         + rng.rand() * 6.28), 0, None) ** 0.5
    out = out * (0.25 + 0.75 * env)
    out = out / (np.abs(out).max() + 1e-9)
    if snr_db is not None:
        # "babble": sum of a few detuned voices' envelopes of filtered noise
        noise = rng.randn(n)
        noise = sig.lfilter([1.0], [1.0, -0.9], noise)  # pink-ish tilt
        noise = noise / (np.std(noise) + 1e-9)
        p_sig = np.mean(out ** 2)
        out = out + noise * np.sqrt(p_sig / (10 ** (snr_db / 10.0)))
        out = out / (np.abs(out).max() + 1e-9)
    return (out * 12000).astype(np.int16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--speakers", type=int, default=20)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hard", action="store_true",
                    help="overlapping-prototype speakers + session drift "
                         "+ additive noise (non-saturated accuracy)")
    ap.add_argument("--prototypes", type=int, default=8)
    ap.add_argument("--speaker-spread", type=float, default=0.10)
    ap.add_argument("--session-spread", type=float, default=0.03)
    ap.add_argument("--snr-db", type=float, default=15.0)
    ap.add_argument("--segments", type=int, default=8,
                    help="hard mode: utterances per speaker (each with its "
                         "own session drift), concatenated")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    if args.hard:
        protos = make_prototypes(rng, args.prototypes)
        for i in range(args.speakers):
            spk = make_hard_speaker(rng, protos, args.speaker_spread)
            seg_s = args.seconds / args.segments
            wav = np.concatenate([
                synth(spk, seg_s, rng, session_spread=args.session_spread,
                      snr_db=args.snr_db)
                for _ in range(args.segments)])
            wavfile.write(os.path.join(args.outdir, f"spk_{i:03d}.wav"),
                          FS, wav)
        print(f"wrote {args.speakers} HARD speakers "
              f"({args.prototypes} prototypes, spread "
              f"{args.speaker_spread}/{args.session_spread}, "
              f"{args.snr_db} dB SNR) x {args.seconds}s to {args.outdir}")
        return
    for i in range(args.speakers):
        spk = make_speaker(rng)
        wav = synth(spk, args.seconds, rng)
        wavfile.write(os.path.join(args.outdir, f"spk_{i:03d}.wav"), FS, wav)
    print(f"wrote {args.speakers} speakers x {args.seconds}s to {args.outdir}")


if __name__ == "__main__":
    main()
