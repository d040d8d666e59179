#!/usr/bin/env python3
"""Attribute the r3 36x wall-clock anomaly on the production default path.

`r3_accuracy_hard.jsonl` precision-table rows recorded wall_s 757.5 for the
`default` knob (SRTPU_PALLAS auto + default precision) vs 19.7-24.5 s for
precision_high / highest / pallas_off on identical trials (VERDICT r3 weak 1).
This script re-runs the identical workload per knob with per-phase
attribution so the cause is measurable, not guessed:

  * closed_set_trial phase walls (enroll-features / train / batched predict)
  * serial predict_one per-call walls (first call = compile, then steady
    state) -- the conversation-mode path (reference gui.py:165-213 ticks
    every 0.4 s)
  * mix_feature B=1 per-call walls
  * jit cache-entry deltas per phase (counts distinct compiled programs)

Usage (one chip client at a time -- see r3_notes.md tunnel protocol):
  python experiments/diag_serial_anomaly.py --out results/local/r4_serial_diag.jsonl
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.realpath(__file__)))
CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.realpath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)

import numpy as np


def n_cache_entries():
    try:
        return len(os.listdir(CACHE_DIR))
    except OSError:
        return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/hardcorpus/*.wav")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-speakers", type=int, default=20)
    ap.add_argument("--tests-per-person", type=int, default=10)
    ap.add_argument("--test-seconds", type=float, default=3.0)
    ap.add_argument("--serial-calls", type=int, default=12)
    ap.add_argument("--knobs", default="default,pallas_off,precision_high")
    args = ap.parse_args()

    import jax
    from harness import load_corpus, closed_set_trial, Sample
    from speaker_recognition_tpu.config import PipelineConfig
    from speaker_recognition_tpu.features import extract

    samples = load_corpus(args.corpus)
    backend = jax.default_backend()
    rows = []

    def emit(row):
        row = {"backend": backend, **row}
        rows.append(row)
        print(json.dumps(row), flush=True)

    KNOBS = {
        "default": {},
        "precision_high": {"SRTPU_MATMUL_PRECISION": "high"},
        "precision_highest": {"SRTPU_MATMUL_PRECISION": "highest"},
        "pallas_off": {"SRTPU_PALLAS": "off"},
    }
    KEYS = ["SRTPU_MATMUL_PRECISION", "SRTPU_PALLAS"]

    # fixed serial-test clips, shared across knobs
    import random
    rng = random.Random(123)
    labels = sorted(samples.keys())[: args.n_speakers]
    fs0 = samples[labels[0]].fs
    serial_clips = []
    for i in range(args.serial_calls):
        s = samples[labels[i % len(labels)]]
        _, sig = s.get_fragment(args.test_seconds, rng)
        serial_clips.append(sig)

    for name in args.knobs.split(","):
        env = KNOBS[name]
        saved = {k: os.environ.get(k) for k in KEYS}
        for k in KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            # Phase-attributed trial (identical workload to the r3 table row)
            c0 = n_cache_entries()
            t0 = time.time()
            acc, t = closed_set_trial(
                samples, args.n_speakers, train_duration=20.0,
                test_duration=args.test_seconds,
                n_tests_per_person=args.tests_per_person,
                config=PipelineConfig(), seed=0)
            wall = time.time() - t0
            emit({"kind": "trial_phases", "knob": name, "accuracy": acc,
                  "wall_s": round(wall, 2),
                  "enroll_feature_s": round(t["enroll_feature_s"], 2),
                  "train_s": round(t["train_s"], 2),
                  "predict_s": round(t["predict_s"], 2),
                  "new_cache_entries": n_cache_entries() - c0})

            # Serial predict_one loop (conversation-mode path)
            from speaker_recognition_tpu.api.interface import ModelInterface
            model = ModelInterface(PipelineConfig())
            r2 = random.Random(7)
            for label in labels[: args.n_speakers]:
                s = samples[label]
                _, sig = s.get_fragment(20.0, r2)
                model.enroll(label, fs0, sig)
            model.train()
            c0 = n_cache_entries()
            walls = []
            for sig in serial_clips:
                t0 = time.time()
                model.predict(fs0, sig)
                walls.append(time.time() - t0)
            emit({"kind": "serial_predict", "knob": name,
                  "first_call_s": round(walls[0], 3),
                  "steady_median_ms": round(
                      1e3 * float(np.median(walls[1:])), 2),
                  "steady_max_ms": round(1e3 * float(np.max(walls[1:])), 2),
                  "new_cache_entries": n_cache_entries() - c0,
                  "walls_ms": [round(1e3 * w, 1) for w in walls]})

            # mix_feature B=1 per-call walls
            c0 = n_cache_entries()
            walls = []
            for sig in serial_clips:
                t0 = time.time()
                extract.mix_feature(fs0, sig)
                walls.append(time.time() - t0)
            emit({"kind": "serial_mix_feature", "knob": name,
                  "first_call_s": round(walls[0], 3),
                  "steady_median_ms": round(
                      1e3 * float(np.median(walls[1:])), 2),
                  "new_cache_entries": n_cache_entries() - c0,
                  "walls_ms": [round(1e3 * w, 1) for w in walls]})

            # Variable-length serial predicts: every distinct clip length is
            # a distinct frame count; pre-r4 the unjitted scoring path paid
            # ~25 s of eager-op compiles at each NEW length (the r3 anomaly
            # mechanism); post-fix each in-bucket length is a cache hit
            c0 = n_cache_entries()
            walls = []
            r3 = random.Random(99)
            for i in range(args.serial_calls):
                dur = 2.2 + 0.18 * i  # all distinct, within one 4096 bucket group
                s = samples[labels[i % len(labels)]]
                _, sig = s.get_fragment(dur, r3)
                t0 = time.time()
                model.predict(fs0, sig)
                walls.append(time.time() - t0)
            emit({"kind": "serial_predict_varlen", "knob": name,
                  "median_ms": round(1e3 * float(np.median(walls)), 2),
                  "max_ms": round(1e3 * float(np.max(walls)), 2),
                  "new_cache_entries": n_cache_entries() - c0,
                  "walls_ms": [round(1e3 * w, 1) for w in walls]})
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    if args.out:
        path = args.out if os.path.isabs(args.out) else os.path.join(
            os.path.dirname(os.path.realpath(__file__)), args.out)
        ts = time.time()
        with open(path, "a") as f:
            for row in rows:
                f.write(json.dumps({"ts": ts, **row}) + "\n")
        print(f"# wrote {len(rows)} rows to {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
