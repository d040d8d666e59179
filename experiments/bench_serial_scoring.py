#!/usr/bin/env python3
"""Serial-path scoring gate re-sweep (VERDICT r3 weak 5 / item 4).

The r1-era serial gate dispatched the fused scoring kernel on the SERIAL
(one-utterance) path at S*K >= _PALLAS_MIN_SK, a threshold set from
single-trial data; this sweep re-measured it under the r3 methodology on
the r4 JITTED serial path (and retired it — serial auto now always
serves XLA, pallas_gmm.serial_scoring_variant): per-call wall of the bucketed
_serial_scores program (the conversation-tick shape: one [Tp, d]
utterance) for each variant across bank sizes, median of >=5 blocks + IQR.

Usage: python experiments/bench_serial_scoring.py \
    --out results/local/r4_serial_scoring.jsonl
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.realpath(__file__))),
                 ".jax_cache"))

import numpy as np

N_TRIALS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--frames", type=int, default=256,
                    help="bucketed frame count (3 s clip -> 186 -> 256)")
    ap.add_argument("--dim", type=int, default=28)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.models import gmm
    from speaker_recognition_tpu.models.gmmset import _serial_scores

    rng = np.random.RandomState(0)
    Tp, d = args.frames, args.dim
    X = jnp.asarray(rng.randn(Tp, d).astype(np.float32))
    mask = jnp.asarray(np.arange(Tp) < Tp - 70)
    backend = jax.default_backend()
    variants = ["xla"] + (["pallas"] if backend == "tpu" else [])

    rows = []
    outpath = None
    if args.out:
        outpath = args.out if os.path.isabs(args.out) else os.path.join(
            os.path.dirname(os.path.realpath(__file__)), args.out)

    for S, K in [(4, 32), (20, 32), (64, 32), (16, 256), (80, 256)]:
        bank = gmm.GmmParams(
            weights=jnp.asarray(np.full((S, K), 1.0 / K, np.float32)),
            means=jnp.asarray(rng.randn(S, K, d).astype(np.float32)),
            sigmas=jnp.asarray((0.5 + rng.rand(S, K, d)).astype(np.float32)))
        for variant in variants:
            fn = lambda: _serial_scores(bank, X, mask, variant)
            np.asarray(fn())  # compile + warm
            t0 = time.perf_counter()
            np.asarray(fn())
            once = max(time.perf_counter() - t0, 1e-4)
            iters = max(3, min(300, int(0.8 / once)))
            ts = []
            for _ in range(N_TRIALS):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn()
                np.asarray(out)
                ts.append((time.perf_counter() - t0) / iters)
            med = float(np.median(ts))
            iqr = float(np.percentile(ts, 75) - np.percentile(ts, 25))
            row = {"kind": "serial_scoring", "S": S, "K": K, "SK": S * K,
                   "variant": variant, "frames": Tp, "dim": d,
                   "ms_per_call": round(med * 1e3, 3),
                   "iqr_ms": round(iqr * 1e3, 3),
                   "n_trials": N_TRIALS, "backend": backend}
            rows.append(row)
            print(json.dumps(row), flush=True)

    if outpath:
        ts_now = time.time()
        with open(outpath, "a") as f:
            for r in rows:
                f.write(json.dumps({"ts": ts_now, **r}) + "\n")
        print(f"# wrote {len(rows)} rows to {outpath}", file=sys.stderr)


if __name__ == "__main__":
    main()
