#!/usr/bin/env python3
"""Per-geometry variant sweep — the data behind fastpath._MEASURED_DISPATCH.

For every geometry class the system serves (headline 4x32 bank, UBM-scale
80x256 bank, MFCC-only, delta-enabled, non-bucket padded length, small
batch), measures every expressible (frontend, mm, scoring) variant of the
predict program with >=5 timed trials and records median + IQR (VERDICT r2
items 2/3: single-trial numbers swing up to 18x on this tunnel; the
dispatch table must be measured per geometry, and auto must never pick a
path slower than the XLA floor).

Usage: python experiments/bench_geometry.py --out results/r3_geometry_sweep.jsonl
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


def measure(f, fargs, sync, min_s=1.0, n_trials=N_TRIALS):
    sync(f(*fargs))  # compile + warmup
    t0 = time.perf_counter()
    sync(f(*fargs))
    once = max(time.perf_counter() - t0, 1e-4)
    iters = max(3, min(300, int(min_s / once)))
    ts = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(*fargs)
        sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    med = float(np.median(ts))
    iqr = float(np.percentile(ts, 75) - np.percentile(ts, 25))
    return med, iqr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated geometry names to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.api import fastpath
    from speaker_recognition_tpu.config import (FeatureConfig, LpcConfig,
                                                MfccConfig)
    from speaker_recognition_tpu.models import gmm

    fs = 8000
    interpret = jax.default_backend() != "tpu"
    base = FeatureConfig()

    deltas_cfg = FeatureConfig(mfcc=base.mfcc, lpc=base.lpc,
                               use_lpc=True, n_deltas=2)
    # geometry name -> (B, seconds, S, K, cfg, bucketed)
    GEOMETRIES = {
        "headline": (512, 5.0, 4, 32, base, True),
        "ubm_bank": (128, 5.0, 80, 256, base, True),
        "mfcc_only": (512, 5.0, 4, 32,
                      FeatureConfig(mfcc=base.mfcc, use_lpc=False), True),
        "deltas": (512, 5.0, 4, 32, deltas_cfg, True),
        "nonbucket_len": (512, 5.0, 4, 32, base, False),
        "small_batch": (8, 5.0, 4, 32, base, True),
        # r4 additions (VERDICT r3 item 4): the three dispatch rows that
        # were inferred rather than swept...
        "large_bank_deltas": (128, 5.0, 80, 256, deltas_cfg, True),
        "nonbucket_large_bank": (128, 5.0, 80, 256, base, False),
        "nonbucket_large_bank_deltas": (128, 5.0, 80, 256, deltas_cfg,
                                        False),
        # ...the B in (8, 512) region bounding _SMALL_BATCH_MAX...
        "batch_16": (16, 5.0, 4, 32, base, True),
        "batch_32": (32, 5.0, 4, 32, base, True),
        "batch_64": (64, 5.0, 4, 32, base, True),
        "batch_128": (128, 5.0, 4, 32, base, True),
        # ...and the wide-kernel frames-per-call crossover (r3_notes: the
        # transposed-layout kernel loses to vmapped XLA beyond ~1M frames;
        # B=2048/4096 at 5 s are ~0.64M/1.28M frames)
        "batch_2048": (2048, 5.0, 4, 32, base, True),
        "batch_4096": (4096, 5.0, 4, 32, base, True),
    }
    only = set(args.only.split(",")) if args.only else None

    rows = []
    outpath = None
    if args.out:
        outpath = args.out if os.path.isabs(args.out) else os.path.join(
            os.path.dirname(os.path.realpath(__file__)), args.out)

    def persist(row):
        rows.append(row)
        if outpath:
            with open(outpath, "a") as f:
                f.write(json.dumps({"ts": time.time(), **row}) + "\n")

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf).ravel()[0]

    for geom_name, (B, seconds, S, K, fcfg, bucketed) in GEOMETRIES.items():
        if only and geom_name not in only:
            continue
        L = int(fs * seconds)
        if bucketed:
            padded = -(-L // 4096) * 4096
        else:
            # a padded length that breaks the fused-kernel geometry
            # (rows % 8 != 0) but is still lane-aligned
            padded = L + 128 * 3
        d = fcfg.dim
        rng = np.random.RandomState(0)
        signals = (rng.randn(B, padded) * 3000).astype(np.float32)
        signals[:, L:] = 0
        sig = jnp.asarray(signals)
        lens = jnp.asarray(np.full((B,), L, np.int32))
        bank = gmm.GmmParams(
            weights=jnp.asarray(np.full((S, K), 1.0 / K, np.float32)),
            means=jnp.asarray(rng.randn(S, K, d).astype(np.float32)),
            sigmas=jnp.asarray((0.5 + rng.rand(S, K, d)).astype(np.float32)))
        audio = B * seconds
        bank_args = (sig, lens, bank.weights, bank.means, bank.sigmas)
        fused_ok = fastpath.fused_geometry_ok(fs, fcfg, padded)

        fronts = ["xla"] + (["pallas"] if fused_ok else [])
        print(f"== {geom_name}: B={B} S={S} K={K} padded={padded} "
              f"fused_geom={'ok' if fused_ok else 'NO'} ==", flush=True)
        for front in fronts:
            mms = ["f32"]
            if front == "pallas" and geom_name == "headline":
                mms.append("bf16")
            for mm in mms:
                for scoring in ["xla", "xla_wide", "pallas", "pallas_wide"]:
                    name = f"{front}_{mm}_{scoring}"
                    try:
                        fn = fastpath.predict_scores_fn(
                            fs, fcfg, padded, front, mm, scoring, interpret)
                        med, iqr = measure(fn, bank_args, sync)
                    except Exception as e:  # noqa: BLE001
                        print(f"# {name} failed: {repr(e)[:160]}",
                              file=sys.stderr, flush=True)
                        continue
                    persist({
                        "geometry": geom_name, "variant": name,
                        "seconds_per_batch": med, "iqr_seconds": iqr,
                        "audio_s_per_s": round(audio / med, 1),
                        "n_trials": N_TRIALS,
                        "B": B, "S": S, "K": K, "padded": padded,
                        "fused_geometry_ok": fused_ok,
                        "backend": jax.default_backend()})
                    print(f"  {name:24s} {med*1e3:8.3f} ms "
                          f"(iqr {iqr*1e3:6.3f})  "
                          f"{audio/med:12.0f} audio-s/s", flush=True)

        # what would auto dispatch, and is it >= the floor?
        chosen = fastpath.default_variant(fs, fcfg, padded, interpret,
                                          n_speakers=S, n_mixtures=K,
                                          batch_size=B)
        by_var = {r["variant"]: r for r in rows
                  if r["geometry"] == geom_name}
        floor_name = "_".join(fastpath._FLOOR_VARIANT)
        chosen_name = "_".join(chosen)
        if floor_name in by_var and chosen_name in by_var:
            fl, ch = by_var[floor_name], by_var[chosen_name]
            verdict = "OK" if ch["seconds_per_batch"] <= \
                fl["seconds_per_batch"] + fl["iqr_seconds"] else "SLOWER"
            print(f"  dispatch -> {chosen_name}  vs floor {floor_name}: "
                  f"{verdict}", flush=True)
            persist({"geometry": geom_name, "dispatch": chosen_name,
                     "floor": floor_name, "verdict": verdict})

    if outpath:
        print(f"# wrote {len(rows)} rows to {outpath}", file=sys.stderr)


if __name__ == "__main__":
    main()
