#!/usr/bin/env python3
"""End-to-end predict throughput benchmark (audio-seconds/s/chip).

Workload: the reference's headline predict configuration — 5 s utterances at
fs=8000, MFCC(13)+LPC(15) features, 32-component diagonal GMM scoring
against a 4-speaker bank (log/final/final-log/nperson-mix-1523-t5.log) — run
as one fused jitted program over a padded utterance batch.

Baseline: the reference achieves ~22 audio-s/s/core for features and
~580 audio-s/s/core for scoring on its 2013 8-core CPU (BASELINE.md), i.e.
~21.2 audio-s/s/core end-to-end. vs_baseline reports the multiple of that
per-core number achieved by one chip (target >= 100x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.realpath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.realpath(__file__)),
                                   ".jax_cache"))

import numpy as np

REFERENCE_ENDTOEND_PER_CORE = 1.0 / (1.0 / 22.0 + 1.0 / 580.0)  # ~21.2


def main():
    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.config import FeatureConfig
    from speaker_recognition_tpu.features.extract import _feature_fn
    from speaker_recognition_tpu.models import gmm

    fs = 8000
    utt_seconds = 5.0
    B = 512                     # utterances per batch (serving-scale)
    S, K = 4, 32                # speakers, mixtures
    L = int(fs * utt_seconds)
    padded = -(-L // 4096) * 4096
    fcfg = FeatureConfig()
    d = fcfg.dim

    rng = np.random.RandomState(0)
    signals = (rng.randn(B, padded) * 3000).astype(np.float32)
    signals[:, L:] = 0
    lengths = np.full((B,), L, np.int32)
    bank = gmm.GmmParams(
        weights=jnp.asarray(np.full((S, K), 1.0 / K, np.float32)),
        means=jnp.asarray(rng.randn(S, K, d).astype(np.float32)),
        sigmas=jnp.asarray((0.5 + rng.rand(S, K, d)).astype(np.float32)),
    )

    def build_predict(front, mm, scoring):
        # the exact serving program (api/fastpath); argmax of the [B, S]
        # score tile is a trivial host epilogue, not worth a separate
        # compile on the remote-compile backend
        from speaker_recognition_tpu.api import fastpath
        return fastpath.predict_scores_fn(
            fs, fcfg, padded, front, mm, scoring,
            interpret=jax.default_backend() != "tpu")

    args = (jnp.asarray(signals), jnp.asarray(lengths),
            bank.weights, bank.means, bank.sigmas)

    def sync(out):
        # Fetch a value: forces the device queue to drain. On the axon
        # remote backend, block_until_ready returns early, so timings must
        # end with an actual value fetch.
        return float(np.asarray(out[0, 0]))

    from speaker_recognition_tpu.utils import profiling

    def measure(predict, name="variant", n_trials=5):
        """Variance-aware: n_trials timed trials after warmup; returns
        (median, iqr) audio-s/s. Single-trial numbers on this tunnel swing
        up to 18x (VERDICT r2 weak 1) — never record one."""
        with profiling.phase_timer(f"compile:{name}"):
            sync(predict(*args))  # warmup/compile
        t0 = time.perf_counter()
        sync(predict(*args))
        once = time.perf_counter() - t0
        iters = max(3, min(200, int(1.0 / max(once, 1e-4))))
        trials = []
        for _ in range(n_trials):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = predict(*args)
            sync(out)
            elapsed = time.perf_counter() - t0
            trials.append(B * utt_seconds * iters / elapsed)
        med = float(np.median(trials))
        iqr = float(np.percentile(trials, 75) - np.percentile(trials, 25))
        profiling.record_metric(f"measure:{name}", iters=iters, B=B,
                                median_audio_s_per_s=med, iqr=iqr,
                                trials=[round(t, 1) for t in trials])
        return med, iqr

    # The XLA program is the guaranteed-good floor; the fused variants
    # (api/fastpath) are attempted on top and the best median wins (falls
    # back cleanly if a kernel fails to compile on this backend).
    # "dispatch" is what production serving actually picks for this
    # geometry (fastpath._MEASURED_DISPATCH, from the r3 per-geometry
    # sweep). Full sweep: experiments/bench_geometry.py.
    from speaker_recognition_tpu.api import fastpath as _fp
    dispatch_variant = _fp.default_variant(
        fs, fcfg, padded, jax.default_backend() != "tpu",
        n_speakers=S, n_mixtures=K)
    results = {}
    for name, (front, mm, scoring) in {
        "xla_f32": ("xla", "f32", "xla"),
        "xla_f32_wide": ("xla", "f32", "xla_wide"),
        "fused_f32": ("pallas", "f32", "pallas"),
        "dispatch_" + "_".join(dispatch_variant): dispatch_variant,
    }.items():
        try:
            predict = build_predict(front, mm, scoring)
            results[name] = measure(predict, name)
        except Exception as e:  # noqa: BLE001
            print(f"# variant {name} unavailable: {type(e).__name__}",
                  file=sys.stderr)
    print("# " + " ".join(f"{k}={v[0]:.0f}(iqr {v[1]:.0f})"
                          for k, v in results.items())
          + " audio-s/s", file=sys.stderr)
    # Headline = what production serving actually dispatches at this
    # geometry (VERDICT r4 item 6) — NOT the best variant of the sweep.
    # The best-of row is still printed above for the record; if the
    # dispatch build failed on this backend, fall back to the best
    # available variant (serving would fall back too).
    dispatch_key = "dispatch_" + "_".join(dispatch_variant)
    best = max(v[0] for v in results.values())
    value = results.get(dispatch_key, (best, 0.0))[0]
    print(f"# headline=dispatched({dispatch_key})={value:.0f}"
          f" best_variant={best:.0f} audio-s/s", file=sys.stderr)
    # Phase metrics go to an UNCOMMITTED run-local file (ADVICE r2: bench
    # runs must not mutate checked-in artifacts); curated results are
    # committed explicitly from experiments/ scripts.
    profiling.dump_metrics(os.path.join(
        os.path.dirname(os.path.realpath(__file__)),
        "experiments", "results", "local", "bench_phases.jsonl"))
    print(json.dumps({
        "metric": "predict_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / REFERENCE_ENDTOEND_PER_CORE, 2),
    }))


if __name__ == "__main__":
    main()
