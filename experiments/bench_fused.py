#!/usr/bin/env python3
"""Variant sweep of the serving predict program at the headline workload.

Measures every (frontend, mm, scoring) combination of api/fastpath plus the
single-kernel mega-fused variant (ops/pallas_predict) and the round-1
baselines, at the bench.py geometry (512 x 5 s utterances, 4x32 bank).
The winner sets fastpath.default_variant; rows are recorded to
experiments/results/.

Usage: python experiments/bench_fused.py [--out results/rN_fused_tpu.jsonl]
"""

import argparse
import itertools
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--S", type=int, default=4)
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--skip-mega", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.api import fastpath
    from speaker_recognition_tpu.config import FeatureConfig, frame_geometry, n_frames
    from speaker_recognition_tpu.models import gmm
    from speaker_recognition_tpu.ops import frontend, pallas_predict

    fs, B, S, K = 8000, args.B, args.S, args.K
    L = int(fs * args.seconds)
    padded = -(-L // 4096) * 4096
    fcfg = FeatureConfig()
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
    audio = B * args.seconds
    interpret = jax.default_backend() != "tpu"

    def measure(f, fargs):
        out = f(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        np.asarray(out.ravel()[0] if hasattr(out, "ravel") else out[0][0])
        f(*fargs)
        once = max(time.perf_counter() - t0, 1e-4)
        iters = max(3, min(300, int(2.0 / once)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*fargs)
            np.asarray(out.ravel()[0])
            ts.append((time.perf_counter() - t0) / iters)
        return float(np.median(ts))

    rows = []

    def add(name, seconds):
        rows.append({"variant": name, "seconds_per_batch": seconds,
                     "audio_s_per_s": round(audio / seconds, 1),
                     "B": B, "S": S, "K": K,
                     "backend": jax.default_backend()})
        print(f"{name:28s} {seconds*1e3:8.3f} ms  "
              f"{audio/seconds:12.0f} audio-s/s", flush=True)

    combos = itertools.product(["xla", "pallas"], ["f32", "bf16"],
                               ["xla", "pallas", "pallas_wide"])
    bank_args = (sig, lens, bank.weights, bank.means, bank.sigmas)
    for front, mm, scoring in combos:
        name = f"{front}_{mm}_{scoring}"
        try:
            fn = fastpath.predict_scores_fn(fs, fcfg, padded, front, mm,
                                            scoring, interpret)
            add(name, measure(fn, bank_args))
        except Exception as e:  # noqa: BLE001
            print(f"# {name} failed: {repr(e)[:200]}", file=sys.stderr,
                  flush=True)

    if not args.skip_mega:
        mf, lp = fcfg.mfcc, fcfg.lpc
        flen, fshift = frame_geometry(fs, mf.win_length_ms, mf.win_shift_ms)
        mel_np = frontend.mel_filterbank(fs, mf.fft_size, mf.n_filters).T
        dct_np = frontend.dct_matrix(mf.n_filters)[1:mf.n_ceps + 1].T
        D, W, A = frontend.packed_frontend_operators(
            flen, mf.fft_size, mf.pre_emph, mel_np, lpc_order=lp.n_lpc,
            preemph_first=mf.preemph_first)
        floor = max(mf.power_floor, 1e-35)
        nv = jnp.asarray(np.full((B,), n_frames(L, flen, fshift), np.int32))
        for bf16 in (False, True):
            name = f"mega_fused_{'bf16' if bf16 else 'f32'}"
            try:
                f = lambda s, n, b=bf16: pallas_predict.fused_bank_predict(
                    s, n, bank, fshift, D, W, dct_np, floor, A,
                    interpret=interpret, mm_bf16=b, utt_tile=1)
                add(name, measure(f, (sig, nv)))
            except Exception as e:  # noqa: BLE001
                print(f"# {name} failed: {repr(e)[:200]}", file=sys.stderr,
                      flush=True)

    if args.out:
        path = args.out if os.path.isabs(args.out) else os.path.join(
            os.path.dirname(os.path.realpath(__file__)), args.out)
        ts = time.time()
        with open(path, "a") as f:
            for row in rows:
                f.write(json.dumps({"ts": ts, **row}) + "\n")


if __name__ == "__main__":
    main()
