#!/usr/bin/env python3
"""Tune pallas_frontend.UTT_TILE (utterances per grid step of the
signal-level fused kernel) with variance-aware measurement.

The kernel processes UTT_TILE utterances per grid step; more utterances =
more matmul rows per step (better MXU pipelining) but a larger X/Y VMEM
footprint. r2 shipped UTT_TILE=2 from single-trial data; this sweeps the
knob with >=5-trial medians at the serving workload.

Usage: python experiments/bench_utt_tile.py [--out results/r3_utt_tile.jsonl]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--tiles", default="1,2,4,8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.config import FeatureConfig, frame_geometry, n_frames
    from speaker_recognition_tpu.ops import frontend, pallas_frontend

    fs, B, seconds = 8000, 512, 5.0
    L = int(fs * seconds)
    padded = -(-L // 4096) * 4096
    fcfg = FeatureConfig()
    mf, lp = fcfg.mfcc, fcfg.lpc
    flen, fshift = frame_geometry(fs, mf.win_length_ms, mf.win_shift_ms)
    T = n_frames(padded, flen, fshift)
    rng = np.random.RandomState(0)
    signals = (rng.randn(B, padded) * 3000).astype(np.float32)
    signals[:, L:] = 0
    sig = jnp.asarray(signals)
    nv = jnp.asarray(np.full((B,), n_frames(L, flen, fshift), np.int32))

    mel_np = frontend.mel_filterbank(fs, mf.fft_size, mf.n_filters).T
    dct_np = frontend.dct_matrix(mf.n_filters)[1:mf.n_ceps + 1].T
    D, W, A = frontend.packed_frontend_operators(
        flen, mf.fft_size, mf.pre_emph, mel_np, lpc_order=lp.n_lpc,
        preemph_first=mf.preemph_first)
    floor = max(mf.power_floor, 1e-35)
    interpret = jax.default_backend() != "tpu"
    audio = B * seconds

    rows = []
    for tile in [int(t) for t in args.tiles.split(",")]:
        pallas_frontend.UTT_TILE = tile
        pallas_frontend._run_packed_signals.clear_cache()

        # ONE jitted program per tile setting: the eager wrapper dispatches
        # several small ops per call, which the ~1 ms/program tunnel floor
        # (r3_notes.md) would swamp
        @jax.jit
        def run(s, n):
            out, r = pallas_frontend.packed_from_signals(
                s, fshift, D, W, dct_np, floor, A, interpret=interpret,
                n_valid=n, cmvn=True, fuse_lpc=True)
            return jnp.sum(out) + jnp.sum(r)

        try:
            float(np.asarray(run(sig, nv)))  # compile + warmup
            t0 = time.perf_counter()
            float(np.asarray(run(sig, nv)))
            once = max(time.perf_counter() - t0, 1e-4)
            iters = max(3, min(300, int(1.0 / once)))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = run(sig, nv)
                float(np.asarray(out))
                ts.append((time.perf_counter() - t0) / iters)
            med = float(np.median(ts))
            iqr = float(np.percentile(ts, 75) - np.percentile(ts, 25))
        except Exception as e:  # noqa: BLE001
            print(f"# UTT_TILE={tile} failed: {repr(e)[:160]}",
                  file=sys.stderr, flush=True)
            continue
        row = {"utt_tile": tile, "seconds_per_batch": med,
               "iqr_seconds": iqr, "audio_s_per_s": round(audio / med, 1),
               "n_trials": 5, "B": B, "backend": jax.default_backend()}
        rows.append(row)
        print(f"UTT_TILE={tile}  {med*1e3:8.3f} ms (iqr {iqr*1e3:.3f})  "
              f"{audio/med:12.0f} audio-s/s", flush=True)

    if args.out:
        path = args.out if os.path.isabs(args.out) else os.path.join(
            os.path.dirname(os.path.realpath(__file__)), args.out)
        ts_ = time.time()
        with open(path, "a") as f:
            for row in rows:
                f.write(json.dumps({"ts": ts_, **row}) + "\n")


if __name__ == "__main__":
    main()
