#!/usr/bin/env python3
"""Attribute the signal-level frontend kernel's cycle budget (VERDICT r4
item 7).

r4_breakdown.jsonl: the dispatched fused frontend (frontend_pl_signal_f32)
runs at 35 TFLOP/s = 18% of the 197 TFLOP/s bf16 peak while marked
compute-bound, and the DFT matmul alone reaches only 23%. This harness
answers where the other cycles go with a stage bisect INSIDE the kernel:
each variant replaces one stage's work with a cheap placeholder
(pallas_frontend's ablate= profiling hook) and the stage's share is the
wall-time difference at the headline serving geometry.

Stages: roll (the whole-block sublane rotate that builds frame row f+1),
square (|X|^2 on the VPU), mel (the [*,512]x[512,56] mel matmul + log +
DCT), log alone, dct alone, acorr (the [*,512]x[512,16] autocorrelation
matmul + unrolled Levinson), levinson alone (fuse_lpc=False), cmvn alone
(cmvn=False). Also measured: the f32 vs bf16 MXU ceiling of the
dominant [1280,128]x[128,512] matmul shape in isolation, because the
meaningful roofline for a multi-pass f32 Mosaic dot is the f32 ceiling,
not the bf16 peak the roofline rows quote.

Usage (TPU, exclusive host):
  python experiments/frontend_ablation.py --out results/r5_breakdown.jsonl
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
    ap.add_argument("--trials", type=int, default=7)
    ap.add_argument("--utt-seconds", type=float, default=5.0)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.config import FeatureConfig, frame_geometry
    from speaker_recognition_tpu.features import extract
    from speaker_recognition_tpu.ops import frontend, pallas_frontend

    backend = jax.default_backend()
    interpret = backend != "tpu"
    fs = 8000
    fcfg = FeatureConfig()
    mf, lp = fcfg.mfcc, fcfg.lpc
    flen, fshift = frame_geometry(fs, mf.win_length_ms, mf.win_shift_ms)
    L = int(fs * args.utt_seconds)
    Lp = -(-L // extract.LENGTH_BUCKET) * extract.LENGTH_BUCKET
    B = args.batch
    rng = np.random.RandomState(0)
    signals = np.zeros((B, Lp), np.float32)
    signals[:, :L] = rng.randn(B, L) * 3000
    T = (Lp - flen) // fshift + 1
    n_valid = np.full((B,), (L - flen) // fshift + 1, np.int32)

    # operator construction mirrors extract._feature_fn's packed path
    if mf.f_max is not None:
        mel_np = frontend.mel_filterbank_bounded(
            fs, mf.fft_size, mf.n_filters, mf.f_min, mf.f_max,
            mf.mel_scale).T
    else:
        mel_np = frontend.mel_filterbank(fs, mf.fft_size, mf.n_filters).T
    dct_np = frontend.dct_matrix(mf.n_filters)[1: mf.n_ceps + 1].T
    floor = max(mf.power_floor, 1e-35)
    D, W, A = frontend.packed_frontend_operators(
        flen, mf.fft_size, mf.pre_emph, mel_np, lpc_order=lp.n_lpc,
        preemph_first=mf.preemph_first)
    dct_t = dct_np

    sj = jnp.asarray(signals)
    nj = jnp.asarray(n_valid)

    def run(ablate="", cmvn=True, fuse_lpc=True, mm_bf16=False,
            dft_concat=False):
        # jit the WHOLE call like production does (extract._feature_fn's
        # jitted fn): the numpy operator matrices fold into the program as
        # constants. Calling packed_from_signals eagerly re-uploads them
        # through the tunnel every call (~30 ms/call measured) and buries
        # the kernel time.
        jfn = jax.jit(lambda s, nv: pallas_frontend.packed_from_signals(
            s, fshift, D, W, dct_t, floor, A, interpret=interpret,
            mm_bf16=mm_bf16, n_valid=nv, cmvn=cmvn, fuse_lpc=fuse_lpc,
            ablate=ablate, dft_concat=dft_concat))
        return lambda: jfn(sj, nj)

    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    def measure(name, fn, extra=None):
        out = fn()
        float(np.asarray(out[0][0, 0, 0]))  # compile + drain
        t0 = time.perf_counter()
        float(np.asarray(fn()[0][0, 0, 0]))
        once = max(time.perf_counter() - t0, 1e-5)
        iters = max(3, min(100, int(0.5 / once)))
        trials = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            float(np.asarray(out[0][0, 0, 0]))
            trials.append((time.perf_counter() - t0) / iters)
        med = float(np.median(trials))
        iqr = float(np.percentile(trials, 75) - np.percentile(trials, 25))
        emit({"kind": "frontend_ablation", "variant": name,
              "seconds_per_batch": med, "iqr_seconds": iqr,
              "n_trials": args.trials, "iters": iters, "B": B,
              "backend": backend, **(extra or {})})
        return med

    full = measure("full", run())
    for name, kw in [
        ("no_roll", dict(ablate="roll")),
        ("no_square", dict(ablate="square")),
        ("no_log", dict(ablate="log")),
        ("no_dct", dict(ablate="dct")),
        ("no_mel_log_dct", dict(ablate="mel")),
        ("no_acorr_levinson", dict(ablate="acorr")),
        ("no_levinson", dict(fuse_lpc=False)),
        ("no_cmvn", dict(cmvn=False)),
        ("no_tails_at_all", dict(ablate="mel,acorr", cmvn=False)),
        ("mm_bf16", dict(mm_bf16=True)),
        ("dft_concat_k256", dict(dft_concat=True)),
        ("dft_concat_k256_bf16", dict(dft_concat=True, mm_bf16=True)),
    ]:
        med = measure(name, run(**kw))
        emit({"kind": "frontend_stage_share", "stage": name,
              "seconds_saved": round(full - med, 6),
              "share_of_full": round((full - med) / full, 4),
              "backend": backend})

    # MXU ceiling of the dominant matmul at the REAL workload size: one
    # [B*rows, 128] x [128, 512] dot (the same total FLOPs the kernel's
    # DFT stage performs per batch) — the realistic roofline for the
    # kernel's f32 dots is this measured f32 ceiling, not the bf16 peak
    # the r4 roofline rows quote.
    total_rows = B * (Lp // fshift)
    a32 = jnp.asarray(rng.randn(total_rows, fshift), jnp.float32)
    b32 = jnp.asarray(rng.randn(fshift, D.shape[1]), jnp.float32)

    for dt, name in ((jnp.float32, "mm_shape_f32"),
                     (jnp.bfloat16, "mm_shape_bf16")):
        a, b = a32.astype(dt), b32.astype(dt)
        mm = jax.jit(lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.float32))
        out = mm(a, b)
        float(np.asarray(out[0, 0]))
        iters = 20
        trials = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = mm(a, b)
            float(np.asarray(out[0, 0]))
            trials.append((time.perf_counter() - t0) / iters)
        med = float(np.median(trials))
        flops = 2 * total_rows * fshift * D.shape[1]
        emit({"kind": "mm_ceiling", "variant": name,
              "seconds": med, "rows": total_rows,
              "achieved_tflops": round(flops / med / 1e12, 1),
              "backend": backend})

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
