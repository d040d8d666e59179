#!/usr/bin/env python3
"""Phase breakdown of the headline predict pipeline on the current backend.

Times each stage of predict (frontend DFT/mel/DCT, CMVN, Levinson LPC, bank
scoring, full program) separately at the serving workload from bench.py
(512 x 5 s utterances, 4-speaker 32-mix bank) and reports roofline fractions
for the named hot kernels (SURVEY.md section 7.9: STFT/DFT, mel projection,
GMM log-posterior). Emits jsonl rows to experiments/results/.

Usage: python experiments/bench_breakdown.py [--out results/rN_breakdown.jsonl]
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


def measure(fn, args, sync, min_s=1.0, n_trials=5):
    """Median + IQR wall time per call over n_trials timed trials (VERDICT
    r2 weak 1: single-trial numbers on the tunnel swing up to 18x; never
    record one). Queue drained via value fetch."""
    sync(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    sync(fn(*args))
    once = time.perf_counter() - t0
    iters = max(3, min(300, int(min_s / max(once, 1e-4))))
    times = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) / iters)
    med = float(np.median(times))
    iqr = float(np.percentile(times, 75) - np.percentile(times, 25))
    return med, iqr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.config import FeatureConfig, frame_geometry, n_frames
    from speaker_recognition_tpu.features import extract
    from speaker_recognition_tpu.models import gmm
    from speaker_recognition_tpu.ops import frontend, levinson
    from speaker_recognition_tpu.utils import profiling

    fs, utt_seconds, B, S, K = 8000, 5.0, 512, 4, 32
    L = int(fs * utt_seconds)
    padded = -(-L // 4096) * 4096
    fcfg = FeatureConfig()
    d = fcfg.dim
    mf = fcfg.mfcc
    lp = fcfg.lpc
    flen, fshift = frame_geometry(fs, mf.win_length_ms, mf.win_shift_ms)
    T = n_frames(padded, flen, fshift)
    rng = np.random.RandomState(0)
    signals = (rng.randn(B, padded) * 3000).astype(np.float32)
    signals[:, L:] = 0
    lengths = np.full((B,), L, np.int32)
    sig = jnp.asarray(signals)
    lens = jnp.asarray(lengths)
    bank = gmm.GmmParams(
        weights=jnp.asarray(np.full((S, K), 1.0 / K, np.float32)),
        means=jnp.asarray(rng.randn(S, K, d).astype(np.float32)),
        sigmas=jnp.asarray((0.5 + rng.rand(S, K, d)).astype(np.float32)),
    )
    backend = jax.default_backend()
    audio_s = B * utt_seconds
    rows = []

    def sync(out):
        # Fetch ONE small leaf; fetching whole arrays over the axon tunnel
        # costs hundreds of ms and would swamp the phase timing, so every
        # measured fn below is wrapped to return a scalar reduction.
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf).ravel()[0]

    def scalarized(fn):
        @jax.jit
        def wrapped(*a):
            out = fn(*a)
            return [jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(leaf.dtype, jnp.floating)]
        return wrapped

    def add(name, seconds, flops=0.0, bytes_moved=0.0, iqr=0.0,
            dtype="f32", precision="default"):
        # dtype/precision select the HONEST matmul peak: f32 operands at
        # default precision execute as a single bf16 MXU pass on TPU, so
        # the bf16 peak applies (r2 recorded an impossible 1.61x of
        # roofline by using the f32 peak here — VERDICT r2 weak 4).
        row = {"phase": name, "seconds_per_batch": seconds,
               "iqr_seconds": iqr,
               "audio_s_per_s": audio_s / seconds, "backend": backend,
               "B": B, "T": T}
        if flops and backend == "tpu":
            row["roofline"] = profiling.roofline(
                flops, bytes_moved, seconds, dtype=dtype, precision=precision)
        rows.append(row)
        extra = ""
        if "roofline" in row:
            rf = row["roofline"]
            extra = (f"  {rf['achieved_tflops']:.2f} TF/s "
                     f"{100*rf['fraction_of_roofline']:.0f}% of "
                     f"{rf['bound']} roofline @{rf['peak_tflops']:.0f}TF "
                     f"{dtype}/{precision}")
        print(f"{name:26s} {seconds*1e3:8.3f} ms (iqr {iqr*1e3:.3f})  "
              f"{audio_s/seconds:12.0f} audio-s/s{extra}")

    # --- frontend variants ---------------------------------------------
    # packed DFT flops: frames(T per utt) x [flen -> 2*flen] matmul + mel/ac
    n_fr = B * T
    ncols = 2 * flen
    nmel_pad = -(-mf.n_filters // 8) * 8
    dft_flops = 2.0 * n_fr * flen * ncols
    post_flops = 2.0 * n_fr * ncols * (nmel_pad + lp.n_lpc + 1) \
        + 2.0 * n_fr * nmel_pad * mf.n_ceps
    frontend_bytes = (B * padded + n_fr * (mf.n_ceps + lp.n_lpc + 1)) * 4.0

    for name, mode in [("frontend_xla", "off"), ("frontend_pallas", "on")]:
        fn = scalarized(
            extract._feature_fn(fs, fcfg, padded, "float32", mode, "f32"))
        try:
            s, iqr = measure(fn, (sig, lens), sync)
        except Exception as e:  # noqa: BLE001
            print(f"# {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        add(name, s, dft_flops + post_flops, frontend_bytes, iqr=iqr)

    # --- isolated stages ------------------------------------------------
    feats_fn = extract._feature_fn(fs, fcfg, padded, "float32", "off", "f32")
    feats, mask = feats_fn(sig, lens)
    feats = jax.block_until_ready(feats)

    # raw packed DFT matmul alone (the FLOP core): frames @ D -> square
    D_np, W_np, A_np = frontend.packed_frontend_operators(
        flen, mf.fft_size, mf.pre_emph, frontend.mel_filterbank(
            fs, mf.fft_size, mf.n_filters).T,
        lpc_order=lp.n_lpc, preemph_first=mf.preemph_first)
    from speaker_recognition_tpu.ops.framing import frame_signal
    frames = jax.block_until_ready(frame_signal(sig, flen, fshift))
    D_c = jnp.asarray(D_np, jnp.float32)

    @jax.jit
    def dft_only(fr):
        X = fr @ D_c
        return jnp.sum(X * X, axis=-1)

    s, iqr = measure(scalarized(dft_only), (frames,), sync)
    add("dft_matmul_only", s, dft_flops,
        (n_fr * flen + n_fr) * 4.0, iqr=iqr)

    # Levinson recursion alone on realistic autocorrelations
    r_in = jax.block_until_ready(
        jnp.asarray(rng.rand(B, T, lp.n_lpc + 1).astype(np.float32) + 2.0))

    @jax.jit
    def levinson_only(r):
        return levinson.lpc_from_autocorr(r)

    s, iqr = measure(scalarized(levinson_only), (r_in,), sync)
    add("levinson_only", s, 0.0, 0.0, iqr=iqr)

    # CMVN alone
    ceps = jax.block_until_ready(feats[..., : mf.n_ceps])

    @jax.jit
    def cmvn_only(c, m):
        return extract.masked_cmvn(c, m)

    s, iqr = measure(scalarized(cmvn_only), (ceps, mask), sync)
    add("cmvn_only", s, iqr=iqr)

    # pallas signal-level frontend alone (cmvn fused, the serving path)
    from speaker_recognition_tpu.ops import pallas_frontend
    D2_np, W2_np, A2_np = frontend.packed_frontend_operators(
        flen, mf.fft_size, mf.pre_emph, frontend.mel_filterbank(
            fs, mf.fft_size, mf.n_filters).T,
        lpc_order=lp.n_lpc, preemph_first=mf.preemph_first)
    dct2_np = frontend.dft_power_projection  # noqa: F841 (unused)
    dctm = frontend.dct_matrix(mf.n_filters)[1:mf.n_ceps + 1].T
    nv = jax.block_until_ready(jnp.asarray(
        np.full((B,), T - 1 if (padded - L) else T, np.int32)))
    for name, bf16 in [("frontend_pl_signal_f32", False),
                       ("frontend_pl_signal_bf16", True)]:
        try:
            f = lambda s, n, b=bf16: pallas_frontend.packed_from_signals(
                s, fshift, D2_np, W2_np, dctm, 1e-35, A2_np,
                interpret=jax.default_backend() != "tpu", mm_bf16=b,
                n_valid=n, cmvn=True)
            ssec, iqr = measure(scalarized(f), (sig, nv), sync)
            add(name, ssec, dft_flops + post_flops, frontend_bytes,
                iqr=iqr, dtype="bf16" if bf16 else "f32")
        except Exception as e:  # noqa: BLE001
            print(f"# {name} failed: {repr(e)[:160]}", file=sys.stderr)

    # unrolled levinson alone (the serving path's LPC)
    @jax.jit
    def levinson_unrolled_only(r):
        return levinson.levinson_unrolled(r, lp.n_lpc)

    s, iqr = measure(scalarized(levinson_unrolled_only), (r_in,), sync)
    add("levinson_unrolled_only", s, iqr=iqr)

    # pallas bank scoring alone (vmapped over the batch)
    from speaker_recognition_tpu.ops import pallas_gmm

    @jax.jit
    def score_pallas_only(f, m, bw, bm, bs):
        b = gmm.GmmParams(bw, bm, bs)
        return jax.vmap(lambda X, mm: pallas_gmm.bank_avg_loglik(
            b, X, mm, interpret=jax.default_backend() != "tpu"))(f, m)

    s, iqr = measure(scalarized(score_pallas_only), (feats, mask, *bank), sync)
    add("bank_scoring_pallas_only", s,
        2.0 * n_fr * (2 * d) * (S * K), (n_fr * d) * 4.0, iqr=iqr)

    # bank scoring alone
    score_flops = 2.0 * n_fr * (2 * d) * (S * K)
    score_bytes = (n_fr * d + S * K * (2 * d + 1)) * 4.0

    @jax.jit
    def score_only(f, m, bw, bm, bs):
        b = gmm.GmmParams(bw, bm, bs)
        scores = jax.vmap(lambda X, mm: gmm.bank_avg_loglik(b, X, mm))(f, m)
        return jnp.argmax(scores, axis=-1)

    s, iqr = measure(score_only, (feats, mask, *bank), sync)
    add("bank_scoring_only", s, score_flops, score_bytes, iqr=iqr)

    # WIDE bank scoring (r3): all B*T frames in the matmul M dimension
    # instead of B narrow [T, d] x [d, S*K] products (VERDICT r2 weak 6:
    # the vmapped form ran at ~8% of even the understated roofline)
    @jax.jit
    def score_wide_xla(f, m, bw, bm, bs):
        b = gmm.GmmParams(bw, bm, bs)
        return jnp.argmax(gmm.batch_bank_avg_loglik(b, f, m), axis=-1)

    s, iqr = measure(score_wide_xla, (feats, mask, *bank), sync)
    add("bank_scoring_wide_xla", s, score_flops, score_bytes, iqr=iqr)

    @jax.jit
    def score_wide_pallas(f, m, bw, bm, bs):
        b = gmm.GmmParams(bw, bm, bs)
        return jnp.argmax(pallas_gmm.batch_bank_avg_loglik(
            b, f, m, interpret=jax.default_backend() != "tpu"), axis=-1)

    s, iqr = measure(score_wide_pallas, (feats, mask, *bank), sync)
    add("bank_scoring_wide_pallas", s, score_flops, score_bytes, iqr=iqr)

    # --- full predict programs -------------------------------------------
    import bench

    for name, (mode, mm) in [("predict_xla_f32", ("off", "f32")),
                             ("predict_pallas_f32", ("on", "f32"))]:
        fn = bench_build_predict(fs, fcfg, padded, mode, mm)
        try:
            s, iqr = measure(fn, (sig, lens, *bank), sync)
        except Exception as e:  # noqa: BLE001
            print(f"# {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        add(name, s, dft_flops + post_flops + score_flops,
            frontend_bytes + score_bytes, iqr=iqr)

    out = args_cli.out
    if out:
        path = os.path.join(os.path.dirname(os.path.realpath(__file__)), out) \
            if not os.path.isabs(out) else out
        with open(path, "a") as f:
            ts = time.time()
            for row in rows:
                f.write(json.dumps({"ts": ts, **row}) + "\n")
        print(f"# wrote {len(rows)} rows to {path}", file=sys.stderr)


def bench_build_predict(fs, fcfg, padded, pallas_mode, mm_dtype):
    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.features.extract import _feature_fn
    from speaker_recognition_tpu.models import gmm

    feature_fn = _feature_fn(fs, fcfg, padded, "float32", pallas_mode, mm_dtype)

    @jax.jit
    def predict(signals, lengths, bw, bm, bs):
        feats, mask = feature_fn(signals, lengths)
        b = gmm.GmmParams(bw, bm, bs)
        scores = jax.vmap(lambda X, m: gmm.bank_avg_loglik(b, X, m))(feats, mask)
        return jnp.argmax(scores, axis=-1)

    return predict


if __name__ == "__main__":
    main()
