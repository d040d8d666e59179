#!/usr/bin/env python3
"""Bank-scaling benchmark: BASELINE config #4 ("100-speaker model-bank
batched LLR scoring"). Compares the XLA scoring path against the fused
Pallas kernel at several bank sizes and prints jsonl.

Run on TPU: python experiments/bench_bank.py
CPU smoke:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/bench_bank.py --interpret --sizes 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+", type=int, default=[4, 32, 100, 256])
    ap.add_argument("--frames", type=int, default=312 * 64,
                    help="total frames scored per call (64 x 5s utterances)")
    ap.add_argument("--mixtures", type=int, default=32)
    ap.add_argument("--dim", type=int, default=28)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.models import gmm
    from speaker_recognition_tpu.ops import pallas_gmm

    rng = np.random.RandomState(0)
    n, d, K = args.frames, args.dim, args.mixtures
    X = jnp.asarray(rng.randn(n, d), jnp.float32)
    mask = jnp.ones(n, dtype=bool)
    audio_seconds = n * 0.016  # 16 ms frame shift

    def measure(fn):
        # timings end with a value fetch of the LAST output: the device
        # executes enqueued programs in order, so one fetch drains the
        # whole queue (block_until_ready returns early on the axon remote
        # backend, and a per-rep fetch would pay the tunnel round-trip
        # every iteration)
        float(np.asarray(fn())[0])  # warmup/compile
        t0 = time.perf_counter()
        float(np.asarray(fn())[0])
        once = time.perf_counter() - t0
        reps = max(3, min(500, int(1.0 / max(once, 1e-4))))
        ts = []
        for _ in range(5):  # median of 5 trials (r3 variance methodology)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            float(np.asarray(out)[0])
            ts.append((time.perf_counter() - t0) / reps)
        return float(np.median(ts))

    for S in args.sizes:
        w = rng.rand(S, K) + 0.1
        bank = gmm.GmmParams(
            jnp.asarray(w / w.sum(1, keepdims=True), jnp.float32),
            jnp.asarray(rng.randn(S, K, d), jnp.float32),
            jnp.asarray(0.5 + rng.rand(S, K, d), jnp.float32))

        xla = jax.jit(lambda: gmm.bank_avg_loglik(bank, X, mask))
        t_xla = measure(xla)
        rec = {"bank_size": S, "frames": n,
               "xla_audio_s_per_s": audio_seconds / t_xla}
        try:
            pk = jax.jit(lambda: pallas_gmm.bank_avg_loglik(
                bank, X, mask, interpret=args.interpret))
            t_p = measure(pk)
            # correctness guard
            a = np.asarray(xla())
            b = np.asarray(pk())
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
            rec["pallas_audio_s_per_s"] = audio_seconds / t_p
            rec["pallas_speedup"] = t_xla / t_p
        except Exception as e:  # noqa: BLE001
            rec["pallas_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
