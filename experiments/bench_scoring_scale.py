#!/usr/bin/env python3
"""Floor-corrected bank-scoring comparison (VERDICT r3 item 8 evidence).

The per-program dispatch floor through the axon tunnel is ~0.8 ms (a B=8
full predict and a trivial jitted program both measure it), so isolated
sub-millisecond phases in bench_breakdown are floor-dominated and hide
kernel differences. This script (a) measures the dispatch floor with a
trivial program, (b) measures the three scoring variants at growing
workloads (frames x1, x4, x16), and (c) reports the floor-corrected
device-time ratio of vmapped vs wide scoring at the headline bank
(S=4, K=32) — plus the raw numbers so nothing rests on the subtraction.

Usage: python experiments/bench_scoring_scale.py [--out results/r3_scoring_scale.jsonl]
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


def measure(f, fargs, sync, n_trials=5, min_s=1.0):
    sync(f(*fargs))
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
    return float(np.median(ts)), \
        float(np.percentile(ts, 75) - np.percentile(ts, 25))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from speaker_recognition_tpu.models import gmm
    from speaker_recognition_tpu.ops import pallas_gmm

    S, K, d, T = 4, 32, 28, 320
    rng = np.random.RandomState(0)
    bank = gmm.GmmParams(
        weights=jnp.asarray(np.full((S, K), 1.0 / K, np.float32)),
        means=jnp.asarray(rng.randn(S, K, d).astype(np.float32)),
        sigmas=jnp.asarray((0.5 + rng.rand(S, K, d)).astype(np.float32)))
    interpret = jax.default_backend() != "tpu"
    rows = []

    def sync(out):
        return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]

    # (a) dispatch floor: a trivial program
    @jax.jit
    def nop(x):
        return x + 1.0

    tiny = jnp.zeros((8, 8), jnp.float32)
    floor, fiqr = measure(nop, (tiny,), sync)
    rows.append({"phase": "dispatch_floor", "seconds": floor,
                 "iqr_seconds": fiqr})
    print(f"dispatch_floor          {floor*1e3:8.3f} ms (iqr {fiqr*1e3:.3f})",
          flush=True)

    # (b) scoring variants at growing workloads
    variants = {
        "vmapped_xla": lambda f, m: jax.vmap(
            lambda X, mm: gmm.bank_avg_loglik(bank, X, mm))(f, m),
        "vmapped_pallas": lambda f, m: jax.vmap(
            lambda X, mm: pallas_gmm.bank_avg_loglik(
                bank, X, mm, interpret=interpret))(f, m),
        "wide_xla": lambda f, m: gmm.batch_bank_avg_loglik(bank, f, m),
        "wide_pallas": lambda f, m: pallas_gmm.batch_bank_avg_loglik(
            bank, f, m, interpret=interpret),
    }
    meds = {}
    for scale in (1, 4, 16):
        B = 512 * scale
        feats = jnp.asarray(rng.randn(B, T, d).astype(np.float32))
        mask = jnp.ones((B, T), bool)
        for name, fn in variants.items():
            if name == "vmapped_pallas" and scale == 16:
                continue  # 8192 tiny vmapped kernels: pointless + slow
            jfn = jax.jit(lambda f, m, fn=fn: jnp.sum(fn(f, m)))
            try:
                med, iqr = measure(jfn, (feats, mask), sync)
            except Exception as e:  # noqa: BLE001
                print(f"# {name} x{scale} failed: {repr(e)[:120]}",
                      file=sys.stderr)
                continue
            meds[(name, scale)] = med
            rows.append({"phase": f"scoring_{name}", "scale": scale,
                         "B": B, "seconds": med, "iqr_seconds": iqr})
            print(f"{name:22s} x{scale:2d} {med*1e3:8.3f} ms "
                  f"(iqr {iqr*1e3:.3f})", flush=True)

    # (c) floor-corrected device-time ratio, slope-based: device time per
    # unit workload = (t(x16) - t(x1)) / 15 removes any fixed overhead
    for name in variants:
        a, b = meds.get((name, 1)), meds.get((name, 16))
        if a and b:
            rows.append({"phase": f"device_slope_{name}",
                         "seconds_per_x1_workload": (b - a) / 15.0})
    for lo, hi, label in [(1, 4, "serving_x1_x4"), (1, 16, "x1_x16")]:
        va = meds.get(("vmapped_xla", lo)), meds.get(("vmapped_xla", hi))
        wp = meds.get(("wide_pallas", lo)), meds.get(("wide_pallas", hi))
        if all(va) and all(wp):
            ratio = (va[1] - va[0]) / max(wp[1] - wp[0], 1e-9)
            rows.append({"phase": f"ratio_vmapxla_over_widepallas_{label}",
                         "ratio": round(ratio, 2)})
            print(f"slope ratio ({label}) vmapped_xla / wide_pallas = "
                  f"{ratio:.2f}x", flush=True)

    if args.out:
        path = args.out if os.path.isabs(args.out) else os.path.join(
            os.path.dirname(os.path.realpath(__file__)), args.out)
        ts_ = time.time()
        with open(path, "a") as f:
            for row in rows:
                f.write(json.dumps({"ts": ts_, **row}) + "\n")


if __name__ == "__main__":
    main()
