#!/usr/bin/env python3
"""2-process CPU "cluster": the first real execution of the multi-host path.

BASELINE.md requires the scaling curve at 1 chip / 1 host / >=2 hosts; no
multi-host TPU hardware is reachable from this environment, so this script
builds an actual multi-PROCESS jax.distributed cluster on the CPU backend
(gloo collectives over localhost = the DCN stand-in) and runs the very code
a pod slice would run (parallel/multihost.initialize -> parallel/mesh
sharded EM + bank scoring), verifying:

  * sharded_fit across the process boundary equals the 1-process fit
    (same seed, same data) to f32 reduction tolerance;
  * bank scoring with the bank axis spanning processes equals the local
    computation;
  * and records wall times + an EFFICIENCY column vs the 1-process run
    (VERDICT r2 weak 7 / item 7).

Caveat recorded with the data: this host has 2 physical cores, so any
multi-device configuration is core-oversubscribed and parallel EFFICIENCY
here measures harness overhead, not TPU scaling; the artifact's value is
that the DCN code path (jax.distributed.initialize + cross-process psum /
all_gather) executes and agrees numerically.

Usage:
  python experiments/multiproc_cluster.py [--frames 32768] \
      [--out results/r3_scaling.jsonl]
As a worker (spawned internally):
  python experiments/multiproc_cluster.py --worker I --num-processes N ...
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
PORT = 19733


def worker_main(args):
    # env must be set before jax import (sitecustomize freezes the platform)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, ROOT)
    from speaker_recognition_tpu.parallel import multihost

    if args.num_processes > 1:
        multihost.initialize(coordinator_address=f"localhost:{PORT}",
                             num_processes=args.num_processes,
                             process_id=args.worker)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from speaker_recognition_tpu.config import GmmConfig
    from speaker_recognition_tpu.models import gmm
    from speaker_recognition_tpu.parallel import mesh as pmesh

    n_dev = jax.device_count()
    assert jax.process_count() == args.num_processes
    mesh = pmesh.make_mesh(data=n_dev, bank=1)
    data_sh = NamedSharding(mesh, P(("data", "bank"), None))
    mask_sh = NamedSharding(mesh, P(("data", "bank")))
    rep = NamedSharding(mesh, P())

    # identical global data on every process (deterministic seed)
    n = args.frames
    d, K = 28, args.mixtures
    rng = np.random.RandomState(0)
    X = rng.randn(n, d).astype(np.float32)
    mask = np.ones(n, bool)
    cfg = GmmConfig(n_mixtures=K, n_iterations=args.iters, threshold=0.0)

    Xg = jax.make_array_from_callback((n, d), data_sh, lambda i: X[i])
    mg = jax.make_array_from_callback((n,), mask_sh, lambda i: mask[i])
    key = jax.random.PRNGKey(0)
    keyg = jax.make_array_from_callback(
        key.shape, rep, lambda i: np.asarray(key)[i])

    fit = jax.jit(lambda Xa, ma, ka: gmm.fit(Xa, ma, cfg, ka),
                  in_shardings=(data_sh, mask_sh, rep), out_shardings=rep)
    params, ll = jax.block_until_ready(fit(Xg, mg, keyg))  # compile
    t0 = time.perf_counter()
    params, ll = jax.block_until_ready(fit(Xg, mg, keyg))
    em_s = time.perf_counter() - t0

    # bank scoring with the bank axis spanning the whole cluster
    S = 16
    rngb = np.random.RandomState(1)
    w = rngb.rand(S, K) + 0.1
    bank_np = (w / w.sum(1, keepdims=True),
               rngb.randn(S, K, d), 0.5 + rngb.rand(S, K, d))
    bmesh = pmesh.make_mesh(data=1, bank=n_dev)
    bank_sh = NamedSharding(bmesh, P(("data", "bank")))
    brep = NamedSharding(bmesh, P())
    bank = gmm.GmmParams(*[
        jax.make_array_from_callback(
            a.shape,
            NamedSharding(bmesh, P(("data", "bank")) if a.ndim == 2
                          else P(("data", "bank"), None, None)),
            lambda i, a=a: a[i].astype(np.float32))
        for a in bank_np])
    ns = min(n, 8192)
    Xs = jax.make_array_from_callback((ns, d), brep,
                                      lambda i: X[:ns][i])
    ms = jax.make_array_from_callback((ns,), brep, lambda i: mask[:ns][i])
    score = pmesh.sharded_bank_scores(bmesh)
    scores = jax.block_until_ready(score(bank, Xs, ms))
    t0 = time.perf_counter()
    scores = jax.block_until_ready(score(bank, Xs, ms))
    score_s = time.perf_counter() - t0

    if args.worker == 0:
        out = {
            "processes": jax.process_count(),
            "devices": n_dev,
            "em_seconds": em_s,
            "score_seconds": score_s,
            "ll": float(np.asarray(ll.addressable_data(0))),
            "weights": np.asarray(params.weights.addressable_data(0)),
            "means": np.asarray(params.means.addressable_data(0)),
            "sigmas": np.asarray(params.sigmas.addressable_data(0)),
            "scores": np.asarray(scores.addressable_data(0)),
        }
        np.savez(args.result, **out)
        print(f"# worker 0: np={out['processes']} em={em_s:.3f}s "
              f"score={score_s:.3f}s ll={out['ll']:.3f}", flush=True)


def launch(num_processes: int, frames: int, mixtures: int, iters: int,
           result: str, devices_per_process: int = 1):
    procs = []
    for i in range(num_processes):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": (env.get("XLA_FLAGS", "")
                          + f" --xla_force_host_platform_device_count="
                            f"{devices_per_process}"),
            "JAX_COMPILATION_CACHE_DIR": os.path.join(ROOT, ".jax_cache"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.realpath(__file__),
             "--worker", str(i), "--num-processes", str(num_processes),
             "--frames", str(frames), "--mixtures", str(mixtures),
             "--iters", str(iters), "--result", result],
            env=env, cwd=ROOT))
    rc = [p.wait() for p in procs]
    assert all(r == 0 for r in rc), rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--frames", type=int, default=32768)
    ap.add_argument("--mixtures", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--result", default="/tmp/mp_cluster_result.npz")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker_main(args)
        return

    import numpy as np

    r1 = args.result.replace(".npz", "_np1.npz")
    r2 = args.result.replace(".npz", "_np2.npz")
    t0 = time.perf_counter()
    launch(1, args.frames, args.mixtures, args.iters, r1)
    launch(args.num_processes, args.frames, args.mixtures, args.iters, r2)
    a, b = np.load(r1), np.load(r2)

    # cross-process psum EM must equal the 1-process fit to f32 reduction
    # tolerance (summation order differs across shards)
    for k, tol in [("weights", 1e-5), ("means", 1e-4), ("sigmas", 1e-4),
                   ("scores", 1e-4)]:
        np.testing.assert_allclose(a[k], b[k], rtol=tol, atol=tol,
                                   err_msg=k)
    rel_ll = abs(float(a["ll"]) - float(b["ll"])) / abs(float(a["ll"]))
    assert rel_ll < 1e-5, rel_ll
    em_eff = float(a["em_seconds"]) / float(b["em_seconds"]) \
        / args.num_processes * 1  # same-total-work (strong scaling) basis
    row = {
        "kind": "multiprocess_cpu_cluster",
        "processes": int(b["processes"]),
        "devices": int(b["devices"]),
        "frames": args.frames,
        "em_seconds_np1": float(a["em_seconds"]),
        "em_seconds_np2": float(b["em_seconds"]),
        "em_strong_scaling_efficiency": round(em_eff, 3),
        "numerics_match": True,
        "cores_on_host": os.cpu_count(),
        "note": ("first real execution of jax.distributed multi-process "
                 "path (gloo over localhost as DCN stand-in); host has "
                 f"{os.cpu_count()} cores so efficiency measures harness "
                 "overhead, not TPU scaling"),
    }
    print(json.dumps(row))
    if args.out:
        path = args.out if os.path.isabs(args.out) else os.path.join(
            os.path.dirname(os.path.realpath(__file__)), args.out)
        with open(path, "a") as f:
            f.write(json.dumps({"ts": time.time(), **row}) + "\n")


if __name__ == "__main__":
    main()
