"""Tracing / profiling utilities.

Replaces the reference's RAII wall-clock scopes (Timer/GuardedTimer,
src/gmm/src/timer.hh:12-52, printed at verbosity>=2 around every EM phase)
and ad-hoc time.time() prints with:

  * phase_timer — a context manager that blocks on device results so the
    measured interval is real device time, and records into a structured
    registry (jsonl-able, SURVEY.md section 5 "structured metrics");
  * trace — a wrapper around jax.profiler for on-demand XLA traces;
  * roofline — arithmetic-intensity bookkeeping for the named hot kernels
    (STFT/DFT, mel projection, GMM log-posterior) against chip peaks.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax

__all__ = ["phase_timer", "metrics", "dump_metrics", "trace", "roofline"]

metrics: list[dict] = []


@contextlib.contextmanager
def phase_timer(name: str, sync=None, **labels):
    """Time a phase; `sync` (a pytree of device arrays) is blocked on before
    stopping the clock so async dispatch does not fake speed."""
    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        target = holder.get("sync", sync)
        if target is not None:
            jax.block_until_ready(target)
        dt = time.perf_counter() - t0
        metrics.append({"phase": name, "seconds": dt, **labels})


def dump_metrics(path: str):
    with open(path, "w") as f:
        for m in metrics:
            f.write(json.dumps(m) + "\n")


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope; view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Peak numbers for roofline sanity checks (per chip). v5e: ~197 bf16
# TFLOP/s, ~49 f32 TFLOP/s, ~819 GB/s HBM.
CHIP_PEAKS = {
    "v5e": {"bf16_tflops": 197.0, "f32_tflops": 49.0, "hbm_gbps": 819.0},
    "v4": {"bf16_tflops": 275.0, "f32_tflops": 69.0, "hbm_gbps": 1228.0},
}


def roofline(flops: float, bytes_moved: float, seconds: float,
             chip: str = "v5e", dtype: str = "f32") -> dict:
    """Achieved fraction of the compute/bandwidth roofline for one kernel."""
    peaks = CHIP_PEAKS[chip]
    peak_flops = peaks[f"{dtype}_tflops"] * 1e12
    peak_bw = peaks["hbm_gbps"] * 1e9
    intensity = flops / max(bytes_moved, 1.0)
    ridge = peak_flops / peak_bw
    bound = "compute" if intensity >= ridge else "memory"
    limit = peak_flops if bound == "compute" else peak_bw * intensity
    achieved = flops / seconds
    return {
        "achieved_tflops": achieved / 1e12,
        "intensity_flops_per_byte": intensity,
        "bound": bound,
        "fraction_of_roofline": achieved / limit,
    }
