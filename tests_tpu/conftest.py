"""Real-TPU test tier (VERDICT r1 item 2).

The main suite (tests/) forces a CPU backend with 8 virtual devices and
therefore only ever exercises Pallas kernels in interpret mode. This tier
runs COMPILED kernels on the actual TPU chip (reached through the axon
remote backend in this environment) and checks numerics against
backend-independent float64 numpy oracles.

Run:  python -m pytest tests_tpu/ -q        (do NOT set JAX_PLATFORMS=cpu)
Skips itself entirely when no TPU is reachable.

Tolerances: the TPU's DEFAULT matmul precision is single-pass bf16
(measured: scaled error ~3e-3 on the frontend DFT operands —
experiments/results/r2_breakdown.jsonl context), so feature-level
comparisons use bf16-scale bounds; decision-level checks are exact.
"""

import os

import pytest

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="no TPU backend reachable")
        for item in items:
            item.add_marker(skip)
