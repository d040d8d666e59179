"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is tested
on logical CPU devices exactly as SURVEY.md section 4(d) prescribes. x64 is
enabled so float64 oracle comparisons are meaningful.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
# CI runs the fastpath in strict mode: a fast-variant failure re-raises
# instead of silently degrading to the XLA floor (ADVICE r4 — tests must
# never pass on the fallback path without noticing). Tests that exercise
# the fallback machinery itself monkeypatch this off/on explicitly.
os.environ.setdefault("SRTPU_FASTPATH_STRICT", "1")

import jax  # noqa: E402

# The environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (remote TPU over a tunnel), freezing the platform
# choice before this file's env-var edit can take effect — force it here.
# Tip: run tests with PALLAS_AXON_POOL_IPS= to skip the axon registration
# entirely (much faster startup).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() >= 8, jax.devices()
