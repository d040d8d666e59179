"""Serving fast path: the measured-fastest predict program per backend.

predict = frontend (packed DFT + mel/log/DCT + CMVN + unrolled Levinson)
        + bank scoring (joint log-density matmul + per-speaker logsumexp
          + masked per-frame average)

Variant space (every combination measured on the v5e chip by
experiments/bench_fused.py; recorded in experiments/results/):

  frontend:  "xla"     — features/extract XLA packed program
             "pallas"  — pallas_frontend.packed_from_signals (spectra stay
                         in VMEM; framing fused into the kernel)
  mm:        "f32" | "bf16" DFT matmul operands. NOTE: on TPU the XLA
             DEFAULT matmul precision is already single-pass bf16
             (measured scaled err 2.7e-3 == explicit bf16 operands), so
             "bf16" only changes numerics for the in-kernel Mosaic dots,
             which otherwise run multi-pass f32.
  scoring:   "xla"     — models/gmm.bank_avg_loglik vmapped over the batch
             "pallas"  — pallas_gmm.bank_avg_loglik vmapped (logp tensor
                         never hits HBM)

`fused_scores` is the production entry: it picks the recorded-fastest
variant for the backend and returns None when the pipeline cannot express
the config (caller falls back to the unfused path). SRTPU_PALLAS=off forces
the XLA variant; =interpret runs kernels in interpret mode (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig, frame_geometry
from ..features import extract
from ..models import gmm as gmm_mod
from ..models.gmm import GmmParams
from ..ops import pallas_gmm

__all__ = ["fused_scores", "fused_geometry_ok", "predict_scores_fn"]


def fused_geometry_ok(fs: int, cfg: FeatureConfig, padded_len: int) -> bool:
    """Whether the pallas signal-level frontend can express this config
    (the XLA variant has no geometry constraints beyond the extractor's)."""
    mf, lp = cfg.mfcc, cfg.lpc
    if cfg.n_deltas:
        return False  # delta features are not in the pallas frontend
    flen, fshift = frame_geometry(fs, mf.win_length_ms, mf.win_shift_ms)
    if cfg.use_lpc:
        lgeom = frame_geometry(fs, lp.win_length_ms, lp.win_shift_ms)
        if lgeom != (flen, fshift) or lp.pre_emph != mf.pre_emph:
            return False
    return (flen == 2 * fshift
            and padded_len % fshift == 0
            and (padded_len // fshift) % 8 == 0
            and mf.fft_size >= 2 * flen)


@functools.lru_cache(maxsize=32)
def predict_scores_fn(fs: int, cfg: FeatureConfig, padded_len: int,
                      frontend: str = "xla", mm: str = "f32",
                      scoring: str = "xla", interpret: bool = False,
                      precision: str = "default"):
    """Build the jitted (signals, lengths, weights, means, sigmas) ->
    [B, S] scores program for one geometry/variant."""
    pallas_mode = ("interpret" if interpret else "on") \
        if frontend == "pallas" else "off"
    feature_fn = extract._feature_fn(fs, cfg, padded_len, "float32",
                                     pallas_mode, mm, None, precision)

    @jax.jit
    def predict(signals, lengths, bw, bm, bs):
        feats, mask = feature_fn(signals, lengths)
        bank = GmmParams(bw, bm, bs)
        if scoring == "pallas":
            return jax.vmap(lambda X, m: pallas_gmm.bank_avg_loglik(
                bank, X, m, interpret=interpret))(feats, mask)
        return jax.vmap(lambda X, m: gmm_mod.bank_avg_loglik(bank, X, m))(
            feats, mask)

    if precision == "default":
        return predict

    def predict_at_precision(*args):
        with jax.default_matmul_precision(precision):
            return predict(*args)

    return predict_at_precision


def _mode() -> str:
    import os
    return os.environ.get("SRTPU_PALLAS", "auto")


def default_variant(fs: int, cfg: FeatureConfig, padded_len: int,
                    interpret: bool) -> tuple[str, str, str]:
    """(frontend, mm, scoring) for production serving.

    Measured at the headline serving geometry on v5e
    (experiments/results/r2_fused_tpu.jsonl): the pallas frontend with bf16
    DFT operands + pallas scoring is the fastest combination; bf16 operands
    match the precision XLA's DEFAULT matmuls already use on TPU, so the
    numerics class is unchanged vs the XLA program. When the user raises
    SRTPU_MATMUL_PRECISION above 'default', bf16 operands and the fused
    kernels would defeat it — parity mode serves the XLA f32 program.
    """
    if extract._matmul_precision() != "default":
        return ("xla", "f32", "xla")
    if not fused_geometry_ok(fs, cfg, padded_len):
        return ("xla", "f32", "xla")
    return ("pallas", "bf16", "pallas")


def fused_scores(signals: jnp.ndarray, lengths: jnp.ndarray,
                 bank: GmmParams, fs: int,
                 cfg: FeatureConfig = FeatureConfig(),
                 dtype: str = "float32") -> jnp.ndarray | None:
    """[B, Lp] padded signals + [B] lengths + [S, K] bank -> [B, S] scores
    via the fastest recorded variant, or None when the caller should use
    its own (non-f32 or env-disabled) path."""
    mode = _mode()
    if mode in ("0", "off") or jnp.dtype(dtype) != jnp.float32:
        return None
    interpret = mode == "interpret"
    if not interpret and jax.default_backend() != "tpu":
        return None
    padded_len = int(signals.shape[-1])
    front, mm, scoring = default_variant(fs, cfg, padded_len, interpret)
    fn = predict_scores_fn(fs, cfg, padded_len, front, mm, scoring,
                           interpret, extract._matmul_precision())
    return fn(signals.astype(jnp.float32), lengths.astype(jnp.int32),
              bank.weights.astype(jnp.float32),
              bank.means.astype(jnp.float32),
              bank.sigmas.astype(jnp.float32))
