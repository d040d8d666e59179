"""api/fastpath variant-consistency tests (interpret mode on CPU).

Every (frontend, mm, scoring) variant of the serving predict program must
produce the same scores as the reference composition extract_batch +
models/gmm.bank_avg_loglik, with identical argmax decisions.
"""

import itertools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speaker_recognition_tpu.api import fastpath
from speaker_recognition_tpu.config import FeatureConfig, frame_geometry, n_frames
from speaker_recognition_tpu.features import extract
from speaker_recognition_tpu.models import gmm

FS = 8000


def _batch(B=6, lo=0.7, hi=1.0, seed=0, padded=8192):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(int(lo * FS), int(hi * FS), size=B)
    signals = np.zeros((B, padded), np.float32)
    for i, L in enumerate(lengths):
        signals[i, :L] = (rng.randn(L) * 3000).astype(np.float32)
    return jnp.asarray(signals), jnp.asarray(lengths.astype(np.int32))


def _bank(S, K, d, seed=1):
    rng = np.random.RandomState(seed)
    return gmm.GmmParams(
        weights=jnp.asarray(rng.dirichlet(np.ones(K), size=S).astype(np.float32)),
        means=jnp.asarray(rng.randn(S, K, d).astype(np.float32)),
        sigmas=jnp.asarray((0.5 + rng.rand(S, K, d)).astype(np.float32)))


def _want(signals, lengths, bank, fcfg):
    feats, mask = extract._feature_fn(
        FS, fcfg, int(signals.shape[-1]), "float32", "off", "f32")(
            signals, lengths)
    return np.asarray(jax.vmap(
        lambda X, m: gmm.bank_avg_loglik(bank, X, m))(feats, mask))


@pytest.mark.parametrize("front,mm,scoring", [
    ("xla", "f32", "xla"),
    ("xla", "f32", "xla_wide"),
    ("xla", "f32", "pallas"),
    ("xla", "f32", "pallas_wide"),
    ("pallas", "f32", "xla"),
    ("pallas", "f32", "pallas"),
    ("pallas", "f32", "pallas_wide"),
    ("pallas", "bf16", "pallas"),
    ("pallas", "bf16", "pallas_wide"),
])
def test_variants_agree(front, mm, scoring):
    fcfg = FeatureConfig()
    signals, lengths = _batch()
    bank = _bank(4, 32, fcfg.dim)
    want = _want(signals, lengths, bank, fcfg)

    fn = fastpath.predict_scores_fn(FS, fcfg, int(signals.shape[-1]),
                                    front, mm, scoring, interpret=True)
    got = np.asarray(fn(signals, lengths, *bank))
    assert got.shape == want.shape
    if mm == "bf16":
        # bf16 DFT operands: feature-level perturbation, decision-stable
        # on separated banks; scores stay within a loose band
        np.testing.assert_allclose(got, want, rtol=0.2, atol=2.0)
    else:
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        assert (got.argmax(-1) == want.argmax(-1)).all()


def test_fused_scores_dispatch_contract(monkeypatch):
    """fused_scores: None when disabled or non-f32; interpret mode engages
    the pipeline on CPU; geometry fallback variant is the XLA program."""
    fcfg = FeatureConfig()
    signals, lengths = _batch(B=4)
    bank = _bank(3, 8, fcfg.dim)

    monkeypatch.setenv("SRTPU_PALLAS", "off")
    assert fastpath.fused_scores(signals, lengths, bank, FS, fcfg) is None

    monkeypatch.setenv("SRTPU_PALLAS", "interpret")
    got = fastpath.fused_scores(signals, lengths, bank, FS, fcfg)
    assert got is not None
    want = _want(signals, lengths, bank, fcfg)
    # the r3 measured dispatch serves f32 operands everywhere (bf16 never
    # beat f32 beyond the recorded IQR) -> tight band, identical argmax
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
    assert (np.asarray(got).argmax(-1) == want.argmax(-1)).all()

    assert fastpath.fused_scores(signals, lengths, bank, FS, fcfg,
                                 dtype="float64") is None


def test_measured_dispatch_table_wellformed(monkeypatch):
    """Dispatch-table invariants: every entry is a valid variant; a pallas
    frontend is never dispatched to a geometry it cannot express; raising
    the matmul precision serves the bit-compatible XLA parity program.
    (The speed side — chosen variant >= the XLA floor at every swept
    geometry — is asserted on the chip in tests_tpu/test_tpu_dispatch.py
    against experiments/results/r4_geometry_sweep.jsonl.)"""
    fronts, mms = {"xla", "pallas"}, {"f32", "bf16"}
    scorings = {"xla", "xla_wide", "pallas", "pallas_wide"}
    for key, (front, mm, scoring) in fastpath._MEASURED_DISPATCH.items():
        assert front in fronts and mm in mms and scoring in scorings, key
    assert fastpath._FLOOR_VARIANT[0] == "xla"

    fcfg = FeatureConfig()
    # a non-bucket padded length cannot use the fused frontend
    assert fastpath.default_variant(FS, fcfg, 8191, False)[0] == "xla"
    # MFCC-only fuses via the placeholder-autocorr kernel (r3: 1.60 ms vs
    # 1.87 for the XLA frontend at the swept geometry)
    mfcc_only = FeatureConfig(mfcc=fcfg.mfcc, use_lpc=False)
    assert fastpath.default_variant(FS, mfcc_only, 8192, False) == \
        ("pallas", "f32", "pallas_wide")
    # deltas compose with the fused frontend (XLA delta epilogue) but the
    # tripled feature dim flips the scoring winner to vmapped XLA
    deltas = FeatureConfig(mfcc=fcfg.mfcc, lpc=fcfg.lpc, n_deltas=2)
    assert fastpath.default_variant(FS, deltas, 8192, False) == \
        ("pallas", "f32", "xla")

    monkeypatch.setenv("SRTPU_MATMUL_PRECISION", "highest")
    assert fastpath.default_variant(FS, fcfg, 8192, False) == \
        ("xla", "f32", "xla")


def test_predict_batch_uses_fastpath(monkeypatch):
    """ModelInterface.predict_batch returns identical labels through the
    fused path (interpret) and the fallback path."""
    sys.path.insert(0, os.path.dirname(os.path.realpath(__file__)))
    from test_endtoend import SPEAKER_FREQS, synth_utterance
    from speaker_recognition_tpu.api.interface import ModelInterface

    mi = ModelInterface()
    for label in SPEAKER_FREQS:
        mi.enroll(label, FS, synth_utterance(label, 3.0, seed=0))
    mi.train(seed=0)
    tests = [synth_utterance(label, 1.5, seed=9) for label in SPEAKER_FREQS]

    monkeypatch.setenv("SRTPU_PALLAS", "off")
    want = mi.predict_batch(FS, tests)
    monkeypatch.setenv("SRTPU_PALLAS", "interpret")
    got = mi.predict_batch(FS, tests)
    assert got == want == list(SPEAKER_FREQS)


def test_fallback_classification(monkeypatch):
    """ADVICE r4: only backend errors may degrade to the floor program —
    genuine bugs propagate, and SRTPU_FASTPATH_STRICT=1 re-raises even
    backend errors so CI cannot silently pass on the fallback path."""
    fcfg = FeatureConfig()
    signals, lengths = _batch(B=4)
    bank = _bank(3, 8, fcfg.dim)
    monkeypatch.setenv("SRTPU_PALLAS", "interpret")
    monkeypatch.setenv("SRTPU_FASTPATH_STRICT", "0")  # conftest sets 1
    want = _want(signals, lengths, bank, fcfg)

    class XlaRuntimeError(Exception):  # name is what classifies it
        pass

    # pin a non-floor dispatch so the fallback chain has two candidates
    # (at B=4 the real table already dispatches the floor variant)
    monkeypatch.setattr(fastpath, "default_variant",
                        lambda *a, **k: ("xla", "f32", "xla_wide"))
    real_fn = fastpath.predict_scores_fn
    calls = []

    def fake(fs, cfg, padded, front, mm, scoring, *a, **k):
        calls.append((front, mm, scoring))
        if len(calls) == 1:           # the dispatched fast variant
            def boom(*_a):
                raise XlaRuntimeError("simulated Mosaic compile failure")
            return boom
        return real_fn(fs, cfg, padded, front, mm, scoring, *a, **k)

    monkeypatch.setattr(fastpath, "predict_scores_fn", fake)
    monkeypatch.setattr(fastpath, "_BROKEN_VARIANTS", set())
    monkeypatch.setattr(fastpath, "_OK_VARIANTS", set())
    got = fastpath.fused_scores(signals, lengths, bank, FS, fcfg)
    assert got is not None and len(calls) == 2  # fell back to the floor
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
    assert len(fastpath._BROKEN_VARIANTS) == 1  # compile failure remembered

    # strict mode: the same backend failure re-raises instead
    calls.clear()
    monkeypatch.setattr(fastpath, "_BROKEN_VARIANTS", set())
    monkeypatch.setenv("SRTPU_FASTPATH_STRICT", "1")
    with pytest.raises(XlaRuntimeError):
        fastpath.fused_scores(signals, lengths, bank, FS, fcfg)
    monkeypatch.setenv("SRTPU_FASTPATH_STRICT", "0")

    # a non-backend error (a genuine bug) propagates even without strict
    def fake_bug(fs, cfg, padded, front, mm, scoring, *a, **k):
        def boom(*_a):
            raise ValueError("operand prep bug")
        return boom

    monkeypatch.setattr(fastpath, "predict_scores_fn", fake_bug)
    monkeypatch.setattr(fastpath, "_BROKEN_VARIANTS", set())
    with pytest.raises(ValueError):
        fastpath.fused_scores(signals, lengths, bank, FS, fcfg)


def test_geometry_gate():
    fcfg = FeatureConfig()
    assert fastpath.fused_geometry_ok(FS, fcfg, 8192)
    assert not fastpath.fused_geometry_ok(FS, fcfg, 8191)  # not % fshift
    # per-utterance VMEM row ceiling (r5: a 150 s clip OOM'd the Mosaic
    # scoped stack at 41.13 MB vs the 16 MB limit) — long clips go XLA
    from speaker_recognition_tpu.ops import pallas_frontend as pf
    too_long = (pf.MAX_UTT_ROWS + 8) * 128
    assert not fastpath.fused_geometry_ok(FS, fcfg, too_long)
    assert fastpath.default_variant(FS, fcfg, too_long, False)[0] == "xla"
    # a long utterance still extracts (XLA path) end to end
    rng = np.random.RandomState(3)
    sig = (rng.randn(FS * 50) * 3000).astype(np.float64)
    feat = extract.mix_feature(FS, sig, fcfg)
    from speaker_recognition_tpu.config import n_frames
    assert feat.shape[1] == fcfg.dim and np.isfinite(feat).all()
    # non-50%-overlap geometry
    from speaker_recognition_tpu.config import MfccConfig
    bad = FeatureConfig(mfcc=MfccConfig(win_shift_ms=10), use_lpc=False)
    assert not fastpath.fused_geometry_ok(FS, bad, 8000)
