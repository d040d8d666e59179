"""Fused predict kernel (ops/pallas_predict) vs the unfused XLA pipeline.

The fused kernel must reproduce the composition
  features/extract._feature_fn -> models/gmm.bank_avg_loglik
(the bench.py / api predict program) to f32 tolerance, including masking,
CMVN, Levinson LPC NaN-zeroing, and the per-speaker logsumexp.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speaker_recognition_tpu.config import FeatureConfig, MfccConfig, frame_geometry, n_frames
from speaker_recognition_tpu.features import extract
from speaker_recognition_tpu.models import gmm
from speaker_recognition_tpu.ops import frontend, levinson, pallas_predict

FS = 8000


def _operators(fcfg: FeatureConfig, fs: int = FS):
    mf, lp = fcfg.mfcc, fcfg.lpc
    flen, fshift = frame_geometry(fs, mf.win_length_ms, mf.win_shift_ms)
    mel_np = frontend.mel_filterbank(fs, mf.fft_size, mf.n_filters).T
    dct_np = frontend.dct_matrix(mf.n_filters)[1: mf.n_ceps + 1].T
    D, W, A = frontend.packed_frontend_operators(
        flen, mf.fft_size, mf.pre_emph, mel_np,
        lpc_order=lp.n_lpc if fcfg.use_lpc else None,
        preemph_first=mf.preemph_first)
    floor = max(mf.power_floor, 1e-35)
    return flen, fshift, D, W, dct_np, A, floor


def _batch(fcfg, B=6, seconds=(0.7, 1.0), seed=0, padded=8192):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(int(seconds[0] * FS), int(seconds[1] * FS), size=B)
    signals = np.zeros((B, padded), np.float32)
    for i, L in enumerate(lengths):
        signals[i, :L] = (rng.randn(L) * 3000).astype(np.float32)
    mf = fcfg.mfcc
    flen, fshift = frame_geometry(FS, mf.win_length_ms, mf.win_shift_ms)
    n_valid = np.array([n_frames(int(L), flen, fshift) for L in lengths],
                       np.int32)
    return jnp.asarray(signals), jnp.asarray(lengths), jnp.asarray(n_valid)


def _bank(S, K, d, seed=1):
    rng = np.random.RandomState(seed)
    return gmm.GmmParams(
        weights=jnp.asarray(rng.dirichlet(np.ones(K), size=S).astype(np.float32)),
        means=jnp.asarray(rng.randn(S, K, d).astype(np.float32)),
        sigmas=jnp.asarray((0.5 + rng.rand(S, K, d)).astype(np.float32)),
    )


def _reference_scores(signals, lengths, bank, fcfg):
    feature_fn = extract._feature_fn(FS, fcfg, int(signals.shape[-1]),
                                     "float32", "off", "f32")
    feats, mask = feature_fn(signals, lengths)
    return jax.vmap(lambda X, m: gmm.bank_avg_loglik(bank, X, m))(feats, mask)


@pytest.mark.parametrize("S,K", [(4, 32), (3, 8)])
def test_fused_predict_matches_unfused(S, K):
    fcfg = FeatureConfig()
    flen, fshift, D, W, dct_np, A, floor = _operators(fcfg)
    signals, lengths, n_valid = _batch(fcfg)
    bank = _bank(S, K, fcfg.dim)

    want = np.asarray(_reference_scores(signals, lengths, bank, fcfg))
    got = np.asarray(pallas_predict.fused_bank_predict(
        signals, n_valid, bank, fshift, D, W, dct_np, floor, A,
        cmvn=fcfg.mfcc.cmvn, interpret=True))

    assert got.shape == (signals.shape[0], S)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).all()


def test_fused_predict_no_lpc():
    fcfg = FeatureConfig(use_lpc=False)
    flen, fshift, D, W, dct_np, A, floor = _operators(fcfg)
    assert A is None
    signals, lengths, n_valid = _batch(fcfg, B=4)
    bank = _bank(2, 8, fcfg.dim)

    want = np.asarray(_reference_scores(signals, lengths, bank, fcfg))
    got = np.asarray(pallas_predict.fused_bank_predict(
        signals, n_valid, bank, fshift, D, W, dct_np, floor, None,
        cmvn=fcfg.mfcc.cmvn, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_predict_bf16_close():
    """bf16 DFT operands must stay close enough to keep decisions stable on
    well-separated banks (ADVICE round 1: cover the mm_bf16 path)."""
    fcfg = FeatureConfig()
    flen, fshift, D, W, dct_np, A, floor = _operators(fcfg)
    signals, lengths, n_valid = _batch(fcfg, B=4)
    bank = _bank(4, 16, fcfg.dim)

    f32 = np.asarray(pallas_predict.fused_bank_predict(
        signals, n_valid, bank, fshift, D, W, dct_np, floor, A,
        interpret=True))
    b16 = np.asarray(pallas_predict.fused_bank_predict(
        signals, n_valid, bank, fshift, D, W, dct_np, floor, A,
        interpret=True, mm_bf16=True))
    # CMVN'd features absorb most of the spectral perturbation; scores are
    # averages over hundreds of frames.
    np.testing.assert_allclose(b16, f32, rtol=0.15, atol=1.5)


def test_levinson_unrolled_matches_loop():
    # the kernel uses the TRANSPOSED unrolled recursion (order axis on
    # sublanes); compare against the fori_loop implementation
    rng = np.random.RandomState(3)
    frames = rng.randn(64, 256)
    r = np.asarray(levinson.autocorrelation(jnp.asarray(frames), 15))
    want = np.asarray(levinson.lpc_from_autocorr(jnp.asarray(r)))
    got = np.asarray(pallas_predict._levinson_unrolled_T(
        jnp.asarray(r, jnp.float64).T, 15)).T
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    # all-zero frame -> zeroed coefficients, like LPC.py:56
    rz = np.zeros((1, 16))
    gz = np.asarray(pallas_predict._levinson_unrolled_T(
        jnp.asarray(rz).T, 15)).T
    assert (gz == 0).all()


@pytest.mark.parametrize("use_lpc", [True, False])
def test_fused_predict_wide_matches_unfused(use_lpc):
    """Monolith v2 (transposed batched scoring) is numerically exact vs
    the XLA program. It is a MEASURED NEGATIVE RESULT for dispatch (15x
    slower than the two-kernel pipeline on-chip; see the _run_wide
    docstring) but stays correctness-pinned as a reference point."""
    fcfg = FeatureConfig(use_lpc=use_lpc)
    flen, fshift, D, W, dct_np, A, floor = _operators(fcfg)
    signals, lengths, n_valid = _batch(fcfg, B=4)
    bank = _bank(3, 8, fcfg.dim)

    want = np.asarray(_reference_scores(signals, lengths, bank, fcfg))
    got = np.asarray(pallas_predict.fused_bank_predict_wide(
        signals, n_valid, bank, fshift, D, W, dct_np, floor,
        A if use_lpc else None, cmvn=fcfg.mfcc.cmvn, interpret=True,
        utt_tile=2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).all()
