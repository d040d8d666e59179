"""Fused Pallas MFCC kernel vs the XLA matmul path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speaker_recognition_tpu.config import FeatureConfig, MfccConfig
from speaker_recognition_tpu.features import extract
from speaker_recognition_tpu.ops import frontend, pallas_frontend


def windowed_frames(n_frames=200, flen=256, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n_frames, flen) * 1000).astype(np.float32)


class TestPallasMfcc:
    def test_matches_xla_path(self):
        wp = windowed_frames()
        C, S = frontend.dft_power_projection(256, 2048)
        mel_t = frontend.mel_filterbank(8000, 2048, 50).T
        dct_t = frontend.dct_matrix(50)[1:14].T
        floor = 1e-35

        out = pallas_frontend.mfcc_from_frames(
            jnp.asarray(wp), C, S, mel_t, dct_t, floor, interpret=True)

        ref = np.log(np.maximum(
            (wp.astype(np.float64) @ C) ** 2 + (wp.astype(np.float64) @ S) ** 2,
            floor) @ mel_t) @ dct_t
        assert out.shape == (200, 13)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-3)

    def test_batch_shape_and_padding(self):
        wp = windowed_frames(n_frames=130)  # not a multiple of FRAME_TILE
        C, S = frontend.dft_power_projection(256, 2048)
        mel_t = frontend.mel_filterbank(8000, 2048, 50).T
        dct_t = frontend.dct_matrix(50)[1:14].T
        wp3 = jnp.asarray(np.stack([wp, wp * 0.5]))  # [2, 130, 256]
        out = pallas_frontend.mfcc_from_frames(wp3, C, S, mel_t, dct_t, 1e-35,
                                               interpret=True)
        assert out.shape == (2, 130, 13)

    def test_end_to_end_extractor_pallas_flag(self, monkeypatch):
        """SRTPU_PALLAS=interpret routes the full extractor through the
        fused kernel; results must match the XLA path closely."""
        rng = np.random.RandomState(1)
        sig = (rng.randn(8000 * 2) * 3000).astype(np.int16)
        cfg = FeatureConfig()

        extract._feature_fn.cache_clear()
        monkeypatch.setenv("SRTPU_PALLAS", "off")
        ref = extract.mix_feature(8000, sig, cfg, dtype="float32")

        extract._feature_fn.cache_clear()
        monkeypatch.setenv("SRTPU_PALLAS", "interpret")
        out = extract.mix_feature(8000, sig, cfg, dtype="float32")

        extract._feature_fn.cache_clear()
        monkeypatch.setenv("SRTPU_PALLAS", "off")

        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=5e-3)


class TestPackedFromSignals:
    """Signal-level kernel: framing fused in (50%-overlap row-concat)."""

    def test_matches_full_extractor(self):
        rng = np.random.RandomState(2)
        B, L = 3, 12288
        signals = (rng.randn(B, L) * 2000).astype(np.float32)
        signals[1, 9000:] = 0.0
        lengths = np.array([L, 9000, L], np.int32)
        cfg = FeatureConfig()
        ref_fn = extract._feature_fn(8000, cfg, L, "float32", "off", "f32",
                                     "packed")
        pal_fn = extract._feature_fn(8000, cfg, L, "float32", "interpret",
                                     "f32", "packed")
        fr, mr = ref_fn(jnp.asarray(signals), jnp.asarray(lengths))
        fp, mp = pal_fn(jnp.asarray(signals), jnp.asarray(lengths))
        np.testing.assert_array_equal(np.asarray(mr), np.asarray(mp))
        np.testing.assert_allclose(np.asarray(fp), np.asarray(fr),
                                   rtol=2e-3, atol=2e-2)

    def test_odd_batch_is_padded(self):
        # B=1 < UTT_TILE exercises the batch padding path
        rng = np.random.RandomState(3)
        L = 8192
        from speaker_recognition_tpu.config import MfccConfig as _M
        mf = _M()
        mel_t = frontend.mel_filterbank(8000, mf.fft_size, mf.n_filters).T
        dct_t = frontend.dct_matrix(mf.n_filters)[1:14].T
        D, W, A = frontend.packed_frontend_operators(
            256, mf.fft_size, mf.pre_emph, mel_t, lpc_order=15)
        sig = jnp.asarray((rng.randn(1, L) * 500).astype(np.float32))
        ceps, r = pallas_frontend.packed_from_signals(
            sig, 128, D, W, dct_t, 1e-35, A, interpret=True)
        assert ceps.shape == (1, L // 128 - 1, 13)
        assert r.shape == (1, L // 128 - 1, 16)
        # against the frame-level kernel on explicitly gathered frames
        from speaker_recognition_tpu.ops.framing import frame_signal
        frames = frame_signal(sig, 256, 128)
        ceps2, r2 = pallas_frontend.packed_from_frames(
            frames, D, W, dct_t, 1e-35, A=A, interpret=True)
        # the signal kernel accumulates the DFT as D_top/D_bot partial
        # matmuls — a different f32 summation order than the one-matmul
        # frame kernel, hence relative (not exact) agreement
        np.testing.assert_allclose(np.asarray(ceps), np.asarray(ceps2),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r2),
                                   rtol=5e-4, atol=1e-2)
        # and both against the float64 reference (ADVICE r1: an absolute
        # f64 anchor keeps the bound tight despite the f32 order effects) —
        # r is O(1e4) here so 1e-2 absolute is ~1e-6 relative
        X64 = np.asarray(frames, np.float64) @ D
        r64 = (X64 * X64) @ A
        np.testing.assert_allclose(np.asarray(r), r64, rtol=2e-4,
                                   atol=2e-4 * np.abs(r64).max())


def test_packed_from_signals_fused_lpc_and_cmvn():
    """fuse_lpc=True + cmvn=True: the kernel's outputs equal the unfused
    composition (autocorr -> Levinson outside; masked CMVN outside)."""
    rng = np.random.RandomState(11)
    from speaker_recognition_tpu.config import MfccConfig as _M
    from speaker_recognition_tpu.features.extract import masked_cmvn
    from speaker_recognition_tpu.ops import levinson as lev
    from speaker_recognition_tpu.ops.framing import frame_validity_mask

    mf = _M()
    mel_t = frontend.mel_filterbank(8000, mf.fft_size, mf.n_filters).T
    dct_t = frontend.dct_matrix(mf.n_filters)[1:14].T
    D, W, A = frontend.packed_frontend_operators(
        256, mf.fft_size, mf.pre_emph, mel_t, lpc_order=15)
    B, L = 3, 8192
    sig = np.zeros((B, L), np.float32)
    lengths = np.array([7000, 8192, 2000], np.int32)
    for i, n in enumerate(lengths):
        sig[i, :n] = (rng.randn(n) * 500).astype(np.float32)
    sigj = jnp.asarray(sig)
    T = L // 128 - 1
    n_valid = jnp.minimum(jnp.where(lengths >= 256,
                                    (lengths - 256) // 128 + 1, 0), T)

    ceps_u, r = pallas_frontend.packed_from_signals(
        sigj, 128, D, W, dct_t, 1e-35, A, interpret=True)
    mask = frame_validity_mask(jnp.asarray(lengths), T, 256, 128)
    want_ceps = np.asarray(masked_cmvn(ceps_u, mask))
    want_lpc = np.asarray(lev.lpc_from_autocorr(r))

    ceps_f, lpc_f = pallas_frontend.packed_from_signals(
        sigj, 128, D, W, dct_t, 1e-35, A, interpret=True,
        n_valid=n_valid, cmvn=True, fuse_lpc=True)
    assert lpc_f.shape == (B, T, 15)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(ceps_f)[m], want_ceps[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lpc_f)[m], want_lpc[m],
                               rtol=2e-4, atol=2e-4)
