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
