"""Fused Pallas bank-scoring kernel vs the XLA reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from speaker_recognition_tpu.models import gmm
from speaker_recognition_tpu.ops import pallas_gmm


def make_bank(S=10, K=32, d=28, seed=0):
    rng = np.random.RandomState(seed)
    w = rng.rand(S, K) + 0.1
    w /= w.sum(axis=1, keepdims=True)
    return gmm.GmmParams(jnp.asarray(w, jnp.float32),
                         jnp.asarray(rng.randn(S, K, d), jnp.float32),
                         jnp.asarray(0.5 + rng.rand(S, K, d), jnp.float32))


class TestPallasBankScores:
    def test_matches_xla_reference(self):
        bank = make_bank()
        rng = np.random.RandomState(1)
        X = jnp.asarray(rng.randn(700, 28), jnp.float32)
        mask = jnp.asarray(np.arange(700) < 650)
        ref = gmm.bank_avg_loglik(bank, X, mask)
        out = pallas_gmm.bank_avg_loglik(bank, X, mask, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_speaker_padding(self):
        # S=3 not a multiple of SPK_BLOCK: padded speakers must not leak
        bank = make_bank(S=3, K=8, d=12, seed=2)
        rng = np.random.RandomState(3)
        X = jnp.asarray(rng.randn(100, 12), jnp.float32)
        mask = jnp.ones(100, dtype=bool)
        ref = gmm.bank_avg_loglik(bank, X, mask)
        out = pallas_gmm.bank_avg_loglik(bank, X, mask, interpret=True)
        assert out.shape == (3,)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_all_masked_frames(self):
        bank = make_bank(S=2, K=8, d=4, seed=4)
        X = jnp.zeros((64, 4), jnp.float32)
        mask = jnp.zeros(64, dtype=bool)
        out = pallas_gmm.bank_sum_loglik(bank, X, mask, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_argmax_decisions_match(self):
        bank = make_bank(S=16, K=16, d=20, seed=5)
        rng = np.random.RandomState(6)
        for i in range(3):
            X = jnp.asarray(
                rng.randn(300, 20) + np.asarray(bank.means[i % 16, 0]),
                jnp.float32)
            mask = jnp.ones(300, dtype=bool)
            ref = int(jnp.argmax(gmm.bank_avg_loglik(bank, X, mask)))
            out = int(jnp.argmax(pallas_gmm.bank_avg_loglik(bank, X, mask,
                                                            interpret=True)))
            assert ref == out
