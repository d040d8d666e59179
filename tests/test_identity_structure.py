"""Low-rank cross-phone identity structure of the UBM-anchored generator
(experiments/make_synth_corpus.make_identity_loadings / make_ubm_speaker).

The r5 JFA result (experiments/results/r5_jfa_channel.jsonl) pinned WHY
linear-scoring JFA could not beat full-rank MAP on the synthetic corpus:
per-phone identity jitter was drawn i.i.d. across phones, so speaker
identity had no low-rank cross-phone correlation for the eigenvoice
space (reference src/jfa/estimate_y_and_v.m) to exploit — unlike real
voices, where vocal anatomy correlates every phone's formants. The
structured draw closes that named realism deficiency. These tests pin
its contract:

  * rank-r draws preserve each phone's MARGINAL perturbation variance
    (so the realism gate and closed-set difficulty keep their meaning),
  * the cross-speaker covariance really is concentrated in a rank-r
    subspace shared via the loading seed,
  * identity=None reproduces the r4/r5 i.i.d. rng draw order bit-for-bit
    (recorded corpus seeds stay valid).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.realpath(__file__))), "experiments"))

from make_synth_corpus import (  # noqa: E402
    make_identity_loadings, make_ubm_speaker)

P = 24  # phones in the shipped inventory (--keep-phones default)
FAKE_PHONES = (np.ones(P) / P, None, None)


def test_loadings_unit_rows_and_deterministic():
    L_a, L_r = make_identity_loadings(P, rank=8, seed=777)
    assert L_a.shape == (P, 8) and L_r.shape == (P, 8)
    np.testing.assert_allclose(np.linalg.norm(L_a, axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(L_r, axis=1), 1.0, atol=1e-12)
    L_a2, L_r2 = make_identity_loadings(P, rank=8, seed=777)
    np.testing.assert_array_equal(L_a, L_a2)
    np.testing.assert_array_equal(L_r, L_r2)
    assert not np.array_equal(L_a, make_identity_loadings(P, 8, seed=778)[0])


def test_structured_draw_preserves_marginal_variance():
    jitter = 0.065
    rho = 0.75
    identity = (*make_identity_loadings(P, rank=8, seed=1), rho)
    rng = np.random.RandomState(0)
    draws = np.stack([
        make_ubm_speaker(rng, FAKE_PHONES, phone_jitter=jitter,
                         identity=identity)["phone_angle"]
        for _ in range(4000)])
    # marginal std of (phone_angle - 1) per phone must stay ~= jitter
    std = draws.std(axis=0)
    np.testing.assert_allclose(std, jitter, rtol=0.12)
    # and the i.i.d. draw has the same marginals (the knob is comparable)
    rng = np.random.RandomState(0)
    iid = np.stack([
        make_ubm_speaker(rng, FAKE_PHONES, phone_jitter=jitter)["phone_angle"]
        for _ in range(4000)])
    np.testing.assert_allclose(iid.std(axis=0), jitter, rtol=0.12)


def test_structured_covariance_is_low_rank():
    rho = 0.75
    rank = 8
    identity = (*make_identity_loadings(P, rank=rank, seed=1), rho)
    rng = np.random.RandomState(0)
    draws = np.stack([
        make_ubm_speaker(rng, FAKE_PHONES, phone_jitter=1.0,
                         identity=identity)["phone_angle"] - 1.0
        for _ in range(8000)])
    cov = np.cov(draws.T)
    ev = np.sort(np.linalg.eigvalsh(cov))[::-1]
    top_r_share = ev[:rank].sum() / ev.sum()
    # expected share: (rho * P + (1-rho) * rank) / P plus the residual's
    # leakage into the top-r directions; assert the structure dominates
    assert top_r_share > rho, top_r_share
    # the i.i.d. draw, by contrast, spreads variance ~uniformly
    rng = np.random.RandomState(0)
    iid = np.stack([
        make_ubm_speaker(rng, FAKE_PHONES, phone_jitter=1.0)["phone_angle"]
        - 1.0 for _ in range(8000)])
    ev_iid = np.sort(np.linalg.eigvalsh(np.cov(iid.T)))[::-1]
    assert ev_iid[:rank].sum() / ev_iid.sum() < 0.55


def test_identity_none_reproduces_frozen_rng_order():
    """The i.i.d. path must keep the exact r4/r5 draw order so recorded
    corpus seeds reproduce: rand(f0), randn(angle), randn(P), randn(P),
    rand(breath), rand(vibrato), randn(P)(phone_w)."""
    seed = 123
    spk = make_ubm_speaker(np.random.RandomState(seed), FAKE_PHONES,
                           speaker_spread=0.03, phone_jitter=0.065)
    r = np.random.RandomState(seed)
    f0 = 95 + r.rand() * 130
    angle = 1.0 + 0.03 * r.randn()
    pa = 1.0 + 0.065 * r.randn(P)
    pr = 1.0 + 0.5 * 0.065 * r.randn(P)
    assert spk["f0"] == f0
    assert spk["angle_scale"] == angle
    np.testing.assert_array_equal(spk["phone_angle"], pa)
    np.testing.assert_array_equal(spk["phone_radius"], pr)
