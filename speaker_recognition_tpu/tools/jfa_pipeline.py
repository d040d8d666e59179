"""End-to-end JFA workflow on top of the UBM — the equivalent of the
reference's MATLAB driver chain (gen-features-file.py -> sc_compute_suf_stats
-> train_all.m -> sc_score_dot_product).

Stages (each reusing the batched kernels):
  1. collect_session_stats: per-utterance Baum-Welch stats against the UBM
     (models/jfa.collect_stats, one batched program over padded sessions)
  2. train: v (eigenvoices) -> u (eigenchannels, y fixed) -> d (residual),
     the exact sequencing of train_all.m:1-4 with the reference's random
     inits
  3. enroll/score: speaker factors for enrollment stats, channel factors
     for test stats, then linear_scores = one matmul.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import gmm, jfa

__all__ = ["JfaModel", "collect_session_stats", "train_jfa", "enroll", "score"]


class JfaModel(NamedTuple):
    hyper: jfa.JfaHyper
    n_components: int


def collect_session_stats(ubm: gmm.GmmParams, feature_arrays):
    """[per-session [T_i, d] features] -> (N [S, K], F [S, K*d])."""
    K = ubm.weights.shape[-1]
    d = ubm.means.shape[-1]
    T = max(f.shape[0] for f in feature_arrays)
    B = len(feature_arrays)
    X = np.zeros((B, T, d), np.float32)
    mask = np.zeros((B, T), bool)
    for i, f in enumerate(feature_arrays):
        X[i, : f.shape[0]] = f
        mask[i, : f.shape[0]] = True
    ubm_j = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), ubm)
    N, F = jax.jit(jax.vmap(lambda x, m: jfa.collect_stats(ubm_j, x, m)))(
        jnp.asarray(X), jnp.asarray(mask))
    return np.asarray(N), np.asarray(F)


def train_jfa(ubm: gmm.GmmParams, N, F, spk_ids, nv: int = 4, nu: int = 2,
              n_iter: int = 20, train_d: bool = False, seed: int = 0):
    """Train eigenvoices, eigenchannels and (optionally) the residual
    diagonal. Defaults nv=4/nu=2 mirror the shipped scoring config
    (kscore_famous_19.m). Returns a JfaModel."""
    K = int(np.asarray(ubm.weights).shape[-1])
    m = jnp.asarray(np.asarray(ubm.means).reshape(-1), jnp.float32)
    E = jnp.asarray((np.asarray(ubm.sigmas) ** 2).reshape(-1), jnp.float32)
    N = jnp.asarray(N, jnp.float32)
    F = jnp.asarray(F, jnp.float32)
    spk_ids = jnp.asarray(np.asarray(spk_ids, np.int32))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))

    v, y = jfa.train_v(F, N, m, E, nv, spk_ids, K, n_iter=n_iter, key=k1)
    u, x = jfa.train_u(F, N, m, E, v, y, nu, spk_ids, K, n_iter=n_iter, key=k2)
    D = m.shape[-1]
    if train_d:
        d_vec, _ = jfa.train_d(F, N, m, E, v, u, y, x, spk_ids, K,
                               n_iter=n_iter)
    else:
        d_vec = jnp.zeros(D)
    hyper = jfa.JfaHyper(m=m, E=E, v=v, u=u, d=d_vec)
    return JfaModel(hyper=hyper, n_components=K)


def enroll(model: JfaModel, N, F, spk_ids, n_speakers: int):
    """Speaker factors (y, z) for enrollment sessions -> per-model factors."""
    N = jnp.asarray(N, jnp.float32)
    F = jnp.asarray(F, jnp.float32)
    spk_ids = jnp.asarray(np.asarray(spk_ids, np.int32))
    K = model.n_components
    x0 = jnp.zeros((N.shape[0], model.hyper.u.shape[0]))
    z0 = jnp.zeros((n_speakers, model.hyper.D))
    y, _, _ = jfa.estimate_y(F, N, model.hyper, x0, z0, spk_ids, K, n_speakers)
    z, _, _ = jfa.estimate_z(F, N, model.hyper, x0, y, spk_ids, K, n_speakers)
    return y, z


def score(model: JfaModel, y, z, N_test, F_test):
    """[n_models, n_test] channel-compensated linear scores."""
    N_test = jnp.asarray(N_test, jnp.float32)
    F_test = jnp.asarray(F_test, jnp.float32)
    K = model.n_components
    n_test = N_test.shape[0]
    # channel factors of each test session (speaker part unknown -> zeros)
    test_ids = jnp.arange(n_test, dtype=jnp.int32)
    y0 = jnp.zeros((n_test, model.hyper.v.shape[0]))
    z0 = jnp.zeros((n_test, model.hyper.D))
    x, _, _ = jfa.estimate_x(F_test, N_test, model.hyper, y0, z0, test_ids, K)
    return np.asarray(jfa.linear_scores(F_test, N_test, model.hyper, y, z, x, K))
