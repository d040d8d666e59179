"""Joint Factor Analysis on UBM sufficient statistics — batched JAX.

Re-design of the reference's MATLAB JFA subsystem (src/jfa/*.m). The model:

    M_session = m + v' y_speaker + d .* z_speaker + u' x_session

over supervectors of dimension D = K*dim (component-major: the first `dim`
entries belong to Gaussian 0, matching collect_suf_stats.m:20-23).

Where the MATLAB loops per speaker/session (estimate_x_and_u.m:96-126),
here every per-session posterior-covariance solve is a vmapped batched
`jnp.linalg.solve` over [n_sessions, nf, nf] (nf = 2..300 factors), the
per-component precision blocks G_c = u_c E_c^-1 u_c' form a [K, nf, nf]
tensor contracted against the count matrix in one einsum, and speaker
grouping is a one-hot matmul. The A/C accumulators are sums over sessions —
associative, exactly as the reference's own comment promises
("collected (possibly in parallel) and summed", estimate_x_and_u.m:70-75) —
so they psum over a 'data' mesh axis when sessions are sharded.

Conventions mirrored from the reference:
  * stats: N [n_sessions, K] soft counts; F [n_sessions, D] uncentered
    first-order stats (collect_suf_stats.m:1-24)
  * x/u update: Fh = F - Nh .* (m + y v + z .* d);
    L = I + sum_c G_c N_c; x = L^-1 u E^-1 Fh;
    A_c = sum_j (L_j^-1 + x_j x_j') N_jc; C = sum_j x_j' Fh_j;
    u_c = A_c^-1 C_c (estimate_x_and_u.m:88-140)
  * y/v update: same with per-speaker summed stats, channel-compensated
    (estimate_y_and_v.m:83-139)
  * z/d update: closed-form diagonal (estimate_z_and_d.m:80-113)
  * linear scoring: scores = M F_norm' with M = (z .* d + y v)/E and
    channel-compensated, count-normalized F (linear_scoring.m:50-71)
  * random init: randn(nf, D) * sum(E) * 0.001 (sc_train_u_from_files.m:31)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import gmm

__all__ = [
    "JfaHyper", "collect_stats", "estimate_x", "estimate_y", "estimate_z",
    "update_u", "update_v", "update_d", "train_u", "train_v", "train_d",
    "linear_scores", "random_init",
]


class JfaHyper(NamedTuple):
    """m/E: [D] mean/variance supervectors; v: [nv, D] eigenvoices;
    u: [nu, D] eigenchannels; d: [D] residual diagonal."""

    m: jnp.ndarray
    E: jnp.ndarray
    v: jnp.ndarray
    u: jnp.ndarray
    d: jnp.ndarray

    @property
    def D(self) -> int:
        return self.m.shape[-1]


def collect_stats(ubm: gmm.GmmParams, X: jnp.ndarray, mask: jnp.ndarray):
    """Baum-Welch stats of one utterance against the UBM:
    (N [K], F [K*dim] supervector). collect_suf_stats.m:1-24; reuses the
    same masked E-step kernel as GMM EM."""
    stats = gmm.sufficient_stats(ubm, X, mask)
    return stats.N_k, stats.F_k.reshape(-1)


def _expand(N: jnp.ndarray, dim: int) -> jnp.ndarray:
    """[..., K] counts -> [..., K*dim] (the index_map trick)."""
    return jnp.repeat(N, dim, axis=-1)


def _precision_blocks(mat: jnp.ndarray, E: jnp.ndarray, K: int) -> jnp.ndarray:
    """G_c = mat_c (1/E_c) mat_c^T per component: [K, nf, nf]
    (the uEuT / vEvT precompute, estimate_x_and_u.m:88-91)."""
    nf, D = mat.shape
    dim = D // K
    mc = mat.reshape(nf, K, dim).transpose(1, 0, 2)        # [K, nf, dim]
    Ec = E.reshape(K, dim)                                  # [K, dim]
    return jnp.einsum("kad,kd,kbd->kab", mc, 1.0 / Ec, mc)


def _session_shift(hyper: JfaHyper, y, z, spk_ids):
    """Speaker part of the model mean per session: m + y v + z .* d."""
    return hyper.m[None, :] + y[spk_ids] @ hyper.v + z[spk_ids] * hyper.d[None, :]


@functools.partial(jax.jit, static_argnames=("n_components",))
def estimate_x(F, N, hyper: JfaHyper, y, z, spk_ids, n_components: int):
    """E-step for channel factors + accumulators for the u M-step.

    Returns (x [n_sessions, nu], A [K, nu, nu], C [nu, D]).
    estimate_x_and_u.m:96-126, all sessions batched.
    """
    K = n_components
    D = F.shape[-1]
    dim = D // K
    nu = hyper.u.shape[0]
    G = _precision_blocks(hyper.u, hyper.E, K)              # [K, nu, nu]

    Nh = _expand(N, dim)                                    # [S, D]
    Fh = F - Nh * _session_shift(hyper, y, z, spk_ids)      # [S, D]

    L = jnp.eye(nu)[None] + jnp.einsum("jc,cab->jab", N, G)  # [S, nu, nu]
    invL = jnp.linalg.inv(L)
    rhs = (Fh / hyper.E[None, :]) @ hyper.u.T               # [S, nu]
    x = jnp.einsum("ja,jab->jb", rhs, invL)

    P = invL + jnp.einsum("ja,jb->jab", x, x)               # [S, nu, nu]
    A = jnp.einsum("jc,jab->cab", N, P)                     # [K, nu, nu]
    C = x.T @ Fh                                            # [nu, D]
    return x, A, C


def update_u(A: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """u_c = A_c^-1 C_c per component (update_u, estimate_x_and_u.m:133-140).
    A/C may be psum'd partial accumulators from session shards."""
    K, nf, _ = A.shape
    D = C.shape[-1]
    dim = D // K
    Cc = C.reshape(nf, K, dim).transpose(1, 0, 2)           # [K, nf, dim]
    sol = jnp.linalg.solve(A, Cc)                           # [K, nf, dim]
    return sol.transpose(1, 0, 2).reshape(nf, D)


update_v = update_u  # identical form (update_v, estimate_y_and_v.m:131-139)


def _speaker_sums(values: jnp.ndarray, spk_ids: jnp.ndarray, n_speakers: int):
    """Segment-sum sessions by speaker via one-hot matmul: [n_spk, ...]."""
    onehot = (spk_ids[:, None] == jnp.arange(n_speakers)[None, :]).astype(values.dtype)
    return jnp.einsum("js,j...->s...", onehot, values)


@functools.partial(jax.jit, static_argnames=("n_components", "n_speakers"))
def estimate_y(F, N, hyper: JfaHyper, x, z, spk_ids, n_components: int,
               n_speakers: int):
    """E-step for speaker factors y + accumulators for the v M-step.

    estimate_y_and_v.m:83-129: per-speaker summed, channel-compensated stats.
    Returns (y [n_spk, nv], A [K, nv, nv], C [nv, D]).
    """
    K = n_components
    D = F.shape[-1]
    dim = D // K
    nv = hyper.v.shape[0]
    G = _precision_blocks(hyper.v, hyper.E, K)

    Nh = _expand(N, dim)
    # channel shift per session, then group by speaker
    chan = (x @ hyper.u) * Nh                               # [S, D]
    Fs = _speaker_sums(F - chan, spk_ids, n_speakers)       # [spk, D]
    Nss = _speaker_sums(N, spk_ids, n_speakers)             # [spk, K]
    Nsd = _expand(Nss, dim)
    Fs = Fs - (hyper.m[None, :] + z * hyper.d[None, :]) * Nsd

    L = jnp.eye(nv)[None] + jnp.einsum("sc,cab->sab", Nss, G)
    invL = jnp.linalg.inv(L)
    rhs = (Fs / hyper.E[None, :]) @ hyper.v.T
    y = jnp.einsum("sa,sab->sb", rhs, invL)

    P = invL + jnp.einsum("sa,sb->sab", y, y)
    A = jnp.einsum("sc,sab->cab", Nss, P)
    C = y.T @ Fs
    return y, A, C


@functools.partial(jax.jit, static_argnames=("n_components", "n_speakers"))
def estimate_z(F, N, hyper: JfaHyper, x, y, spk_ids, n_components: int,
               n_speakers: int):
    """E-step for residual factors z + scalar accumulators (a, b) for d.

    estimate_z_and_d.m:80-106. Returns (z [n_spk, D], a [D], b [D]).
    """
    K = n_components
    D = F.shape[-1]
    dim = D // K
    Nh = _expand(N, dim)
    chan = (x @ hyper.u) * Nh
    Fs = _speaker_sums(F - chan, spk_ids, n_speakers)
    Ns = _speaker_sums(Nh, spk_ids, n_speakers)
    Fs = Fs - (hyper.m[None, :] + y @ hyper.v) * Ns

    L = 1.0 + Ns / hyper.E[None, :] * (hyper.d[None, :] ** 2)
    z = Fs / hyper.E[None, :] * hyper.d[None, :] / L
    a = jnp.sum((1.0 / L + z * z) * Ns, axis=0)
    b = jnp.sum(z * Fs, axis=0)
    return z, a, b


def update_d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """d = b ./ a (estimate_z_and_d.m:108-113)."""
    return b / a


def random_init(key, nf: int, E: jnp.ndarray) -> jnp.ndarray:
    """randn(nf, D) * sum(E) * 0.001 (sc_train_u_from_files.m:31,
    sc_train_v_from_files.m:37)."""
    return jax.random.normal(key, (nf, E.shape[-1])) * jnp.sum(E) * 1e-3


def train_v(F, N, m, E, nv: int, spk_ids, n_components: int, n_iter: int = 20,
            key=None):
    """Eigenvoice training (sc_train_v_from_files.m): iterate y/v with
    u = 0, d = 0."""
    key = key if key is not None else jax.random.PRNGKey(0)
    n_speakers = int(np.asarray(spk_ids).max()) + 1
    D = F.shape[-1]
    hyper = JfaHyper(m=m, E=E, v=random_init(key, nv, E),
                     u=jnp.zeros((1, D)), d=jnp.zeros(D))
    x = jnp.zeros((F.shape[0], 1))
    z = jnp.zeros((n_speakers, D))
    y = None
    for _ in range(n_iter):
        y, A, C = estimate_y(F, N, hyper, x, z, spk_ids, n_components, n_speakers)
        hyper = hyper._replace(v=update_v(A, C))
    return hyper.v, y


def train_u(F, N, m, E, v, y, nu: int, spk_ids, n_components: int,
            n_iter: int = 20, key=None):
    """Eigenchannel training (sc_train_u_from_files.m): y fixed, iterate x/u."""
    key = key if key is not None else jax.random.PRNGKey(1)
    n_speakers = int(np.asarray(spk_ids).max()) + 1
    D = F.shape[-1]
    hyper = JfaHyper(m=m, E=E, v=v, u=random_init(key, nu, E), d=jnp.zeros(D))
    z = jnp.zeros((n_speakers, D))
    x = None
    for _ in range(n_iter):
        x, A, C = estimate_x(F, N, hyper, y, z, spk_ids, n_components)
        hyper = hyper._replace(u=update_u(A, C))
    return hyper.u, x


def train_d(F, N, m, E, v, u, y, x, spk_ids, n_components: int,
            n_iter: int = 20):
    """Residual-diagonal training (sc_train_d_from_files.m): iterate z/d."""
    n_speakers = int(np.asarray(spk_ids).max()) + 1
    D = F.shape[-1]
    hyper = JfaHyper(m=m, E=E, v=v, u=u, d=jnp.ones(D))
    z = None
    for _ in range(n_iter):
        z, a, b = estimate_z(F, N, hyper, x, y, spk_ids, n_components, n_speakers)
        hyper = hyper._replace(d=update_d(a, b))
    return hyper.d, z


@functools.partial(jax.jit, static_argnames=("n_components",))
def linear_scores(F, N, hyper: JfaHyper, y, z, x, n_components: int):
    """Fast linear scoring: one matmul of model offsets against normalized,
    channel-compensated first-order stats (linear_scoring.m:50-71).

    F/N: test-utterance stats [n_test, D]/[n_test, K]; y/z: enrolled-model
    factors [n_models, ...]; x: test-session channel factors [n_test, nu].
    Returns scores [n_models, n_test].
    """
    K = n_components
    D = F.shape[-1]
    dim = D // K
    M = (z * hyper.d[None, :] + y @ hyper.v) / hyper.E[None, :]
    chan = (hyper.m[None, :] + x @ hyper.u) * _expand(N, dim)
    Fc = (F - chan) / jnp.sum(N, axis=-1, keepdims=True)
    return M @ Fc.T
