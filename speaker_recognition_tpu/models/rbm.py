"""Binary RBM with CD-k, and a DBN (stack of RBMs).

Re-design of src/nn/src/rbm.cc and include/{rbm,dbn}.hh: batched matmul
CD-k instead of the per-sample loops. Reference-mirrored details:
  * hidden stats use the *probabilities* p, not the sampled states
    ("NOTE: here use p for smaller noise", rbm.cc:68-82), while the
    <v h'> products use sampled states
  * plain SGD, no momentum/decay (rbm.cc:100-120)
  * sampling: h ~ Bernoulli(sigmoid(w'v + b)) (rbm.cc:139-150)
  * DBN trains layer by layer; fit_last_layer trains only the top RBM on
    the previous layers' hidden activations (dbn.hh:12-20)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["RbmParams", "RbmTrainConfig", "fit", "transform", "Dbn"]


class RbmParams(NamedTuple):
    vb: jnp.ndarray   # [nv]
    hb: jnp.ndarray   # [nh]
    w: jnp.ndarray    # [nv, nh]


class RbmTrainConfig(NamedTuple):
    learning_rate: float = 0.1
    n_epochs: int = 50
    batch_size: int = 100
    cd_k: int = 1


def _hidden(params, V, key):
    p = jax.nn.sigmoid(V @ params.w + params.hb[None, :])
    h = (jax.random.uniform(key, p.shape, p.dtype) < p).astype(p.dtype)
    return p, h


def _visible(params, H, key):
    p = jax.nn.sigmoid(H @ params.w.T + params.vb[None, :])
    v = (jax.random.uniform(key, p.shape, p.dtype) < p).astype(p.dtype)
    return v


def _cd_batch(params: RbmParams, batch, key, cfg: RbmTrainConfig):
    B = batch.shape[0]
    keys = jax.random.split(key, 2 * cfg.cd_k + 1)
    V = batch
    p0, H = _hidden(params, V, keys[0])
    v0, h0 = jnp.mean(V, 0), jnp.mean(p0, 0)
    w0 = V.T @ H / B
    pk = p0
    for j in range(cfg.cd_k):
        V = _visible(params, H, keys[1 + 2 * j])
        pk, H = _hidden(params, V, keys[2 + 2 * j])
    vk, hk = jnp.mean(V, 0), jnp.mean(pk, 0)
    wk = V.T @ H / B
    lr = cfg.learning_rate
    return RbmParams(params.vb + lr * (v0 - vk),
                     params.hb + lr * (h0 - hk),
                     params.w + lr * (w0 - wk))


@functools.partial(jax.jit, static_argnames=("nh", "cfg"))
def fit(X: jnp.ndarray, nh: int, cfg: RbmTrainConfig, key) -> RbmParams:
    n, nv = X.shape
    key, ik = jax.random.split(key)
    params = RbmParams(
        vb=jnp.zeros((nv,), X.dtype),
        hb=jnp.zeros((nh,), X.dtype),
        w=0.01 * jax.random.normal(ik, (nv, nh), X.dtype),
    )
    batches = max(n // cfg.batch_size, 1)
    n_steps = cfg.n_epochs * batches
    starts = (jnp.arange(n_steps) % batches) * cfg.batch_size
    keys = jax.random.split(key, n_steps)

    def step(params, sk):
        start, k = sk
        idx = (start + jnp.arange(cfg.batch_size)) % n
        return _cd_batch(params, X[idx], k, cfg), None

    params, _ = jax.lax.scan(step, params, (starts, keys))
    return params


def transform(params: RbmParams, X: jnp.ndarray) -> jnp.ndarray:
    """Deterministic hidden activations (layer output for DBN stacking)."""
    return jax.nn.sigmoid(X @ params.w + params.hb[None, :])


class Dbn:
    """Stack of RBMs trained greedily layer by layer (dbn.hh:12-20)."""

    def __init__(self):
        self.layers: list[RbmParams] = []
        self.sizes: list[int] = []

    def add_layer(self, nh: int):
        self.sizes.append(nh)

    def propagate(self, X: jnp.ndarray, upto: int | None = None) -> jnp.ndarray:
        for p in self.layers[:upto]:
            X = transform(p, X)
        return X

    def fit(self, X: jnp.ndarray, cfg: RbmTrainConfig, key):
        """Train every configured layer bottom-up."""
        self.layers = []
        for i, nh in enumerate(self.sizes):
            key, k = jax.random.split(key)
            H = self.propagate(X)
            self.layers.append(fit(H, nh, cfg, k))
        return self

    def fit_last_layer(self, X: jnp.ndarray, cfg: RbmTrainConfig, key):
        """Train only the top RBM on the penultimate representation
        (DBN::fit_last_layer)."""
        H = self.propagate(X, upto=len(self.layers) - 1 if self.layers else 0)
        if self.layers:
            self.layers[-1] = fit(H, self.sizes[len(self.layers) - 1], cfg, key)
        else:
            self.layers.append(fit(H, self.sizes[0], cfg, key))
        return self
