"""Backprop MLP classifier with optional DBN pretraining.

Re-design of the reference's NeuralNet/Neuron/NeuralNetLayer stack
(src/nn/src/include/neural-net.hh:22-120, neural-net.cc): the per-neuron
weight loops become layer matmuls, SGD minibatches advance under lax.scan,
and `from_dbn`/`fit_dbn` seed the hidden layers from a greedily-pretrained
DBN (neural-net.hh:96-108) before supervised fine-tuning.

Output layer is one unit per class with logistic activations and squared
error against one-hot targets — the classic formulation the reference's
backprop implements — classification is the argmax output unit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rbm as rbm_mod

__all__ = ["NeuralNet", "MlpParams"]


class MlpParams(NamedTuple):
    weights: tuple  # per layer: [n_in, n_out]
    biases: tuple   # per layer: [n_out]


def _forward(params: MlpParams, X):
    h = X
    for W, b in zip(params.weights, params.biases):
        h = jax.nn.sigmoid(h @ W + b[None, :])
    return h


def _loss(params, X, Y):
    out = _forward(params, X)
    return 0.5 * jnp.mean(jnp.sum((out - Y) ** 2, axis=-1))


@functools.partial(jax.jit, static_argnames=("n_steps", "batch_size", "lr"))
def _sgd(params: MlpParams, X, Y, key, n_steps: int, batch_size: int,
         lr: float):
    n = X.shape[0]
    grad = jax.grad(_loss)
    starts = (jnp.arange(n_steps) * batch_size) % n

    def step(params, start):
        idx = (start + jnp.arange(batch_size)) % n
        g = grad(params, X[idx], Y[idx])
        return jax.tree.map(lambda p, gi: p - lr * gi, params, g), None

    params, _ = jax.lax.scan(step, params, starts)
    return params


class NeuralNet:
    """add_layer/fit/fit_dbn/predict mirror neural-net.hh's surface."""

    def __init__(self, n_iter: int = 100, learning_rate: float = 0.1,
                 batch_size: int = 32, seed: int = 0):
        self.n_iter = n_iter
        self.learning_rate = learning_rate
        self.batch_size = batch_size
        self.hidden_sizes: list[int] = []
        self.params: MlpParams | None = None
        self.key = jax.random.PRNGKey(seed)
        self.n_classes = 0

    def add_layer(self, size: int):
        self.hidden_sizes.append(size)

    def _init_params(self, n_in: int, n_out: int, init_hidden=None):
        sizes = [n_in] + self.hidden_sizes + [n_out]
        Ws, bs = [], []
        for i in range(len(sizes) - 1):
            self.key, k = jax.random.split(self.key)
            if init_hidden is not None and i < len(init_hidden):
                W, b = init_hidden[i]
            else:
                W = 0.1 * jax.random.normal(k, (sizes[i], sizes[i + 1]))
                b = jnp.zeros(sizes[i + 1])
            Ws.append(jnp.asarray(W, jnp.float32))
            bs.append(jnp.asarray(b, jnp.float32))
        return MlpParams(tuple(Ws), tuple(bs))

    def fit(self, X, y, init_hidden=None):
        X = jnp.asarray(np.asarray(X), jnp.float32)
        y = np.asarray(y, np.int32)
        self.n_classes = int(y.max()) + 1
        Y = jnp.asarray(np.eye(self.n_classes, dtype=np.float32)[y])
        self.params = self._init_params(X.shape[1], self.n_classes, init_hidden)
        steps_per_epoch = max(len(y) // self.batch_size, 1)
        self.key, k = jax.random.split(self.key)
        self.params = _sgd(self.params, X, Y, k,
                           self.n_iter * steps_per_epoch, self.batch_size,
                           self.learning_rate)
        return self

    def fit_dbn(self, X, y, rbm_cfg: rbm_mod.RbmTrainConfig | None = None):
        """Greedy RBM pretraining of the hidden layers, then supervised
        fine-tuning (neural-net.hh:96-108 fit_dbn/from_dbn)."""
        rbm_cfg = rbm_cfg or rbm_mod.RbmTrainConfig(n_epochs=20)
        dbn = rbm_mod.Dbn()
        for s in self.hidden_sizes:
            dbn.add_layer(s)
        self.key, k = jax.random.split(self.key)
        dbn.fit(jnp.asarray(np.asarray(X), jnp.float32), rbm_cfg, k)
        init_hidden = [(p.w, p.hb) for p in dbn.layers]
        return self.fit(X, y, init_hidden=init_hidden)

    def predict_proba(self, X):
        assert self.params is not None
        return np.asarray(_forward(self.params,
                                   jnp.asarray(np.asarray(X), jnp.float32)))

    def predict(self, X):
        return self.predict_proba(X).argmax(axis=-1)
