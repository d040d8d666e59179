"""End-to-end JFA workflow: stats -> train v/u -> enroll -> linear scoring
separates speakers under channel variation."""

import numpy as np
import jax
import jax.numpy as jnp

from speaker_recognition_tpu.config import GmmConfig
from speaker_recognition_tpu.models import gmm
from speaker_recognition_tpu.tools import jfa_pipeline


def make_world(K=4, d=6, n_spk=4, seed=0):
    rng = np.random.RandomState(seed)
    ubm_means = rng.randn(K, d) * 2
    ubm_sigmas = 0.6 + 0.2 * rng.rand(K, d)
    ubm = gmm.GmmParams(jnp.asarray(np.full(K, 1.0 / K), jnp.float32),
                        jnp.asarray(ubm_means, jnp.float32),
                        jnp.asarray(ubm_sigmas, jnp.float32))
    spk_offsets = rng.randn(n_spk, d) * 1.2
    chan_dir = rng.randn(d)
    chan_dir /= np.linalg.norm(chan_dir)

    def utterance(spk, chan_strength, n=300, seed=0):
        r = np.random.RandomState(seed)
        comps = r.randint(0, K, n)
        return (ubm_means[comps] + spk_offsets[spk]
                + chan_strength * chan_dir
                + r.randn(n, d) * ubm_sigmas[comps]).astype(np.float32)

    return ubm, utterance


class TestJfaPipeline:
    def test_train_enroll_score(self):
        ubm, utt = make_world()
        n_spk = 4

        # training sessions: every speaker, two channel conditions
        feats, ids = [], []
        s = 0
        for spk in range(n_spk):
            for chan in (-1.0, 1.0):
                for j in range(2):
                    feats.append(utt(spk, chan, seed=100 + s))
                    ids.append(spk)
                    s += 1
        N, F = jfa_pipeline.collect_session_stats(ubm, feats)
        model = jfa_pipeline.train_jfa(ubm, N, F, ids, nv=3, nu=1, n_iter=8)

        # enroll each speaker from fresh sessions
        efeats, eids = [], []
        for spk in range(n_spk):
            efeats.append(utt(spk, 0.5, seed=200 + spk))
            eids.append(spk)
        Ne, Fe = jfa_pipeline.collect_session_stats(ubm, efeats)
        y, z = jfa_pipeline.enroll(model, Ne, Fe, eids, n_spk)

        # test sessions under a different channel
        tfeats, truth = [], []
        for spk in range(n_spk):
            tfeats.append(utt(spk, -0.8, seed=300 + spk))
            truth.append(spk)
        Nt, Ft = jfa_pipeline.collect_session_stats(ubm, tfeats)
        scores = jfa_pipeline.score(model, y, z, Nt, Ft)

        assert scores.shape == (n_spk, n_spk)
        pred = scores.argmax(axis=0)
        acc = (pred == np.asarray(truth)).mean()
        assert acc >= 0.75, (acc, scores)
