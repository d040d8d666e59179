"""Diagnose the compiled-TPU extractor drift vs the f64 oracle (VERDICT r3
item 1): attribute the corr 0.9984 failure to a stage.

Runs the same two utterances as tests_tpu/test_extract_batch_compiled_vs_
f64_oracle through:
  A. production path   (pallas on,  fused CMVN+Levinson, default precision)
  B. XLA packed path   (pallas off, default precision)
  C. XLA packed path   (pallas off, highest precision)
  D. pallas, CMVN/Levinson NOT fused (packed_from_frames route forced off
     by requesting n_lpcc? no — instead call packed_from_signals directly
     with cmvn=False, fuse_lpc=False and do CMVN/Levinson in XLA)
and prints per-family (MFCC cols 0-13 / LPC 13-28) median, p99, max |err|
and corr vs the f64 oracle, plus A-vs-B and D-vs-B to separate kernel
error from precision error.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.realpath(__file__))), "tests"))

import numpy as np
import jax
import jax.numpy as jnp

from oracles import oracle_mfcc, oracle_lpc
from speaker_recognition_tpu.config import FeatureConfig, frame_geometry, n_frames
from speaker_recognition_tpu.features import extract
from speaker_recognition_tpu.ops import pallas_frontend, frontend, levinson

FS = 8000


def _speech(seconds, seed, freqs=(200, 600, 1500)):
    rng = np.random.RandomState(seed)
    n = int(FS * seconds)
    t = np.arange(n) / FS
    sig = sum(np.sin(2 * np.pi * f * t + rng.rand() * 6) / (i + 1)
              for i, f in enumerate(freqs))
    sig *= 0.6 + 0.4 * np.sin(2 * np.pi * 2.1 * t) ** 2
    return ((sig + 0.05 * rng.randn(n)) * 8000).astype(np.float32)


def _padded_batch(sigs):
    L = max(len(s) for s in sigs)
    L = -(-L // extract.LENGTH_BUCKET) * extract.LENGTH_BUCKET
    batch = np.zeros((len(sigs), L), np.float32)
    lengths = np.zeros(len(sigs), np.int32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
        lengths[i] = len(s)
    return jnp.asarray(batch), jnp.asarray(lengths)


def stats(name, got, want):
    err = np.abs(got - want)
    fams = {"mfcc": err[:, :13], "lpc": err[:, 13:]}
    out = [name]
    for fam, e in fams.items():
        c = np.corrcoef(got[:, :13].ravel() if fam == "mfcc"
                        else got[:, 13:].ravel(),
                        want[:, :13].ravel() if fam == "mfcc"
                        else want[:, 13:].ravel())[0, 1]
        out.append(f"{fam}: med {np.median(e):.2e} p99 "
                   f"{np.percentile(e, 99):.2e} max {e.max():.2e} "
                   f"corr {c:.6f}")
    allcorr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    out.append(f"all-corr {allcorr:.6f}")
    print(" | ".join(out))
    return allcorr


def main():
    sigs = [_speech(1.1, 0), _speech(0.8, 1, freqs=(150, 900))]
    batch, lengths = _padded_batch(sigs)
    fcfg = FeatureConfig()
    flen, fshift = frame_geometry(FS, 32, 16)
    oracles = [np.concatenate([
        oracle_mfcc(FS, s.astype(np.float64)),
        oracle_lpc(FS, s.astype(np.float64)),
    ], axis=1) for s in sigs]

    paths = {}
    # A: production (pallas on, fused)
    fA = extract._feature_fn(FS, fcfg, int(batch.shape[-1]), "float32",
                             "on", "f32", "packed", "default")
    paths["A_pallas_fused"] = np.asarray(fA(batch, lengths)[0])
    # B: XLA packed default
    fB = extract._feature_fn(FS, fcfg, int(batch.shape[-1]), "float32",
                             "off", "f32", "packed", "default")
    paths["B_xla_default"] = np.asarray(fB(batch, lengths)[0])
    # C: XLA packed highest
    fC = extract._feature_fn(FS, fcfg, int(batch.shape[-1]), "float32",
                             "off", "f32", "packed", "highest")
    paths["C_xla_highest"] = np.asarray(fC(batch, lengths)[0])

    # D: pallas kernel WITHOUT fused CMVN/Levinson; epilogue in XLA
    mf, lp = fcfg.mfcc, fcfg.lpc
    T = n_frames(int(batch.shape[-1]), flen, fshift)
    mel_np = frontend.mel_filterbank(FS, mf.fft_size, mf.n_filters).T
    dct_np = frontend.dct_matrix(mf.n_filters)[1: mf.n_ceps + 1].T
    D_np, W_np, A_np = frontend.packed_frontend_operators(
        flen, mf.fft_size, mf.pre_emph, mel_np, lpc_order=lp.n_lpc,
        preemph_first=mf.preemph_first)
    floor = max(mf.power_floor, 1e-35)
    n_valid = jnp.minimum(jnp.where(lengths >= flen,
                                    (lengths - flen) // fshift + 1, 0), T)
    ceps, r = pallas_frontend.packed_from_signals(
        batch, fshift, D_np, W_np, dct_np, floor, A_np,
        n_valid=n_valid, cmvn=False, fuse_lpc=False)
    from speaker_recognition_tpu.ops.framing import frame_validity_mask
    mask = frame_validity_mask(lengths, T, flen, fshift)
    ceps = extract.masked_cmvn(ceps, mask)
    lpc = levinson.lpc_from_autocorr(r)
    paths["D_pallas_unfused_epilogue"] = np.asarray(
        jnp.where(mask[..., None],
                  jnp.concatenate([ceps, lpc], axis=-1), 0.0))

    # E: pallas fused CMVN but NOT fused Levinson
    ceps2, r2 = pallas_frontend.packed_from_signals(
        batch, fshift, D_np, W_np, dct_np, floor, A_np,
        n_valid=n_valid, cmvn=True, fuse_lpc=False)
    lpc2 = levinson.lpc_from_autocorr(r2)
    paths["E_pallas_cmvnfused"] = np.asarray(
        jnp.where(mask[..., None],
                  jnp.concatenate([ceps2, lpc2], axis=-1), 0.0))

    for i, s in enumerate(sigs):
        Ti = n_frames(len(s), flen, fshift)
        print(f"== utterance {i} (T={Ti}) vs f64 oracle ==")
        for name, got in paths.items():
            stats(name, got[i, :Ti], oracles[i])
        print("-- cross-path (kernel vs XLA, same precision class) --")
        stats("A_vs_B", paths["A_pallas_fused"][i, :Ti],
              paths["B_xla_default"][i, :Ti])
        stats("D_vs_B", paths["D_pallas_unfused_epilogue"][i, :Ti],
              paths["B_xla_default"][i, :Ti])
        stats("E_vs_B", paths["E_pallas_cmvnfused"][i, :Ti],
              paths["B_xla_default"][i, :Ti])
        stats("B_vs_C", paths["B_xla_default"][i, :Ti],
              paths["C_xla_highest"][i, :Ti])
        # per-column worst offenders on the production path
        err = np.abs(paths["A_pallas_fused"][i, :Ti] - oracles[i])
        worst = np.argsort(err.max(0))[::-1][:6]
        print("worst columns (A):",
              [(int(c), float(err[:, c].max())) for c in worst])


if __name__ == "__main__":
    main()
