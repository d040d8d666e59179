"""Fully fused predict: signals -> per-speaker scores in ONE Pallas kernel.

The end-to-end predict pipeline (the reference's task_predict hot path,
src/speaker-recognition.py:85-90 -> mix_feature -> GMMSet.predict_one) is,
per utterance tile:

  frame (in-kernel roll) -> packed DFT matmul -> power -> mel/log/DCT
  -> masked CMVN -> Levinson-Durbin LPC (statically unrolled) -> feature
  concat -> GMM bank log-densities (one matmul) -> per-speaker logsumexp
  -> masked per-frame average  ==> scores [S]

Nothing between the raw signal block and the [U, S] score tile ever touches
HBM. The unfused XLA program materializes the spectra (~330 MB round-trip at
the serving batch), the feature tensor, and the [B, T, S*K] joint
log-density tensor (~84 MB) in HBM, and pays ~15 fori_loop state
round-trips for the Levinson recursion — all of which is pure bandwidth
waste on top of a DFT matmul that already runs at ~3/4 of the f32 compute
roofline (experiments/bench_breakdown.py). Fusing removes every intermediate.

Requires the reference's 50%-overlap geometry (frame_len == 2*fshift,
src/feature/MFCC.py:116-118) like pallas_frontend.packed_from_signals; other
geometries use the unfused path.

Parity: same operators, same floors, same CMVN/NaN/underflow semantics as
features/extract.py + models/gmm.py (each rule cited inline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.gmm import GmmParams
from .pallas_frontend import _levinson_unrolled_T

__all__ = ["fused_bank_predict", "bank_score_operators", "UTT_TILE"]

# Utterances per grid step (matches pallas_frontend.UTT_TILE's knee: ~640
# matmul rows per step at the 5 s serving shape).
UTT_TILE = 2

_UNDERFLOW_LOG = -745.0  # models/gmm.py:_UNDERFLOW_LOG (gmm.cc:482-492)
_NEG_HUGE = -1.0e30      # logw substitute for padded bank components


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bank_score_operators(bank: GmmParams, skp: int):
    """Fold a [S, K] GMM bank into one scoring matmul operator.

    logp[t, sk] = [x^2, x] @ AB[:, sk] + c[sk]  with
      A = -1/(2 sigma^2), B = mu/sigma^2,
      c = -1/2 sum mu^2/sigma^2 - sum log(sqrt(2 pi) sigma) + log w
    (models/gmm.py:log_gaussians + log_joint; gmm.cc:78-99). Padded
    components get c = -1e30 so they vanish from every logsumexp.

    Returns (AB [2d, skp], c [1, skp]) as f32 jnp arrays.
    """
    import math

    S, K = bank.weights.shape
    d = bank.means.shape[-1]
    sig = bank.sigmas.reshape(S * K, d).astype(jnp.float32)
    mu = bank.means.reshape(S * K, d).astype(jnp.float32)
    w = bank.weights.reshape(S * K).astype(jnp.float32)
    inv_var = 1.0 / (sig * sig)
    A = (-0.5 * inv_var).T                               # [d, SK]
    B = (mu * inv_var).T                                 # [d, SK]
    c = (-0.5 * jnp.sum(mu * mu * inv_var, axis=-1)
         - jnp.sum(0.5 * math.log(2.0 * math.pi) + jnp.log(sig), axis=-1)
         + jnp.log(w))                                   # [SK]
    AB = jnp.concatenate([A, B], axis=0)                 # [2d, SK]
    pad = skp - S * K
    if pad:
        AB = jnp.pad(AB, ((0, 0), (0, pad)))
        c = jnp.pad(c, (0, pad), constant_values=_NEG_HUGE)
    return AB, c[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("floor", "fshift", "n_lpc", "S", "K", "cmvn",
                     "interpret", "mm_bf16", "utt_tile"))
def _run(signals, n_valid, D_top, D_bot, W, dct_t, A, AB, c,
         floor: float, fshift: int, n_lpc: int, S: int, K: int, cmvn: bool,
         interpret: bool, mm_bf16: bool, utt_tile: int):
    B, Lp = signals.shape
    assert Lp % fshift == 0
    rows = Lp // fshift
    T = rows - 1
    U = utt_tile
    assert B % U == 0 and rows % 8 == 0, (B, U, rows)
    ncols = D_top.shape[1]
    nmel = W.shape[1]
    nceps = dct_t.shape[1]
    nac = A.shape[1]
    skp = AB.shape[1]
    use_lpc = n_lpc > 0
    signals = signals.reshape(B, rows, fshift)

    def kernel(nv_ref, s_ref, dt_ref, db_ref, w_ref, dct_ref, a_ref,
               ab_ref, c_ref, out_ref):
        # --- frontend (pallas_frontend._run_packed_signals semantics) ---
        s = s_ref[:].reshape(U * rows, fshift)
        nxt = pltpu.roll(s, U * rows - 1, 0)     # row f+1 -> f (32-bit roll)
        if mm_bf16:
            s = s.astype(jnp.bfloat16)
            nxt = nxt.astype(jnp.bfloat16)
        X = (jnp.dot(s, dt_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(nxt, db_ref[:], preferred_element_type=jnp.float32))
        Y = X * X
        mel = jnp.dot(Y, w_ref[:], preferred_element_type=jnp.float32)
        logmel = jnp.log(jnp.maximum(mel, floor))       # MFCC.py:66-70 floor
        ceps = jnp.dot(logmel, dct_ref[:],
                       preferred_element_type=jnp.float32)  # [U*rows, nceps]
        if use_lpc:
            r = jnp.dot(Y, a_ref[:], preferred_element_type=jnp.float32)
            # transposed recursion: order axis on sublanes, so each of the
            # ~p^2/2 unrolled ops is a full-lane [1, U*rows] vector op (the
            # lane-sliced form measured ~50x slower in Mosaic — see
            # pallas_frontend._levinson_unrolled_T)
            lpc = _levinson_unrolled_T(r.T, n_lpc).T    # [U*rows, n_lpc]

        # --- per-utterance: mask, CMVN, score ----------------------------
        for u in range(U):
            sl = slice(u * rows, (u + 1) * rows)
            tvalid = nv_ref[pl.program_id(0) * U + u]
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
            m = (t_idx < tvalid).astype(jnp.float32)    # [rows, 1]
            cnt = tvalid.astype(jnp.float32)
            safe = jnp.maximum(cnt, 1.0)
            cu = ceps[sl]
            if cmvn:
                # masked per-utterance mean/sigma norm (MFCC.py:74-77,
                # features/extract.masked_cmvn)
                mu = jnp.sum(cu * m, axis=0, keepdims=True) / safe
                var = jnp.sum((cu - mu) ** 2 * m, axis=0, keepdims=True) / safe
                normed = (cu - mu) / jnp.sqrt(var)
                cu = jnp.where(cnt > 1, normed, cu)
            feat = (jnp.concatenate([cu, lpc[sl]], axis=1)
                    if use_lpc else cu)                 # [rows, d]
            feat = jnp.where(m > 0, feat, 0.0)
            z = jnp.concatenate([feat * feat, feat], axis=1)  # [rows, 2d]
            logp = (jnp.dot(z, ab_ref[:], preferred_element_type=jnp.float32)
                    + c_ref[:])                          # [rows, skp]
            # per-speaker logsumexp over its K components (static lane
            # slices; padded components carry c = -1e30)
            lls = []
            for si in range(S):
                blk = logp[:, si * K:(si + 1) * K]
                mx = jnp.max(blk, axis=1, keepdims=True)
                ll = mx + jnp.log(jnp.sum(jnp.exp(blk - mx), axis=1,
                                          keepdims=True))
                # linear-space underflow floor (gmm.cc:482-492 via
                # models/gmm.py:per_frame_loglik)
                ll = jnp.where(ll > _UNDERFLOW_LOG, ll,
                               jnp.log(jnp.float32(1e-15)))
                lls.append(ll)
            llmat = jnp.concatenate(lls, axis=1)         # [rows, S]
            score = jnp.sum(llmat * m, axis=0, keepdims=True) / safe
            out_ref[0, u, :] = score[0]

    # n_valid rides as a scalar-prefetch arg (full [B] array in SMEM; a
    # rank-1 SMEM *block* of U entries is not a legal Mosaic block shape)
    const = lambda shape: pl.BlockSpec(shape, lambda i, nv: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    mm_dt = jnp.bfloat16 if mm_bf16 else jnp.float32
    flen = 2 * fshift
    d = nceps + (n_lpc if use_lpc else 0)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // U,),
            in_specs=[
                pl.BlockSpec((U, rows, fshift), lambda i, nv: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                const((fshift, ncols)),
                const((fshift, ncols)),
                const((ncols, nmel)),
                const((nmel, nceps)),
                const((ncols, nac)),
                const((2 * d, skp)),
                const((1, skp)),
            ],
            # [n_tiles, U, S] with a (1, U, S) block: the last two block
            # dims equal the array dims, the only tile-legal shape for a
            # tiny [U, S] score tile; reshaped to [B, S] by the caller
            out_specs=pl.BlockSpec((1, U, S), lambda i, nv: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B // U, U, S), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * T * (2 * flen * ncols + 2 * ncols * (nmel + nac)
                           + 2 * nmel * nceps + 2 * (2 * d) * skp),
            bytes_accessed=B * Lp * 4 + B * S * 4,
            transcendentals=B * T * (nmel + skp),
        ),
        interpret=interpret,
    )(n_valid, signals, jnp.asarray(D_top, mm_dt), jnp.asarray(D_bot, mm_dt),
      W, dct_t, A, AB, c).reshape(B, S)


@functools.partial(
    jax.jit,
    static_argnames=("floor", "fshift", "n_lpc", "S", "K", "cmvn",
                     "interpret", "utt_tile"))
def _run_wide(signals, n_valid, D_top, D_bot, W, dct_t, A, ABt, c,
              floor: float, fshift: int, n_lpc: int, S: int, K: int,
              cmvn: bool, interpret: bool, utt_tile: int):
    """Monolith v2: frontend + TRANSPOSED batched scoring in one kernel.

    v1 (_run) scored per utterance with [rows, skp] matmuls and a python
    loop over speakers for the logsumexp (lane slices) — measured ~10x
    slower than the two-kernel pipeline (r2_fused_tpu.jsonl mega_fused
    19-22 ms vs 2.0 ms). v2 keeps the whole grid step batched, exactly
    like the proven wide scoring kernel (pallas_gmm._run_batch_lse):

      feats are transposed in-VMEM to [2d, n] (n = U*rows), scored with
      ONE [skp, 2d] @ [2d, n] matmul, per-speaker logsumexp via the
      leading-dims reshape [s_pad, K, n] -> max/sum over K, and the
      per-utterance masked averages via one [s_pad, n] @ [n, U] matmul
      against an in-kernel mask matrix — no python loop touches a lane.

    CMVN runs in the transposed space with the same two-pass masked
    mean/variance semantics as features/extract.masked_cmvn.

    MEASURED NEGATIVE RESULT (r4, v5e chip, headline 512 x 5 s, 4x32
    bank, median of >=3): v2 = 32.9 ms at utt_tile=4 vs 2.13 ms for the
    production two-kernel dispatch — 15x slower despite the improved
    structure, numerically exact (7.6e-6 vs the XLA program in interpret
    mode, tests/test_pallas_predict.py). Stage attribution: base
    (frontend + in-kernel [n, d] transpose + scoring) 20.9 ms; the
    transposed-space CMVN matmul cluster +12 ms; the LPC path +12 ms
    (non-additive). The costs concentrate in exactly what the two-kernel
    split avoids: Mosaic in-kernel transposes of odd-sublane [n, 13/28]
    tiles and [n, U]-shaped (4-lane) mask/membership matrices, where XLA
    instead performs the layout changes as efficient HBM relayouts
    between the kernels. Kept as a verified reference point for future
    kernel work, NOT dispatched; the production path remains
    pallas_frontend + pallas_gmm per the measured dispatch table."""
    B, Lp = signals.shape
    assert Lp % fshift == 0
    rows = Lp // fshift
    T = rows - 1
    U = utt_tile
    assert B % U == 0 and rows % 8 == 0, (B, U, rows)
    n = U * rows
    ncols = D_top.shape[1]
    nmel = W.shape[1]
    nceps = dct_t.shape[1]
    nac = A.shape[1]
    skp = ABt.shape[0]
    s_pad = skp // K
    use_lpc = n_lpc > 0
    d = nceps + (n_lpc if use_lpc else 0)
    signals = signals.reshape(B, rows, fshift)

    def kernel(nv_ref, s_ref, dt_ref, db_ref, w_ref, dct_ref, a_ref,
               abt_ref, c_ref, out_ref):
        # --- frontend (identical math to _run_packed_signals) -----------
        s = s_ref[:].reshape(n, fshift)
        nxt = pltpu.roll(s, n - 1, 0)
        X = (jnp.dot(s, dt_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(nxt, db_ref[:], preferred_element_type=jnp.float32))
        Y = X * X
        mel = jnp.dot(Y, w_ref[:], preferred_element_type=jnp.float32)
        logmel = jnp.log(jnp.maximum(mel, floor))
        ceps = jnp.dot(logmel, dct_ref[:],
                       preferred_element_type=jnp.float32)   # [n, nceps]

        # --- per-utterance masks as matrices (no python-over-lanes) -----
        # tv[0, u] = valid frame count of utterance u in this step
        tv = jnp.concatenate(
            [nv_ref[pl.program_id(0) * U + u].reshape(1, 1).astype(jnp.float32)
             for u in range(U)], axis=1)                     # [1, U]
        cnt = jnp.maximum(tv, 1.0)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (n, U), 0)
        u_idx = jax.lax.broadcasted_iota(jnp.int32, (n, U), 1)
        same_utt = (t_idx // rows) == u_idx
        within = (t_idx - u_idx * rows).astype(jnp.float32)
        # M_sum[t, u] = 1 iff frame t belongs to utterance u AND is valid
        M_sum = jnp.where(same_utt & (within < tv), 1.0, 0.0)  # [n, U]
        # valid-frame row mask [1, n]: frame t valid within its own utt;
        # tv broadcasts over frames via the pure membership matrix
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        M_mem_T = jnp.where(same_utt, 1.0, 0.0).T            # [U, n]
        tv_row = jnp.dot(tv, M_mem_T,
                         preferred_element_type=jnp.float32)  # [1, n]
        pos_row = (pos - (pos // rows) * rows).astype(jnp.float32)
        m_row = jnp.where(pos_row < tv_row, 1.0, 0.0)        # [1, n]

        cepsT = ceps.T                                       # [nceps, n]
        if cmvn:
            # two-pass masked mean/variance per utterance, transposed:
            # sums over valid frames via M_sum, broadcast back via M_mem_T
            mu = jnp.dot(cepsT, M_sum,
                         preferred_element_type=jnp.float32) / cnt  # [nceps, U]
            mu_b = jnp.dot(mu, M_mem_T,
                           preferred_element_type=jnp.float32)      # [nceps, n]
            dev = (cepsT - mu_b) * m_row
            var = jnp.dot(dev * dev, M_sum,
                          preferred_element_type=jnp.float32) / cnt
            sig_b = jnp.sqrt(jnp.dot(var, M_mem_T,
                                     preferred_element_type=jnp.float32))
            normed = (cepsT - mu_b) / sig_b
            # <=1 valid frame: identity (MFCC.py:74-77 guard)
            keep = jnp.dot(jnp.where(cnt > 1.0, 1.0, 0.0), M_mem_T,
                           preferred_element_type=jnp.float32)      # [1, n]
            cepsT = jnp.where(keep > 0, normed, cepsT)

        if use_lpc:
            r = jnp.dot(Y, a_ref[:], preferred_element_type=jnp.float32)
            lpcT = _levinson_unrolled_T(r.T, n_lpc)          # [n_lpc, n]
            featT = jnp.concatenate([cepsT, lpcT], axis=0)   # [d, n]
        else:
            featT = cepsT
        featT = featT * m_row                                # zero padding
        zT = jnp.concatenate([featT * featT, featT], axis=0)  # [2d, n]

        # --- batched bank scoring (pallas_gmm._run_batch_lse pattern) ---
        logp = (jnp.dot(abt_ref[:], zT,
                        preferred_element_type=jnp.float32)
                + c_ref[:])                                  # [skp, n]
        lp = logp.reshape(s_pad, K, n)
        mx = jnp.max(lp, axis=1, keepdims=True)
        ll = mx[:, 0, :] + jnp.log(jnp.sum(jnp.exp(lp - mx), axis=1))
        ll = jnp.where(ll > _UNDERFLOW_LOG, ll,
                       jnp.log(jnp.float32(1e-15)))          # [s_pad, n]
        sums = jnp.dot(ll * m_row, M_sum,
                       preferred_element_type=jnp.float32)   # [s_pad, U]
        out_ref[0] = (sums / cnt).T                          # [U, s_pad]

    const = lambda shape: pl.BlockSpec(
        shape, lambda i, nv: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // U,),
            in_specs=[
                pl.BlockSpec((U, rows, fshift), lambda i, nv: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                const((fshift, ncols)),
                const((fshift, ncols)),
                const((ncols, nmel)),
                const((nmel, nceps)),
                const((ncols, nac)),
                const((skp, 2 * d)),
                const((skp, 1)),
            ],
            out_specs=pl.BlockSpec((1, U, s_pad), lambda i, nv: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B // U, U, s_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * T * (2 * (2 * fshift) * ncols
                           + 2 * ncols * (nmel + nac)
                           + 2 * nmel * nceps + 2 * (2 * d) * skp),
            bytes_accessed=B * Lp * 4 + B * s_pad * 4,
            transcendentals=B * T * (nmel + skp),
        ),
        interpret=interpret,
    )(n_valid, signals, jnp.asarray(D_top, jnp.float32),
      jnp.asarray(D_bot, jnp.float32), W, dct_t, A, ABt, c).reshape(B, s_pad)


def fused_bank_predict_wide(signals: jnp.ndarray, n_valid: jnp.ndarray,
                            bank: GmmParams, fshift: int, D: np.ndarray,
                            W: np.ndarray, dct_t: np.ndarray, floor: float,
                            A: np.ndarray | None, cmvn: bool = True,
                            interpret: bool = False,
                            utt_tile: int = 4) -> jnp.ndarray:
    """Monolith v2 entry: [B, Lp] signals + [B] valid frame counts + bank
    -> [B, S] scores, one kernel end to end (see _run_wide)."""
    B = signals.shape[0]
    S, K = bank.weights.shape
    n_lpc = (A.shape[1] - 1) if A is not None else 0
    skp = _round_up(S * K, 128)
    s_pad = skp // K if skp % K == 0 else _round_up(skp, K) // K
    skp = s_pad * K
    AB, c = bank_score_operators(bank, skp)
    ABt = AB.T                                              # [skp, 2d]
    b_pad = _round_up(max(B, 1), utt_tile)
    s = signals.astype(jnp.float32)
    nv = n_valid.astype(jnp.int32)
    if b_pad != B:
        s = jnp.pad(s, ((0, b_pad - B), (0, 0)))
        nv = jnp.pad(nv, (0, b_pad - B))
    nmel = W.shape[1]
    nmel_pad = _round_up(nmel, 8)
    W_p = np.zeros((W.shape[0], nmel_pad), np.float32)
    W_p[:, :nmel] = W
    dct_p = np.zeros((nmel_pad, dct_t.shape[1]), np.float32)
    dct_p[:nmel] = dct_t
    if A is None:
        A = np.zeros((D.shape[1], 8), np.float64)
    scores = _run_wide(s, nv, D[:fshift], D[fshift:], jnp.asarray(W_p),
                       jnp.asarray(dct_p), jnp.asarray(A, jnp.float32),
                       ABt, c.reshape(-1, 1), float(floor), int(fshift),
                       int(n_lpc), int(s_pad), int(K), bool(cmvn),
                       bool(interpret), int(utt_tile))
    return scores[:B, :S]


def fused_bank_predict(signals: jnp.ndarray, n_valid: jnp.ndarray,
                       bank: GmmParams, fshift: int, D: np.ndarray,
                       W: np.ndarray, dct_t: np.ndarray, floor: float,
                       A: np.ndarray | None, cmvn: bool = True,
                       interpret: bool = False, mm_bf16: bool = False,
                       utt_tile: int = UTT_TILE) -> jnp.ndarray:
    """[B, Lp] zero-padded signals + [B] valid-frame counts + [S, K] bank
    -> [B, S] per-speaker average log-likelihood scores.

    D/W/dct_t/A are the packed frontend operators
    (ops/frontend.packed_frontend_operators); A=None disables LPC. The
    LPCC variant (n_lpcc > 0) is not fused — callers fall back to the
    unfused path for it.
    """
    B = signals.shape[0]
    S, K = bank.weights.shape
    n_lpc = (A.shape[1] - 1) if A is not None else 0
    skp = _round_up(S * K, 128)
    # pad the bank so skp = S_pad * K with whole dummy speakers, keeping the
    # in-kernel [si*K:(si+1)*K] slices aligned to real speakers
    s_pad = skp // K if skp % K == 0 else _round_up(skp, K) // K
    skp = s_pad * K
    AB, c = bank_score_operators(bank, skp)

    b_pad = _round_up(max(B, 1), utt_tile)
    s = signals.astype(jnp.float32)
    nv = n_valid.astype(jnp.int32)
    if b_pad != B:
        s = jnp.pad(s, ((0, b_pad - B), (0, 0)))
        nv = jnp.pad(nv, (0, b_pad - B))

    nmel = W.shape[1]
    nmel_pad = _round_up(nmel, 8)
    W_p = np.zeros((W.shape[0], nmel_pad), np.float32)
    W_p[:, :nmel] = W
    dct_p = np.zeros((nmel_pad, dct_t.shape[1]), np.float32)
    dct_p[:nmel] = dct_t
    if A is None:
        A = np.zeros((D.shape[1], 8), np.float64)

    scores = _run(s, nv, D[:fshift], D[fshift:], jnp.asarray(W_p),
                  jnp.asarray(dct_p), jnp.asarray(A, jnp.float32),
                  AB, c, float(floor), int(fshift), int(n_lpc),
                  int(s_pad), int(K), bool(cmvn), bool(interpret),
                  bool(mm_bf16), int(utt_tile))
    return scores[:B, :S]
