"""Fused MFCC frontend as a Pallas TPU kernel.

One pass per 128-frame tile: matmul-DFT (re/im), power + floor, mel
projection, log, DCT — with the [tile, 1025] spectra living only in VMEM.
The XLA path (features/extract.py) materializes re/im/power between the
DFT and mel matmuls in HBM (XLA does not fuse across matmuls); this kernel
removes those round-trips (~50 KB/frame of HBM traffic) and keeps the MXU
busy back-to-back.

VMEM budget per grid step (f32, frame_len 256, fft 2048, 50 mel, 13 ceps):
  C/S DFT operators  2 x 256x1025x4B  = 8.4 MB   (resident, constant blocks)
  mel/dct operators  1025x56 + 56x16  ~ 0.3 MB   (resident)
  frame tile + spectra  128x256 + 2x128x1025     ~ 1.2 MB
  ~10 MB total — fits the ~16 MB/core VMEM.

The mel/DCT operators are zero-padded to lane-friendly widths (mel bands
-> multiple of 8, ceps -> unchanged; the padded mel rows are zero so the
extra log(0) columns never reach the output because the DCT rows for them
are also zero — instead we clamp with the same power floor).

Reference semantics preserved exactly as in ops/frontend.py (floor before
log, src/feature/MFCC.py:66-70).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mfcc_from_frames", "packed_from_frames", "packed_from_signals",
           "FRAME_TILE", "UTT_TILE"]

# Frames per grid step. Swept on a v5e chip at the serving workload
# (159k frames): 512 is the knee (0.997 ms vs 1.287 ms at 128 — deep
# enough for MXU pipelining, small enough that the [tile, 2F] X/Y spectra
# stay ~2 MB in VMEM); 1024+ regresses.
FRAME_TILE = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("floor", "interpret"))
def _run(wp, C, S, mel_t, dct_t, acorr_t, floor: float, interpret: bool):
    n, flen = wp.shape
    nbins = C.shape[1]
    nmel = mel_t.shape[1]
    nceps = dct_t.shape[1]
    nac = acorr_t.shape[1]
    n_tiles = n // FRAME_TILE

    def kernel(wp_ref, c_ref, s_ref, mel_ref, dct_ref, ac_ref, out_ref,
               r_ref):
        x = wp_ref[:]
        re = jnp.dot(x, c_ref[:], preferred_element_type=jnp.float32)
        im = jnp.dot(x, s_ref[:], preferred_element_type=jnp.float32)
        power = jnp.maximum(re * re + im * im, floor)
        mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
        # padded mel columns are all-zero -> clamp with the same floor so
        # log stays finite; their DCT weights are zero so they cancel.
        logmel = jnp.log(jnp.maximum(mel, floor))
        out_ref[:] = jnp.dot(logmel, dct_ref[:],
                             preferred_element_type=jnp.float32)
        # Wiener-Khinchin: the LPC autocorrelation is one more tiny matmul
        # against the spectrum already in VMEM (ops/levinson.py:
        # autocorr_operator).
        r_ref[:] = jnp.dot(power, ac_ref[:],
                           preferred_element_type=jnp.float32)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((FRAME_TILE, flen), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((flen, nbins)),
            const((flen, nbins)),
            const((nbins, nmel)),
            const((nmel, nceps)),
            const((nbins, nac)),
        ],
        out_specs=(
            pl.BlockSpec((FRAME_TILE, nceps), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FRAME_TILE, nac), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, nceps), jnp.float32),
            jax.ShapeDtypeStruct((n, nac), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * flen * nbins * 2 + 2 * n * nbins * (nmel + nac)
            + 2 * n * nmel * nceps,
            bytes_accessed=n * (flen + nceps + nac) * 4,
            transcendentals=n * nmel,
        ),
        interpret=interpret,
    )(wp, C, S, mel_t, dct_t, acorr_t)


@functools.partial(jax.jit, static_argnames=("floor", "interpret"))
def _run_packed(frames, D, W, dct_t, A, floor: float, interpret: bool):
    """Fused packed frontend: X = frames@D (one lane-aligned matmul with the
    window/preemph/DFT folded in, ops/frontend.packed_frontend_operators),
    Y = X*X, then mel/log/DCT and the LPC autocorrelation — X and Y never
    leave VMEM (the XLA path re-materializes them in HBM, which becomes the
    bandwidth bound once the packed math drops the FLOP count ~7x).

    When `frames`/`D` arrive as bfloat16 (mm_bf16 measurement variant) the
    dominant [tile,256]x[256,512] matmul runs single-pass on the MXU with
    f32 accumulation; X and everything after stays f32."""
    n, flen = frames.shape
    ncols = D.shape[1]
    nmel = W.shape[1]
    nceps = dct_t.shape[1]
    nac = A.shape[1]
    n_tiles = n // FRAME_TILE

    def kernel(f_ref, d_ref, w_ref, dct_ref, a_ref, out_ref, r_ref):
        X = jnp.dot(f_ref[:], d_ref[:], preferred_element_type=jnp.float32)
        Y = X * X
        mel = jnp.dot(Y, w_ref[:], preferred_element_type=jnp.float32)
        logmel = jnp.log(jnp.maximum(mel, floor))
        out_ref[:] = jnp.dot(logmel, dct_ref[:],
                             preferred_element_type=jnp.float32)
        r_ref[:] = jnp.dot(Y, a_ref[:], preferred_element_type=jnp.float32)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((FRAME_TILE, flen), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((flen, ncols)),
            const((ncols, nmel)),
            const((nmel, nceps)),
            const((ncols, nac)),
        ],
        out_specs=(
            pl.BlockSpec((FRAME_TILE, nceps), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FRAME_TILE, nac), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, nceps), jnp.float32),
            jax.ShapeDtypeStruct((n, nac), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * flen * ncols + 2 * n * ncols * (nmel + nac)
            + 2 * n * nmel * nceps,
            bytes_accessed=n * (flen + nceps + nac) * 4,
            transcendentals=n * nmel,
        ),
        interpret=interpret,
    )(frames, D, W, dct_t, A)


# Max matmul rows per grid step of the signal-level kernel. The r3 sweep
# (experiments/results/r3_utt_tile.jsonl, median of 5 trials) is monotone
# in utterances/step at the 5 s serving shape (320 rows/utt): 1 utt
# 2.116 ms, 2 utts 1.903, 4 utts 1.847, 8 utts 1.826. r3 served the 8-utt
# point (2560 rows), but under the current backend's 16 MB scoped-VMEM
# limit that step allocates 17.21 MB with LPC fused and fails to COMPILE
# (Mosaic stack OOM, caught live by the r4 accuracy run at the 5 s
# serving geometry). 1280 rows (~8.6 MB, 4 utts at 5 s / 6 at 3 s) is
# within budget everywhere and measured only ~1.1% slower at the 5 s
# shape — the difference sits inside the recorded IQR band.
MAX_STEP_ROWS = 1280
# Hard per-UTTERANCE row ceiling. _utt_tile packs fewer utterances per
# grid step as they grow, but a SINGLE utterance above ~52 s still blows
# the scoped-VMEM stack: measured r5, a 150 s utterance (8352 rows)
# allocates 41.13 MB against the 16 MB limit => ~5.0 KB/row, so the
# ceiling is ~3250 rows; 2560 (41 s audio) leaves headroom for backend
# variation. Callers (features/extract, api/fastpath) must route longer
# utterances to the XLA packed path — it is bandwidth-bound but correct
# at any length.
MAX_UTT_ROWS = 2560
# Back-compat/testing override: when set to an int (e.g. by
# experiments/bench_utt_tile.py), forces that many utterances per step.
UTT_TILE: int | None = None


def _utt_tile(rows: int) -> int:
    if UTT_TILE is not None:
        return UTT_TILE
    return max(1, min(8, MAX_STEP_ROWS // max(rows, 1)))


def _levinson_unrolled_T(rT: jnp.ndarray, order: int) -> jnp.ndarray:
    """Levinson-Durbin on TRANSPOSED autocorrelation: [order+1, n] -> LPC
    [order, n].

    Same recursion as ops/levinson.levinson_unrolled, but the order axis
    lives on SUBLANES so every one of the ~p^2/2 unrolled column ops is a
    cheap [1, n] full-lane vector op. The [n, 1] lane-sliced form costs
    ~50x more inside a Mosaic kernel (one mostly-empty vreg per 8 rows),
    and running it outside in XLA on the custom-call's layout-constrained
    output measured 50 ms/batch vs 1.5 ms for the whole frontend kernel
    (experiments r2 bisect) — so the recursion belongs in here, transposed.
    """
    rc = [rT[j:j + 1, :] for j in range(order + 1)]
    e = rc[0]
    a: list = []
    for i in range(1, order + 1):
        acc = rc[i]
        for j in range(1, i):
            acc = acc + a[j - 1] * rc[i - j]
        k = -acc / e
        a = [a[j - 1] + k * a[i - j - 1] for j in range(1, i)] + [k]
        e = e * (1.0 - k * k)
    lpc = jnp.concatenate(a, axis=0)
    return jnp.where(jnp.isfinite(lpc), lpc, 0.0)  # LPC.py:56


@functools.partial(jax.jit,
                   static_argnames=("floor", "fshift", "interpret",
                                    "mm_bf16", "cmvn", "fuse_lpc", "ablate",
                                    "dft_concat"))
def _run_packed_signals(signals, n_valid, D, W, dct_t, A, floor: float,
                        fshift: int, interpret: bool, mm_bf16: bool = False,
                        cmvn: bool = False, fuse_lpc: bool = False,
                        ablate: frozenset = frozenset(),
                        dft_concat: bool = False):
    """Signal-level fused frontend: framing happens IN the kernel.

    For the 50%-overlap geometry (frame_len == 2*fshift, the reference's
    32/16 ms default) frame f of an utterance is the concatenation of
    fshift-sample rows f and f+1 of the signal, so a whole utterance's
    frame matrix is two static slices + one concat of its [rows, fshift]
    reshape — no gather, no HBM frame materialization. Compared to
    packed_from_frames this reads each signal sample once (~84 MB for the
    512x5 s serving batch) instead of writing + re-reading the 2x-larger
    overlapped frame matrix (~330 MB round-trip), which is where the XLA
    path is bandwidth-bound.

    signals: [B, Lp] with Lp % fshift == 0, zero-padded past each
    utterance's true length. Returns ([B, T, nceps] pre-CMVN MFCC,
    [B, T, nac] LPC autocorrelation) with T = Lp//fshift - 1.

    `ablate` is a PROFILING-ONLY hook (experiments/frontend_ablation.py,
    VERDICT r4 item 7): a frozenset of stage names whose work is replaced
    by a cheap placeholder so the stage's cycle share can be measured by
    difference. Tokens: "roll" (reuse the un-rolled rows), "square"
    (Y = X), "log" (identity), "dct" (slice instead of matmul), "mel"
    (skip mel/log/dct; slice X), "acorr" (skip the autocorr matmul and
    Levinson; slice X). NEVER set in production — outputs are wrong.
    """
    B, Lp = signals.shape
    flen = D.shape[0]
    assert flen == 2 * fshift and Lp % fshift == 0, (flen, fshift, Lp)
    rows = Lp // fshift
    T = rows - 1
    U = _utt_tile(Lp // fshift)
    assert B % U == 0, (B, U)
    assert rows % 8 == 0, rows  # sublane-aligned block (LENGTH_BUCKET)
    ncols = D.shape[1]
    nmel = W.shape[1]
    nceps = dct_t.shape[1]
    nac = A.shape[1]
    n_out2 = (nac - 1) if fuse_lpc else nac  # LPC order vs raw acorr width
    # [B, rows, fshift] view: the last two block dims are (rows, 128) —
    # tile-aligned; the reshape is free (row-major relayout is the identity)
    signals = signals.reshape(B, rows, fshift)

    def kernel(nv_ref, s_ref, dt_ref, db_ref, w_ref, dct_ref, a_ref,
               out_ref, r_ref):
        # Frame f = rows f and f+1 side by side, so with the DFT operator
        # split into its first/second-half-of-frame rows,
        #     X[f] = row_f @ D_top + row_{f+1} @ D_bot
        # — no frame matrix is ever built. The f+1 shift is one aligned
        # roll over the whole [U*rows, fshift] block (Mosaic cannot use a
        # sublane-offset slice as a matmul operand); rolled-in rows from
        # the next utterance (and the block wrap) only affect each
        # utterance's last row, dropped by the [:T] output slice.
        s = s_ref[:].reshape(U * rows, fshift)
        if "roll" in ablate:
            nxt = s
        else:
            nxt = pltpu.roll(s, U * rows - 1, 0)  # == roll(-1): row f+1 -> f
        if mm_bf16:
            # Mosaic's rotate only supports 32-bit data, so the roll stays
            # f32 and the cast happens at the matmul operands.
            s = s.astype(jnp.bfloat16)
            nxt = nxt.astype(jnp.bfloat16)
        if dft_concat:
            # Measurement variant (r5, REJECTED for production): one
            # K=2*fshift dot on VMEM-concatenated frame rows instead of
            # two K=fshift dots. A sequential frontend-only measurement
            # suggested -9.6%, but the INTERLEAVED A/B in the full
            # predict program reads 1.548 vs 1.555 ms — inside one IQR
            # (r5_breakdown.jsonl dft_concat_ab row); the sequential gap
            # was session drift. Same X up to summation order (max ceps
            # diff 6.6e-6). Kept as a flag for future re-measurement.
            X = jnp.dot(jnp.concatenate([s, nxt], axis=1),
                        jnp.concatenate([dt_ref[:], db_ref[:]], axis=0),
                        preferred_element_type=jnp.float32)
        else:
            X = (jnp.dot(s, dt_ref[:], preferred_element_type=jnp.float32)
                 + jnp.dot(nxt, db_ref[:], preferred_element_type=jnp.float32))
        Y = X if "square" in ablate else X * X
        if "mel" in ablate:
            ceps = X[:, :nceps]
        else:
            mel = jnp.dot(Y, w_ref[:], preferred_element_type=jnp.float32)
            logmel = (mel if "log" in ablate
                      else jnp.log(jnp.maximum(mel, floor)))
            if "dct" in ablate:
                ceps = logmel[:, :nceps]
            else:
                ceps = jnp.dot(logmel, dct_ref[:],
                               preferred_element_type=jnp.float32)
        if cmvn:
            # per-utterance masked mean/sigma norm fused in (the separate
            # XLA passes cost ~0.4 ms/batch, bench_breakdown); sublane
            # slices of the [U*rows, nceps] matrix are tile-aligned
            parts = []
            for u in range(U):
                cu = ceps[u * rows:(u + 1) * rows]
                tvalid = nv_ref[pl.program_id(0) * U + u]
                t_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
                m = (t_idx < tvalid).astype(jnp.float32)
                cnt = tvalid.astype(jnp.float32)
                safe = jnp.maximum(cnt, 1.0)
                mu = jnp.sum(cu * m, axis=0, keepdims=True) / safe
                var = jnp.sum((cu - mu) ** 2 * m, axis=0,
                              keepdims=True) / safe
                normed = (cu - mu) / jnp.sqrt(var)
                # <=1 valid frame: identity, like MFCC.py:74-77's guard
                parts.append(jnp.where(cnt > 1, normed, cu))
            ceps = jnp.concatenate(parts, axis=0)
        out_ref[:] = ceps.reshape(U, rows, nceps)[:, :T]
        if "acorr" in ablate:
            r_ref[:] = X[:, :n_out2].reshape(U, rows, n_out2)[:, :T]
            return
        racorr = jnp.dot(Y, a_ref[:], preferred_element_type=jnp.float32)
        if fuse_lpc:
            # Levinson-Durbin fused in, on the transposed autocorrelation
            # (order axis on sublanes -> full-lane vector ops)
            lpcT = _levinson_unrolled_T(racorr.T, nac - 1)   # [nac-1, U*rows]
            r_ref[:] = lpcT.T.reshape(U, rows, nac - 1)[:, :T]
        else:
            r_ref[:] = racorr.reshape(U, rows, nac)[:, :T]

    const = lambda shape: pl.BlockSpec(shape, lambda i, nv: (0, 0),
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
            ],
            out_specs=(
                pl.BlockSpec((U, T, nceps), lambda i, nv: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((U, T, n_out2), lambda i, nv: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, nceps), jnp.float32),
            jax.ShapeDtypeStruct((B, T, n_out2), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * T * (2 * flen * ncols + 2 * ncols * (nmel + nac)
                           + 2 * nmel * nceps),
            # signals stay f32 into the kernel even under mm_bf16 (the roll
            # is 32-bit-only); the bf16-when-mm_bf16 D operand is counted at
            # its real width (ADVICE r1: operand-dtype-aware estimate)
            bytes_accessed=B * (Lp + T * (nceps + nac)) * 4
            + 2 * fshift * ncols * (2 if mm_bf16 else 4),
            transcendentals=B * T * nmel,
        ),
        interpret=interpret,
    )(n_valid, signals, D[:fshift], D[fshift:], W, dct_t, A)


def packed_from_signals(signals: jnp.ndarray, fshift: int, D: np.ndarray,
                        W: np.ndarray, dct_t: np.ndarray, floor: float,
                        A: np.ndarray, interpret: bool = False,
                        mm_bf16: bool = False,
                        n_valid: jnp.ndarray | None = None,
                        cmvn: bool = False, fuse_lpc: bool = False,
                        ablate: str = "", dft_concat: bool = False):
    """[B, Lp] zero-padded signals -> ([B, T, nceps] MFCC, [B, T, *] LPC),
    T = Lp//fshift - 1; framing fused into the kernel (requires
    frame_len == 2*fshift). mm_bf16 feeds the DFT matmul bf16 operands
    (f32 accumulation). With cmvn=True (requires n_valid, the per-utterance
    valid frame counts), the per-utterance mean/variance normalization is
    fused in and the returned MFCC is final; otherwise it is pre-CMVN.
    With fuse_lpc=True the second output is the finished [B, T, order] LPC
    (Levinson fused in); otherwise the [B, T, order+1] autocorrelation."""
    B = signals.shape[0]
    assert not cmvn or n_valid is not None
    mm_dt = jnp.bfloat16 if mm_bf16 else jnp.float32
    b_pad = _round_up(max(B, 1), _utt_tile(signals.shape[-1] // fshift))
    # signals stay f32 into the kernel (the in-kernel roll requires 32-bit
    # data); only the matmul operands are cast when mm_bf16.
    s = signals.astype(jnp.float32)
    nv = (n_valid.astype(jnp.int32) if n_valid is not None
          else jnp.zeros((B,), jnp.int32))
    if b_pad != B:
        s = jnp.pad(s, ((0, b_pad - B), (0, 0)))
        nv = jnp.pad(nv, (0, b_pad - B))

    nmel = W.shape[1]
    nmel_pad = _round_up(nmel, 8)
    W_p = np.zeros((W.shape[0], nmel_pad), np.float32)
    W_p[:, :nmel] = W
    dct_p = np.zeros((nmel_pad, dct_t.shape[1]), np.float32)
    dct_p[:nmel] = dct_t
    out, r = _run_packed_signals(s, nv, jnp.asarray(D, mm_dt),
                                 jnp.asarray(W_p), jnp.asarray(dct_p),
                                 jnp.asarray(A, jnp.float32), float(floor),
                                 int(fshift), interpret, bool(mm_bf16),
                                 bool(cmvn), bool(fuse_lpc),
                                 frozenset(x for x in ablate.split(",") if x),
                                 bool(dft_concat))
    return out[:B], r[:B]


def packed_from_frames(frames: jnp.ndarray, D: np.ndarray, W: np.ndarray,
                       dct_t: np.ndarray, floor: float,
                       A: np.ndarray | None = None,
                       interpret: bool = False,
                       mm_bf16: bool = False):
    """[..., T, frame_len] RAW frames -> [..., T, nceps] MFCC (pre-CMVN) and
    (when A is given) the [..., T, order+1] LPC autocorrelation. The packed
    operator D already contains windowing and pre-emphasis. mm_bf16 feeds
    the DFT matmul bf16 operands (f32 accumulation)."""
    orig_shape = frames.shape
    flen = orig_shape[-1]
    mm_dt = jnp.bfloat16 if mm_bf16 else jnp.float32
    f2 = frames.reshape(-1, flen).astype(mm_dt)
    n = f2.shape[0]
    n_pad = _round_up(max(n, 1), FRAME_TILE)
    if n_pad != n:
        f2 = jnp.pad(f2, ((0, n_pad - n), (0, 0)))

    nmel = W.shape[1]
    nmel_pad = _round_up(nmel, 8)
    W_p = np.zeros((W.shape[0], nmel_pad), np.float32)
    W_p[:, :nmel] = W
    dct_p = np.zeros((nmel_pad, dct_t.shape[1]), np.float32)
    dct_p[:nmel] = dct_t
    want_acorr = A is not None
    if not want_acorr:
        A = np.zeros((D.shape[1], 8), np.float64)

    out, r = _run_packed(f2, jnp.asarray(D, mm_dt), jnp.asarray(W_p),
                         jnp.asarray(dct_p), jnp.asarray(A, jnp.float32),
                         float(floor), interpret)
    out = out[:n].reshape(orig_shape[:-1] + (dct_t.shape[1],))
    if not want_acorr:
        return out
    r = r[:n].reshape(orig_shape[:-1] + (A.shape[1],))
    return out, r


def mfcc_from_frames(wp: jnp.ndarray, C: np.ndarray, S: np.ndarray,
                     mel_t: np.ndarray, dct_t: np.ndarray, floor: float,
                     acorr_t: np.ndarray | None = None,
                     interpret: bool = False):
    """[..., T, frame_len] windowed+pre-emphasized frames -> [..., T, nceps]
    MFCC (pre-CMVN), plus (when acorr_t is given) the [..., T, order+1] LPC
    autocorrelation from the same in-VMEM spectrum. Frame tiles are padded
    to FRAME_TILE; mel width is padded to a multiple of 8 lanes with zero
    filters/DCT rows.
    """
    orig_shape = wp.shape
    flen = orig_shape[-1]
    wp2 = wp.reshape(-1, flen).astype(jnp.float32)
    n = wp2.shape[0]
    np_pad = _round_up(max(n, 1), FRAME_TILE)
    if np_pad != n:
        wp2 = jnp.pad(wp2, ((0, np_pad - n), (0, 0)))

    nmel = mel_t.shape[1]
    nmel_pad = _round_up(nmel, 8)
    mel_p = np.zeros((mel_t.shape[0], nmel_pad), np.float32)
    mel_p[:, :nmel] = mel_t
    dct_p = np.zeros((nmel_pad, dct_t.shape[1]), np.float32)
    dct_p[:nmel] = dct_t
    want_acorr = acorr_t is not None
    if not want_acorr:
        acorr_t = np.zeros((C.shape[1], 8), np.float64)

    out, r = _run(wp2, jnp.asarray(C, jnp.float32), jnp.asarray(S, jnp.float32),
                  jnp.asarray(mel_p), jnp.asarray(dct_p),
                  jnp.asarray(acorr_t, jnp.float32), float(floor), interpret)
    out = out[:n].reshape(orig_shape[:-1] + (dct_t.shape[1],))
    if not want_acorr:
        return out
    r = r[:n].reshape(orig_shape[:-1] + (acorr_t.shape[1],))
    return out, r
