"""Signal framing as a static gather — jit/vmap friendly.

Replaces the reference's per-frame Python slicing loop
(src/feature/MFCC.py:57-63, src/feature/LPC.py:49-53) with one gather that
XLA lowers to a strided load; downstream everything is batched matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import frontend


def frame_signal(signal: jnp.ndarray, frame_len: int, frame_shift: int) -> jnp.ndarray:
    """[..., L] -> [..., T, frame_len] with T = (L-frame_len)//frame_shift + 1.

    Frame f covers samples [f*shift, f*shift+frame_len), matching
    src/feature/MFCC.py:57-60. L must be >= frame_len (static check).
    """
    L = signal.shape[-1]
    T = (L - frame_len) // frame_shift + 1
    assert T >= 1, f"signal too short to frame: {L} < {frame_len}"
    idx = np.arange(T)[:, None] * frame_shift + np.arange(frame_len)[None, :]
    return signal[..., idx]


def window_preemph(frames: jnp.ndarray, frame_len: int, pre_emph: float,
                   preemph_first: bool = False) -> jnp.ndarray:
    """Window then pre-emphasize a batch of frames.

    Order matters for parity: the reference windows first, then pre-emphasizes
    the *windowed* frame (src/feature/MFCC.py:61-64). The numpy in-place
    `frame[1:] -= frame[:-1]*c` evaluates its RHS on the original values, so
    this is a non-recursive first difference.

    `preemph_first=True` is the bob.ap.Ceps order (the extractor the
    reference prefers when bob imports, src/feature/__init__.py:11-13):
    pre-emphasize the raw frame (first sample scaled by 1-a), then window.
    """
    w = jnp.asarray(frontend.hamming(frame_len), dtype=frames.dtype)
    if preemph_first:
        pf = jnp.concatenate(
            [frames[..., :1] * (1.0 - pre_emph),
             frames[..., 1:] - pre_emph * frames[..., :-1]], axis=-1)
        return pf * w
    wf = frames * w
    return jnp.concatenate([wf[..., :1], wf[..., 1:] - pre_emph * wf[..., :-1]], axis=-1)


def frame_validity_mask(lengths: jnp.ndarray, n_frames: int,
                        frame_len: int, frame_shift: int) -> jnp.ndarray:
    """[...] lengths -> [..., n_frames] bool; frame f is valid iff the whole
    window lies inside the unpadded signal."""
    ends = np.arange(n_frames) * frame_shift + frame_len
    return lengths[..., None] >= jnp.asarray(ends)
