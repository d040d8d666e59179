"""Load the reference's OWN feature extractors (src/feature/{MFCC,LPC}.py)
as importable py3 modules, for differential testing.

The round-1 golden tests compared against hand-transcribed oracles
(tests/oracles.py) — a transcription error would live in both sides. Here
the reference's actual Python 2 source is executed (with a minimal,
semantics-preserving py2->py3 shim) so the comparison is against the code
that produced the published numbers.

Shim rules (each a py2-ism, nothing else is touched):
  * ``xrange`` -> ``range``
  * the two int-division sites that py3 would turn into floats:
    the frame-count formula and the rfft slice bound (MFCC.py:57,66;
    LPC.py:47)
  * ``from utils import ...`` / ``from MFCC import hamming`` are satisfied
    from the reference's own utils.py (also shimmed) via a private module
    registry — not from anything in this repo
  * LPC.py imports scikits.talkbox's C ``levinson_lpc`` (not installable
    here); the loader injects a float64 numpy stand-in implementing the
    documented talkbox contract (biased autocorrelation + Levinson-Durbin,
    returning (a, e, k)); the reference's own framing/window/pre-emphasis/
    NaN-zeroing loop runs unmodified.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF_FEATURE_DIR = "/root/reference/src/feature"


def _shim_source(src: str) -> str:
    src = src.replace("xrange", "range")
    # numpy 2.x exports `min` from the star import (1.x, which the reference
    # ran on, did not); restore the builtin the reference's melfb code used
    src = src.replace("import numpy.linalg as linalg",
                      "import numpy.linalg as linalg\nfrom builtins import min")
    src = src.replace(
        "frames = (len(signal) - self.FRAME_LEN) / self.FRAME_SHIFT + 1",
        "frames = (len(signal) - self.FRAME_LEN) // self.FRAME_SHIFT + 1")
    src = src.replace("[:self.FFT_SIZE / 2 + 1]",
                      "[:self.FFT_SIZE // 2 + 1]")
    # py2 print statements only occur in __main__ blocks, which exec() would
    # choke on; drop everything from a main guard onward.
    main = src.find('if __name__ == "__main__"')
    if main != -1:
        src = src[:main]
    return src


def _exec_module(name: str, path: str, extra_globals: dict) -> types.ModuleType:
    with open(path) as f:
        src = _shim_source(f.read())
    mod = types.ModuleType(name)
    mod.__dict__.update(extra_globals)
    mod.__file__ = path
    code = compile(src, path, "exec")
    exec(code, mod.__dict__)
    return mod


class _TalkboxLevinson:
    """float64 numpy stand-in for scikits.talkbox.linpred.levinson_lpc."""

    @staticmethod
    def lpc(signal, order):
        """talkbox contract: biased autocorrelation r[0..order] of the 1-D
        signal, then Levinson-Durbin; returns (a [order+1], e, k)."""
        signal = np.asarray(signal, np.float64)
        n = len(signal)
        r = np.array([np.dot(signal[: n - j], signal[j:]) for j in
                      range(order + 1)]) / n
        a = np.zeros(order + 1)
        a[0] = 1.0
        e = r[0]
        k = np.zeros(order)
        for i in range(1, order + 1):
            acc = r[i]
            for j in range(1, i):
                acc += a[j] * r[i - j]
            k_i = -acc / e
            k[i - 1] = k_i
            new_a = a.copy()
            for j in range(1, i):
                new_a[j] = a[j] + k_i * a[i - j]
            new_a[i] = k_i
            a = new_a
            e *= 1.0 - k_i * k_i
        return a, e, k


def load_reference_feature_modules():
    """Return (mfcc_module, lpc_module) executing the reference's code.

    Raises FileNotFoundError when the reference checkout is absent (tests
    skip on that).
    """
    utils_path = os.path.join(REF_FEATURE_DIR, "utils.py")
    mfcc_path = os.path.join(REF_FEATURE_DIR, "MFCC.py")
    lpc_path = os.path.join(REF_FEATURE_DIR, "LPC.py")
    for p in (utils_path, mfcc_path, lpc_path):
        if not os.path.exists(p):
            raise FileNotFoundError(p)

    ref_utils = _exec_module("_ref_feature_utils", utils_path, {})

    # MFCC.py: `from utils import cached_func, diff_feature`
    saved = {}
    for name, mod in [("utils", ref_utils)]:
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        mfcc = _exec_module("_ref_feature_mfcc", mfcc_path, {})
        sys.modules["MFCC"] = mfcc
        saved["MFCC"] = None
        # LPC.py: `from scikits.talkbox.linpred import levinson_lpc`
        scikits = types.ModuleType("scikits")
        talkbox = types.ModuleType("scikits.talkbox")
        linpred = types.ModuleType("scikits.talkbox.linpred")
        linpred.levinson_lpc = _TalkboxLevinson()
        talkbox.linpred = linpred
        scikits.talkbox = talkbox
        for name, mod in [("scikits", scikits),
                          ("scikits.talkbox", talkbox),
                          ("scikits.talkbox.linpred", linpred)]:
            saved.setdefault(name, sys.modules.get(name))
            sys.modules[name] = mod
        lpc = _exec_module("_ref_feature_lpc", lpc_path, {})
    finally:
        for name, orig in saved.items():
            if orig is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = orig
    return mfcc, lpc
