"""Out-of-tree builders for the reference's C++ cores (test-only).

The differential tests drive the ORIGINAL reference implementations; this
module builds them once per machine into /tmp and caches the result. The
reference checkout is read-only — everything compiles out-of-tree.

  ensure_refgmm() -> path to pygmm.so  (src/gmm, its own Makefile)
  ensure_refnn()  -> path to libref_nn.so (src/nn sources + our C shim,
                     tests/ref_nn_shim.cc)

Both return None (tests skip) when the reference tree or toolchain is
unavailable.
"""

from __future__ import annotations

import os
import shutil
import subprocess

REF = "/root/reference"
REFGMM_LIB = "/tmp/refgmm/lib/pygmm.so"
REFNN_LIB = "/tmp/refnn/libref_nn.so"
_HERE = os.path.dirname(os.path.realpath(__file__))


def _have_toolchain() -> bool:
    return shutil.which("g++") is not None and shutil.which("make") is not None


def ensure_refgmm() -> str | None:
    """Build the reference GMM core (lib/pygmm.so) via its own Makefile."""
    if os.path.exists(REFGMM_LIB):
        return REFGMM_LIB
    src = os.path.join(REF, "src", "gmm")
    if not os.path.isdir(src) or not _have_toolchain():
        return None
    try:
        if not os.path.isdir("/tmp/refgmm"):
            shutil.copytree(src, "/tmp/refgmm")
        subprocess.run(["make", "-C", "/tmp/refgmm", "-j4"], check=True,
                       capture_output=True, timeout=600)
    except (subprocess.SubprocessError, OSError):
        return None
    return REFGMM_LIB if os.path.exists(REFGMM_LIB) else None


def ensure_refnn() -> str | None:
    """Build the reference nn core (CRBM/RBM) plus tests/ref_nn_shim.cc."""
    if os.path.exists(REFNN_LIB):
        return REFNN_LIB
    src = os.path.join(REF, "src", "nn", "src")
    if not os.path.isdir(src) or not _have_toolchain():
        return None
    os.makedirs("/tmp/refnn", exist_ok=True)
    cmd = [
        "g++", "-O2", "-std=c++11", "-fPIC", "-shared",
        "-I", os.path.join(src, "include"),
        os.path.join(_HERE, "ref_nn_shim.cc"),
        os.path.join(src, "crbm.cc"),
        os.path.join(src, "rbm.cc"),
        "-o", REFNN_LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    except (subprocess.SubprocessError, OSError):
        return None
    return REFNN_LIB if os.path.exists(REFNN_LIB) else None
