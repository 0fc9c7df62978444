"""Self-contained build of the native rANS extension.

Compiles ``csrc/rans_coder.cpp`` into a shared library next to this package
on first import (or when the source is newer than the cached binary). Uses a
plain ``g++`` invocation — the C ABI needs no Python headers, so no
setuptools/pybind11 machinery is required and the binary is interpreter
independent.
"""

import os
import subprocess
import tempfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_PKG_DIR, "csrc", "rans_coder.cpp")
_LIB = os.path.join(_PKG_DIR, "_librans.so")


def build_library(force: bool = False) -> str:
    """Compile (if needed) and return the path to the shared library."""
    if (
        not force
        and os.path.exists(_LIB)
        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB

    cxx = os.environ.get("CXX", "g++")
    debug = os.environ.get("STF_TPU_DEBUG_BUILD")
    opt = ["-O0", "-g"] if debug else ["-O3", "-DNDEBUG"]
    # Build to a temp file then rename: keeps concurrent importers safe.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_PKG_DIR)
    os.close(fd)
    cmd = [
        cxx,
        "-std=c++17",
        "-shared",
        "-fPIC",
        *opt,
        "-o",
        tmp,
        _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        os.unlink(tmp)
        raise RuntimeError(
            f"Failed to build native rANS coder:\n{e.stderr}"
        ) from e
    os.replace(tmp, _LIB)
    return _LIB
