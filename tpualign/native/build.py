"""Lazy g++ build of the native shared library.

No pybind11 in this image, so the library exposes a C ABI consumed via
ctypes (tpualign/native/bindings.py). Rebuilds only when the source is newer
than the cached .so.
"""

from __future__ import annotations

import subprocess
from pathlib import Path
from typing import Optional

from tpualign.utils.logging import get_logger

log = get_logger("native.build")

_HERE = Path(__file__).parent
SOURCE = _HERE / "tpualign_native.cpp"
LIB = _HERE / "_libtpualign.so"


def build(force: bool = False) -> Optional[Path]:
    """Compile the native library; returns its path or None on failure."""
    if LIB.exists() and not force:
        if LIB.stat().st_mtime >= SOURCE.stat().st_mtime:
            return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(SOURCE), "-o", str(LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        log.info("Built native library at %s", LIB)
        return LIB
    except FileNotFoundError:
        log.warning("g++ not found; native acceleration disabled")
    except subprocess.CalledProcessError as e:
        log.warning("native build failed: %s", e.stderr.decode()[:500])
    except subprocess.TimeoutExpired:
        log.warning("native build timed out")
    return None
