"""Lazy g++ build of the native shared library.

No pybind11 in this image, so the library exposes a C ABI consumed via
ctypes (tpualign/native/bindings.py).

Safety properties (round-1 advisor findings):

- The ``.so`` is never committed; it is always built on the machine that
  runs it, so ``-march=native`` can't produce SIGILL from a foreign ISA.
- Rebuilds are gated on a content hash of the source + compile command
  (not mtimes, which tie on checkout), recorded next to the binary.
- A freshly built binary is verified once with a tiny self-test call in a
  SUBPROCESS (a bad binary can die with SIGILL, which is not catchable
  in-process); a ``.verified`` marker caches the result per build hash.
"""

from __future__ import annotations

import hashlib
import subprocess
import sys
from pathlib import Path
from typing import Optional

from tpualign.utils.logging import get_logger

log = get_logger("native.build")

_HERE = Path(__file__).parent
SOURCE = _HERE / "tpualign_native.cpp"
LIB = _HERE / "_libtpualign.so"
STAMP = _HERE / "_libtpualign.so.sha256"

CXX_CMD = [
    "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
]

_SELFTEST = """
import ctypes, numpy as np, sys
lib = ctypes.CDLL(sys.argv[1])
lib.tpua_lexical_counts.argtypes = [
    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32),
]
texts = (ctypes.c_char_p * 2)(b"the oil filter", b"no match here")
terms = (ctypes.c_char_p * 2)(b"filter", b"oil")
out = np.zeros(2, dtype=np.int32)
lib.tpua_lexical_counts(texts, 2, terms, 2,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
assert out.tolist() == [2, 0], out.tolist()
print("selftest-ok")
"""


def _source_hash() -> str:
    h = hashlib.sha256()
    h.update(SOURCE.read_bytes())
    h.update(" ".join(CXX_CMD).encode())
    return h.hexdigest()


def _verified_marker(digest: str) -> Path:
    return _HERE / f"_libtpualign.{digest[:16]}.verified"


def _self_test(digest: str) -> bool:
    """Run the self-test in a subprocess (survives SIGILL); cache per hash."""
    marker = _verified_marker(digest)
    if marker.exists():
        return True
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _SELFTEST, str(LIB)],
            capture_output=True, text=True, timeout=60,
        )
    except Exception as e:  # pragma: no cover - spawn failure
        log.warning("native self-test could not run: %s", e)
        return False
    if proc.returncode != 0 or "selftest-ok" not in proc.stdout:
        log.warning(
            "native self-test failed (rc=%d): %s",
            proc.returncode, (proc.stderr or proc.stdout)[:300],
        )
        return False
    # clear stale markers from previous builds, then stamp this one
    for old in _HERE.glob("_libtpualign.*.verified"):
        try:
            old.unlink()
        except OSError:
            pass
    marker.touch()
    return True


def build(force: bool = False) -> Optional[Path]:
    """Compile (if needed) and verify the native library.

    Returns the library path, or None when g++ is unavailable, compilation
    fails, or the built binary does not pass the self-test.
    """
    digest = _source_hash()
    if (
        not force
        and LIB.exists()
        and STAMP.exists()
        and STAMP.read_text().strip() == digest
    ):
        return LIB if _self_test(digest) else None

    cmd = CXX_CMD + [str(SOURCE), "-o", str(LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except FileNotFoundError:
        log.warning("g++ not found; native acceleration disabled")
        return None
    except subprocess.CalledProcessError as e:
        log.warning("native build failed: %s", e.stderr.decode()[:500])
        return None
    except subprocess.TimeoutExpired:
        log.warning("native build timed out")
        return None
    STAMP.write_text(digest + "\n")
    log.info("Built native library at %s", LIB)
    return LIB if _self_test(digest) else None
