"""Native (C++) acceleration for host-side hot loops.

Builds lazily with g++ into a shared library loaded via ctypes; every entry
point has a pure-Python fallback, so the package works without a toolchain.
See tpualign/native/build.py and the .cpp sources.
"""

from tpualign.native.bindings import (  # noqa: F401
    lexical_counts,
    make_bpe_core,
    native_available,
    topk_merge,
)
