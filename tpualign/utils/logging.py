"""Structured logging honoring LOG_LEVEL.

The reference reads ``LOG_LEVEL`` but never uses it and prints everywhere
(ref:src/pdf_processor.py:58, SURVEY.md §5 observability). Here all modules
log through the standard library with a single configuration point.
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def configure(level: str | None = None) -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    level = level or os.environ.get("LOG_LEVEL", "INFO")
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)-7s %(name)s: %(message)s", "%H:%M:%S")
    )
    root = logging.getLogger("tpualign")
    root.setLevel(getattr(logging, str(level).upper(), logging.INFO))
    root.addHandler(handler)
    root.propagate = False
    _CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    configure()
    if not name.startswith("tpualign"):
        name = f"tpualign.{name}"
    return logging.getLogger(name)
