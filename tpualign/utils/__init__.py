"""Utilities: structured logging, install/store diagnostics, bbox quality checks."""

from tpualign.utils.logging import get_logger  # noqa: F401
