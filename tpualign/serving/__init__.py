"""Serving: persistent device-resident retrieval daemon (HTTP/JSON)."""

from tpualign.serving.server import RetrievalService, build_service, serve

__all__ = ["RetrievalService", "build_service", "serve"]
