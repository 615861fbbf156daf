"""Installation and store diagnostics.

Replaces the reference's utils/ scripts: ``test_installation.py`` (import
smoke test, ref:utils/test_installation.py:10-130), ``check_db_connection.py``
(live-service diagnostic, ref:utils/check_db_connection.py:27-210 — here the
"service" is the on-disk store + the JAX backend), and
``bbox_image_check.py`` (data-quality histogram, ref:utils/bbox_image_check.py:1-26).
Exit code 0 = healthy.
"""

from __future__ import annotations

import importlib
import json
from collections import Counter
from pathlib import Path

from tpualign import SCHEMAS
from tpualign.config import PipelineConfig

REQUIRED = ("jax", "flax", "numpy", "PIL")
OPTIONAL = ("optax", "orbax.checkpoint", "matplotlib", "pyarrow",
            "fitz", "pdfplumber", "spacy", "torch", "transformers")


def check_imports() -> bool:
    ok = True
    for mod in REQUIRED:
        try:
            importlib.import_module(mod)
            print(f"  [ok]      {mod}")
        except ImportError as e:
            print(f"  [MISSING] {mod}: {e}")
            ok = False
    for mod in OPTIONAL:
        try:
            importlib.import_module(mod)
            print(f"  [ok]      {mod} (optional)")
        except ImportError:
            print(f"  [absent]  {mod} (optional)")
    return ok


def check_devices() -> bool:
    try:
        import jax

        devices = jax.devices()
        print(f"  [ok]      backend={jax.default_backend()} devices={len(devices)}")
        for d in devices[:4]:
            print(f"            - {d}")
        return True
    except Exception as e:
        print(f"  [FAIL]    jax devices: {e}")
        return False


def check_directories(config: PipelineConfig) -> bool:
    ok = True
    for name, path in (
        ("input", config.data.input_dir),
        ("output", config.data.output_dir),
        ("images", config.data.images_dir),
        ("store", config.store.root),
    ):
        exists = Path(path).exists()
        print(f"  [{'ok' if exists else 'absent'}]{' ' * 6}{name}: {path}")
    return ok


def check_store(config: PipelineConfig) -> bool:
    from tpualign.store import EmbeddingStore

    store = EmbeddingStore(config.store.root, embed_dim=config.model.embed_dim)
    any_found = False
    for schema in SCHEMAS:
        if store.schema_exists(schema):
            try:
                counts = store.counts(schema)
                print(f"  [ok]      {schema}: {counts}")
                any_found = True
            except Exception as e:
                print(f"  [warn]    {schema}: unreadable ({e})")
        else:
            print(f"  [absent]  {schema}")
    return any_found


def check_bbox_quality(config: PipelineConfig) -> None:
    """Fraction of images with non-zero bbox + bbox_source histogram
    (ref:utils/bbox_image_check.py:8-26)."""
    meta = Path(config.data.output_dir) / "image_metadata.json"
    if not meta.exists():
        print("  [absent]  image_metadata.json (run processing first)")
        return
    images = json.loads(meta.read_text())
    total = len(images)
    valid = sum(
        1 for m in images if m.get("bbox") and any((c or 0) != 0 for c in m["bbox"])
    )
    print(f"  images with valid bbox: {valid}/{total}"
          + (f" ({valid / total:.2%})" if total else ""))
    hist = Counter(m.get("bbox_source", "unknown") for m in images)
    for src, n in sorted(hist.items()):
        print(f"    bbox_source={src}: {n}")


def check_native() -> bool:
    """Native C++ library builds (or rebuilds) and passes its self-test."""
    try:
        from tpualign.native import native_available

        ok = native_available()
        print(f"  {'OK' if ok else '--'} native C++ library "
              f"{'available (self-tested)' if ok else 'unavailable; pure-Python fallbacks active'}")
        return True  # fallbacks make this non-fatal
    except Exception as e:
        print(f"  -- native check failed: {e}")
        return True


def run_checks(config: PipelineConfig) -> int:
    print("tpualign installation check")
    print("=" * 60)
    print("imports:")
    imports_ok = check_imports()
    print("devices:")
    devices_ok = check_devices()
    print("directories:")
    check_directories(config)
    print("native:")
    check_native()
    print("store:")
    check_store(config)
    print("bbox quality:")
    check_bbox_quality(config)
    print("=" * 60)
    healthy = imports_ok and devices_ok
    print("RESULT:", "healthy" if healthy else "PROBLEMS FOUND")
    return 0 if healthy else 1
