"""Content fingerprints for dataset fixtures (benchmark-row provenance).

Round 3 shipped a BENCHMARK_TABLE whose LOL rows were measured on a
fixture that had since been regenerated with a planted signal — the merge
had no way to tell (VERDICT r3 "what's weak" #2).  Every benchmark row now
carries ``<dataset>@<md5-8>`` of the exact h5 bytes it was measured on, and
the table merger refuses rows whose hash mismatches the committed fixture.

Hashing the 2.6 GB LOL h5 costs ~5 s, so digests are cached in
``datasets/.fixture_hashes.json`` keyed by (size, mtime) — a regenerated
fixture changes both.
"""

from __future__ import annotations

import hashlib
import json
import os

_CACHE_NAME = ".fixture_hashes.json"


def _md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            h.update(chunk)
    return h.hexdigest()


def file_hash8(path: str) -> str:
    """First 8 hex chars of the file's md5, cached by (size, mtime)."""
    path = os.path.abspath(path)
    st = os.stat(path)
    key = f"{path}|{st.st_size}|{int(st.st_mtime)}"
    cache_path = os.path.join(os.path.dirname(path), _CACHE_NAME)
    cache = {}
    try:
        with open(cache_path) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        pass
    if key in cache:
        return cache[key]
    digest = _md5_file(path)[:8]
    cache[key] = digest
    try:
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=0)
    except OSError:
        pass
    return digest


def fixture_tag(dataset_path, dataset_name: str | None = None) -> str:
    """``<name>@<hash8>`` provenance tag for one dataset h5 (or a list of
    them, for augmented splits that bind several files)."""
    paths = dataset_path if isinstance(dataset_path, list) else [dataset_path]
    tags = []
    for p in paths:
        name = dataset_name or os.path.basename(p).replace(
            "summarizer_dataset_", "").replace("_google_pool5.h5", "")
        try:
            tags.append(f"{name}@{file_hash8(p)}")
        except OSError:
            tags.append(f"{name}@missing")
    return "+".join(tags)
