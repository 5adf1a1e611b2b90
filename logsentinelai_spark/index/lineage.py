"""Per-partition lineage manifests + structured per-stage metrics.

Echoes the reference's observability discipline — every output document
carries `@`-metadata (chunk start/end/elapsed, log_count, token sizes;
reference `src/logsentinelai/core/commons.py:214-237`) — at the job
layer the north_rule requires: each build wave commits a JSON manifest
recording input split, per-(shard, term_bucket) postings count / bytes /
blocks, per-stage elapsed seconds, and status. The manifest is ALSO the
commit protocol: readers only see waves whose manifest says
``complete`` (Iceberg-style manifest-gated visibility), which is what
makes a killed build resumable without cleaning partial parquet output.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any


def manifest_dir(index_dir: str) -> Path:
    return Path(index_dir) / "manifest"


def wave_manifest_path(index_dir: str, wave: int) -> Path:
    return manifest_dir(index_dir) / f"wave_{wave:06d}.json"


def committed_waves(index_dir: str) -> dict[int, dict]:
    """wave -> manifest dict, for every wave whose manifest is complete."""
    out: dict[int, dict] = {}
    d = manifest_dir(index_dir)
    if not d.exists():
        return out
    for p in sorted(d.glob("wave_*.json")):
        try:
            m = json.loads(p.read_text())
        except json.JSONDecodeError:
            continue  # torn write = uncommitted
        if m.get("status") == "complete":
            out[int(m["wave"])] = m
    return out


def commit_wave(index_dir: str, manifest: dict[str, Any]) -> None:
    """Atomic-rename commit of a wave manifest."""
    d = manifest_dir(index_dir)
    d.mkdir(parents=True, exist_ok=True)
    manifest = dict(manifest, status="complete", committed_at=time.time())
    tmp = d / f".wave_{manifest['wave']:06d}.json.tmp"
    tmp.write_text(json.dumps(manifest, indent=1, default=str))
    os.replace(tmp, wave_manifest_path(index_dir, manifest["wave"]))


class StageTimer:
    """Collects per-stage elapsed seconds for the wave manifest
    (the engine's analog of @chunk_analysis_elapsed_time)."""

    def __init__(self) -> None:
        self.stages: dict[str, float] = {}

    def time(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.monotonic()

            def __exit__(self, *exc):
                timer.stages[name] = round(time.monotonic() - self.t0, 3)

        return _Ctx()


def resolve_index_dir(index_dir: str) -> Path:
    """Follow the ``_generation.json`` pointer written by
    compact.compact_index: when present, the CURRENT generation's
    subdirectory is the live index (readers, extends, deletes all
    operate there); otherwise the root is. One level only — a
    generation dir never contains another pointer (compact always
    writes siblings at the root)."""
    root = Path(index_dir)
    p = root / "_generation.json"
    if p.exists():
        try:
            g = json.loads(p.read_text())
        except json.JSONDecodeError:
            return root  # torn pointer write = previous generation (root)
        return root / g["dir"]
    return root
