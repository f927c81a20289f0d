"""Per-partition checkpoint manifests: lineage + metrics + resume filter.

The scalable replacement for the reference's driver-memory ``Conversion``
progress state (/root/reference/src/docler/converters/dir_converter.py:22-45,
140-166), per the north rule: "resumable from checkpoint with per-partition
lineage + metrics".

Design (SURVEY.md §4.2/§7.4): the resumable unit is the INPUT SHARD (one
input parquet file). Shard identity is derived from the input path at read
time — deterministic across runs, unlike Ray's dynamic block ids. A shard's
manifest row records lineage (input file, row range, extractor version) and
metrics (docs, errors, pages, bytes, secs). Manifest rows are written
atomically (tmp + rename) AFTER the shard's output is durably on disk, so a
manifest entry <=> that shard's output is complete; on restart, completed
shards are filtered out of the input list before the Dataset is built.
"""

from __future__ import annotations

import json
import os
import time
import zlib


def shard_id_for_path(path: str) -> str:
    """Deterministic shard identity for an input file.

    basename alone collides when two input directories carry same-named
    shards (the resume filter would silently skip one and both would write
    into the same hive partition), so the id folds in a crc32 of the
    REAL path (``os.path.realpath``: symlinks and relative spellings of the
    same file resolve to one id, so a resume launched from a different cwd
    or through a symlinked mount skips completed shards instead of
    re-running them — round-2 ADVICE). Resume still requires the inputs to
    live at the same resolved filesystem path across runs; a corpus moved
    wholesale gets fresh ids and reruns in full. Everything that names a
    shard — the classify stage's lineage column, the resume filter,
    incomplete-output cleanup, manifest rows — derives the id through this
    one function.
    """
    ap = os.path.realpath(path)
    return f"{os.path.basename(path)}-{zlib.crc32(ap.encode('utf-8')) & 0xFFFFFFFF:08x}"


class ManifestStore:
    """A directory of one JSON manifest per completed input shard."""

    def __init__(self, manifest_dir: str) -> None:
        self.manifest_dir = manifest_dir
        os.makedirs(manifest_dir, exist_ok=True)

    def _path(self, shard_id: str) -> str:
        safe = shard_id.replace("/", "__")
        return os.path.join(self.manifest_dir, f"{safe}.manifest.json")

    def completed_shards(self) -> set[str]:
        done: set[str] = set()
        for name in os.listdir(self.manifest_dir):
            if not name.endswith(".manifest.json"):
                continue
            try:
                with open(os.path.join(self.manifest_dir, name)) as f:
                    entry = json.load(f)
                done.add(entry["shard_id"])
            except (OSError, json.JSONDecodeError, KeyError):
                continue  # torn write -> shard not complete, will be redone
        return done

    def record(self, entry: dict) -> None:
        """Atomically persist a completed-shard manifest row."""
        entry = dict(entry)
        entry.setdefault("recorded_at", time.time())
        path = self._path(entry["shard_id"])
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f, sort_keys=True)
        os.replace(tmp, path)

    def entries(self) -> list[dict]:
        out: list[dict] = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if not name.endswith(".manifest.json"):
                continue
            try:
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
            except (OSError, json.JSONDecodeError):
                continue
        return out

    def totals(self) -> dict:
        """Aggregate metrics across completed shards (docs/errors/pages/secs)."""
        tot = {"shards": 0, "docs": 0, "errors": 0, "pages": 0, "bytes_in": 0, "secs": 0.0}
        for e in self.entries():
            tot["shards"] += 1
            for k in ("docs", "errors", "pages", "bytes_in"):
                tot[k] += int(e.get(k, 0))
            tot["secs"] += float(e.get("secs", 0.0))
        return tot


def filter_pending(input_files: list[str], store: ManifestStore) -> list[str]:
    """Input files whose shard has no manifest entry yet (resume filter)."""
    done = store.completed_shards()
    return [p for p in input_files if shard_id_for_path(p) not in done]
