"""Directory-walk ingest: the file-tree front door of the pipeline.

Transliterates the reference's directory-conversion contract —
``convert_directory`` / ``DirectoryConverter.convert`` options ``pattern``,
``recursive``, ``exclude``, ``max_depth`` plus the extension-based
supported-MIME filter (/root/reference/src/docler/converters/base.py:343-413,
/root/reference/src/docler/converters/dir_converter.py:60-138) — onto the
pages-table shape this engine streams: ``list_files`` walks a local tree
deterministically, ``files_to_pages`` turns the selection into the
``PAGES_SCHEMA`` Arrow table (url = relative posix path, html = raw bytes)
that the classify → dispatch → extract actor pool already consumes, so a
directory of documents is just another corpus shard.

Scale note: a file tree is inherently a single-listing operation; the walk
itself runs on the driver (like the reference's ``list_files``), but the
payload READ is deferred to ``pages_dataset_from_directory`` which builds a
Ray Dataset over the file list so bytes are read inside tasks, not on the
driver.
"""

from __future__ import annotations

import fnmatch
import os

import pyarrow as pa

from docler_ray.mime_types import mime_from_extension

__all__ = [
    "files_to_pages",
    "list_files",
    "pages_dataset_from_directory",
    "supported_mimes",
]


def _collapse_recursive(pattern: str) -> str:
    """Degrade a recursive glob to its non-recursive shape: every ``**``
    segment disappears — ``**/*`` lists direct children only,
    ``docs/**/*.md`` becomes ``docs/*.md`` (the reference's
    ``recursive=False`` contract: "whether to search subdirectories")."""
    parts = [p for p in pattern.split("/") if p != "**"]
    return "/".join(parts) if parts else "*"


def _glob_match(parts: list[str], pats: list[str]) -> bool:
    """Segment-wise glob match with ``pathlib.Path.glob`` semantics: ``*``
    never crosses ``/``; a ``**`` segment matches zero or more segments."""
    if not pats:
        return not parts
    if pats[0] == "**":
        return any(_glob_match(parts[i:], pats[1:]) for i in range(len(parts) + 1))
    return (
        bool(parts)
        and fnmatch.fnmatch(parts[0], pats[0])
        and _glob_match(parts[1:], pats[1:])
    )


def _excluded(rel_posix: str, name: str, exclude: tuple[str, ...]) -> bool:
    """A file is excluded when any pattern matches its relative path OR its
    basename (so ``exclude=["*.tmp"]`` kills nested temp files and
    ``exclude=["build/**"]`` kills a subtree, matching the reference's
    upathtools-style exclude list)."""
    for pat in exclude:
        if fnmatch.fnmatch(rel_posix, pat) or fnmatch.fnmatch(name, pat):
            return True
    return False


def list_files(
    directory: str,
    *,
    pattern: str = "**/*",
    recursive: bool = True,
    exclude: list[str] | tuple[str, ...] | None = None,
    max_depth: int | None = None,
    include_dirs: bool = False,
    follow_symlinks: bool = False,
) -> list[str]:
    """Deterministic (sorted) relative posix paths under ``directory``.

    Contract per the reference (dir_converter.py:125-138):

    - ``pattern`` — glob matched against the path relative to ``directory``
      (``**`` spans directories; ``*`` stays within one segment, as in
      ``pathlib.Path.glob``).
    - ``recursive=False`` — subdirectories are not searched beyond the
      pattern's explicit segments: ``**`` segments degrade away.
    - ``exclude`` — glob patterns; a match on the relative path or the
      basename drops the file.
    - ``max_depth`` — maximum directory depth for recursive search; direct
      children of ``directory`` are depth 1.
    - directories are dropped unless ``include_dirs`` (the reference always
      passes ``include_dirs=False``).

    Raises ``FileNotFoundError`` if ``directory`` doesn't exist (reference
    base.py:379-381).
    """
    if not os.path.isdir(directory):
        msg = f"Directory not found: {directory}"
        raise FileNotFoundError(msg)
    pat = pattern if recursive else _collapse_recursive(pattern)
    pats = pat.split("/")
    # Deepest file a '**'-free pattern can match — lets the walk prune.
    pat_depth = None if "**" in pats else len(pats)
    excl = tuple(exclude or ())
    base = os.path.abspath(directory)
    out: list[str] = []
    for root, dirs, names in os.walk(base, followlinks=follow_symlinks):
        rel_root = os.path.relpath(root, base)
        root_parts = [] if rel_root == "." else rel_root.replace(os.sep, "/").split("/")
        child_depth = len(root_parts) + 1
        if (max_depth is not None and child_depth >= max_depth) or (
            pat_depth is not None and child_depth >= pat_depth
        ):
            dirs[:] = []  # prune: nothing below here can match
        else:
            dirs.sort()
        candidates = list(names) + (list(dirs) if include_dirs else [])
        for name in sorted(candidates):
            parts = [*root_parts, name]
            if max_depth is not None and len(parts) > max_depth:
                continue
            if not _glob_match(parts, pats):
                continue
            rel = "/".join(parts)
            if _excluded(rel, name, excl):
                continue
            out.append(rel)
    out.sort()
    return out


def supported_mimes() -> frozenset[str]:
    """The MIME types the dispatch layer has an extractor for — the analog
    of the reference's per-converter ``SUPPORTED_MIME_TYPES`` union used to
    filter the directory listing (dir_converter.py:133-138)."""
    from docler_ray.stages.dispatch import DEFAULT_PREFERENCES

    return frozenset(DEFAULT_PREFERENCES)


def files_to_pages(
    directory: str,
    rel_paths: list[str],
    *,
    supported_only: bool = True,
) -> pa.Table:
    """Read a walked file selection into the ``PAGES_SCHEMA`` table the
    extraction pipeline consumes: ``url`` is the relative posix path (the
    reference keys its result dict the same way, base.py:398-400), ``html``
    the raw bytes. ``supported_only`` applies the reference's
    extension-guessed MIME filter before any byte is read."""
    from docler_ray.sources.synth import PAGES_SCHEMA

    keep = rel_paths
    if supported_only:
        allowed = supported_mimes()
        keep = [p for p in rel_paths if mime_from_extension(p) in allowed]
    payloads = []
    for rel in keep:
        with open(os.path.join(directory, rel.replace("/", os.sep)), "rb") as f:
            payloads.append(f.read())
    return pa.table(
        {
            "url": pa.array(keep, pa.string()),
            "warc_ts": pa.array([0] * len(keep), pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([""] * len(keep), pa.string()),
            "lang": pa.array([""] * len(keep), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def pages_dataset_from_directory(
    directory: str,
    *,
    pattern: str = "**/*",
    recursive: bool = True,
    exclude: list[str] | tuple[str, ...] | None = None,
    max_depth: int | None = None,
    supported_only: bool = True,
    files_per_block: int = 64,
):
    """A Ray Dataset of pages from a document tree. The walk (names only)
    happens on the driver exactly once; payload bytes are read inside
    ``map_batches`` tasks, ``files_per_block`` files per input block, so a
    large tree's bytes never materialize on the driver."""
    import ray.data

    rels = list_files(
        directory,
        pattern=pattern,
        recursive=recursive,
        exclude=exclude,
        max_depth=max_depth,
    )
    if supported_only:
        allowed = supported_mimes()
        rels = [p for p in rels if mime_from_extension(p) in allowed]
    base = os.path.abspath(directory)

    def read_block(batch: pa.Table) -> pa.Table:
        return files_to_pages(
            base, batch.column("rel").to_pylist(), supported_only=False
        )

    listing = ray.data.from_arrow(pa.table({"rel": pa.array(rels, pa.string())}))
    if rels:
        listing = listing.repartition(max(1, len(rels) // files_per_block))
    return listing.map_batches(read_block, batch_format="pyarrow", zero_copy_batch=True)
