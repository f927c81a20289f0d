"""Directory-walk ingest parity: the reference's convert_directory /
DirectoryConverter options (pattern, recursive, exclude, max_depth, and the
supported-MIME filter; /root/reference/src/docler/converters/base.py:343-413,
dir_converter.py:60-138) over docler_ray.sources.walk."""

from __future__ import annotations

import os

import pytest

from docler_ray.sources.walk import (
    files_to_pages,
    list_files,
    pages_dataset_from_directory,
    supported_mimes,
)


@pytest.fixture
def tree(tmp_path):
    """A small document tree with depth, unsupported files, and noise."""
    spec = {
        "index.html": b"<html><body><p>root page</p></body></html>",
        "readme.md": b"# readme",
        "notes.txt": b"plain notes",
        "junk.tmp": b"x",
        "a/page.html": b"<html><body><p>a page</p></body></html>",
        "a/data.bin": b"\x00\x01",
        "a/b/deep.html": b"<html><body><p>deep</p></body></html>",
        "a/b/deep.md": b"## deep md",
        "build/out.html": b"<html><body><p>built</p></body></html>",
    }
    for rel, payload in spec.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(payload)
    return str(tmp_path)


def test_default_recursive_walk_lists_everything(tree):
    got = list_files(tree)
    assert got == sorted(
        [
            "index.html",
            "readme.md",
            "notes.txt",
            "junk.tmp",
            "a/page.html",
            "a/data.bin",
            "a/b/deep.html",
            "a/b/deep.md",
            "build/out.html",
        ]
    )


def test_missing_directory_raises_file_not_found(tree):
    # reference base.py:379-381 raises FileNotFoundError before walking
    with pytest.raises(FileNotFoundError, match="Directory not found"):
        list_files(os.path.join(tree, "nope"))


def test_pattern_star_does_not_cross_separators(tree):
    # pathlib glob semantics: '*.html' is top-level only, '**/*.html' spans
    assert list_files(tree, pattern="*.html") == ["index.html"]
    assert list_files(tree, pattern="**/*.html") == [
        "a/b/deep.html",
        "a/page.html",
        "build/out.html",
        "index.html",
    ]


def test_non_recursive_collapses_doublestar(tree):
    # reference recursive=False: don't search subdirectories
    assert list_files(tree, pattern="**/*", recursive=False) == sorted(
        ["index.html", "readme.md", "notes.txt", "junk.tmp"]
    )
    # explicit segments still descend: 'a/*.html' names its own depth
    assert list_files(tree, pattern="a/**/*.html", recursive=False) == ["a/page.html"]


def test_exclude_matches_relpath_and_basename(tree):
    got = list_files(tree, pattern="**/*.html", exclude=["build/**"])
    assert got == ["a/b/deep.html", "a/page.html", "index.html"]
    # basename pattern kills nested files too
    assert "junk.tmp" not in list_files(tree, exclude=["*.tmp"])
    assert list_files(tree, pattern="**/*.md", exclude=["deep.md"]) == ["readme.md"]


def test_max_depth_bounds_the_walk(tree):
    assert list_files(tree, pattern="**/*.html", max_depth=1) == ["index.html"]
    assert list_files(tree, pattern="**/*.html", max_depth=2) == [
        "a/page.html",
        "build/out.html",
        "index.html",
    ]
    assert list_files(tree, pattern="**/*.html", max_depth=3) == [
        "a/b/deep.html",
        "a/page.html",
        "build/out.html",
        "index.html",
    ]


def test_supported_mime_filter_matches_dispatch_surface(tree):
    # the reference filters by guessed MIME against SUPPORTED_MIME_TYPES
    # (dir_converter.py:133-138); ours filters against the dispatch table
    mimes = supported_mimes()
    assert "text/html" in mimes and "application/msword" in mimes
    t = files_to_pages(tree, list_files(tree), supported_only=True)
    urls = t.column("url").to_pylist()
    assert "index.html" in urls and "readme.md" in urls
    assert "junk.tmp" not in urls and "a/data.bin" not in urls
    # payload bytes are the raw file, url is the relative posix path
    row = {u: h for u, h in zip(urls, t.column("html").to_pylist())}
    assert row["a/b/deep.html"] == b"<html><body><p>deep</p></body></html>"


def test_pages_dataset_from_directory_streams_and_extracts(tree, ray_session):
    from docler_ray.stages.classify import classify_batch
    from docler_ray.stages.extract import ExtractDocs

    ds = pages_dataset_from_directory(tree, pattern="**/*.html", files_per_block=2)
    docs = ds.map_batches(
        classify_batch, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(ExtractDocs, batch_format="pyarrow", concurrency=1, batch_size=16)
    out = {r["url"]: r["content"] for r in docs.take_all()}
    assert set(out) == {"a/b/deep.html", "a/page.html", "build/out.html", "index.html"}
    assert "deep" in out["a/b/deep.html"]
