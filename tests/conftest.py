"""Shared fixtures. Ray is initialised ONCE per pytest session, lazily —
pure-Python tests never pay the startup cost."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sample_markdown_doc() -> str:
    """Reference fixture transliterated from
    /root/reference/tests/conftest.py:42-66."""
    return """# Introduction

This is an introduction to the document.
It covers several topics.

## First Section

The first section goes into detail about the topic.
More information is provided here.

## Second Section

The second section provides examples and use cases.
Examples help understand the concepts better.

### Subsection

This is a subsection with more specific details.
"""
