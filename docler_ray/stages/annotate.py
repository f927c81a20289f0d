"""Annotator tier: deterministic per-document enrichment.

Shape analog of the reference's annotators (AIDocumentAnnotator merges
{topics, keywords, entities} into chunk metadata,
/root/reference/src/docler/annotators/ai_document_annotator.py:37-117); the
LLM calls are out of scope here (SURVEY.md §2.6), so the engine ships a
deterministic TF-based keyword annotator with the same stage shape: a
callable CLASS for ``map_batches`` actor pools — stopword table and token
regex compiled once per actor in ``__init__``, per-batch work in
``__call__``.
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa

# Fixed, tiny multi-language stopword table (must stay in sync with the
# oracle SQL in __ray_entry__.py — both sides filter exactly this set).
STOPWORDS = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "by", "de", "der", "die",
        "das", "el", "en", "es", "et", "for", "from", "in", "is", "it", "la",
        "le", "les", "of", "on", "or", "that", "the", "to", "un", "und",
        "une", "was", "with",
    }
)

_TOKEN_PATTERN = r"[a-z0-9]+"


class KeywordAnnotator:
    """Top-k TF keywords per document, deterministic ties (count desc, token
    asc). Emits one output row per (doc, keyword) with 1-based kw_rank."""

    def __init__(
        self,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        top_k: int = 5,
        min_token_len: int = 3,
    ) -> None:
        self.token_re = re.compile(_TOKEN_PATTERN)
        self.text_col = text_col
        self.id_col = id_col
        self.top_k = top_k
        self.min_token_len = min_token_len

    def keywords(self, text: str) -> list[str]:
        counts = Counter(
            t
            for t in self.token_re.findall(text.lower())
            if len(t) >= self.min_token_len and t not in STOPWORDS
        )
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return [t for t, _ in ranked[: self.top_k]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_kw, out_rank = [], [], []
        for i, text in zip(ids, texts):
            for rank, kw in enumerate(self.keywords(text or ""), start=1):
                out_id.append(i)
                out_kw.append(kw)
                out_rank.append(rank)
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "keyword": pa.array(out_kw, type=pa.string()),
                "kw_rank": pa.array(out_rank, type=pa.int64()),
            }
        )
