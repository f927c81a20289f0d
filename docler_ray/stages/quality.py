"""Text-analysis stage: language-ID, quality signals, token counts,
fingerprints — appended as columns in one pass.

Actor-pool ``map_batches`` callable (compiled regexes / stopword tables built
once per actor — the reference's model-loading-constructor pattern,
SURVEY.md §2.4) wrapping the pure functions in
docler_ray.functions.analysis / tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docler_ray.functions.analysis import (
    batch_fingerprints,
    batch_text_stats,
    content_hash,
    detect_language,
    quality_signals,
)
from docler_ray.functions.tokens import count_tokens


class TextAnalyzer:
    """docs/documents batch -> batch + analysis columns.

    Emits: lang_detected, quality_score, stopword_ratio, punct_ratio,
    n_words, n_tokens (BPE-ish), n_ws_tokens, fingerprint, text_hash64.

    Round-4 (verdict finding 4): lang/quality/ws-token stats run through
    the vectorized ``batch_text_stats`` Arrow kernels (bit-identical to
    the per-row functions, equality property-pinned). The remaining
    per-row work is C-speed already: the BPE-ish ``count_tokens`` regex
    (Python-re lookahead — not expressible in RE2), ``content_hash``
    (zlib crc32) and the fused-numpy ``batch_fingerprints``.
    """

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        # touch the lazily-built tables once so per-batch cost is pure compute
        detect_language("warm up the stopword tables")
        quality_signals("warm up")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        stats = batch_text_stats(col)
        texts = [t or "" for t in col.to_pylist()]
        n_tok = [count_tokens(t) for t in texts]
        hashes = [content_hash(t) & 0x7FFFFFFFFFFFFFFF for t in texts]
        fps = (
            np.asarray(batch_fingerprints(texts), dtype=np.uint64)
            & np.uint64(0x7FFFFFFFFFFFFFFF)
        ).astype(np.int64)
        out = batch
        for name, vals, typ in (
            ("lang_detected", stats["lang"], pa.string()),
            ("quality_score", stats["quality_score"], pa.float64()),
            ("stopword_ratio", stats["stopword_ratio"], pa.float64()),
            ("punct_ratio", stats["punct_ratio"], pa.float64()),
            ("n_words", stats["n_words"], pa.int64()),
            ("n_tokens", n_tok, pa.int64()),
            ("n_ws_tokens", stats["n_ws_tokens"], pa.int64()),
            ("fingerprint", fps, pa.int64()),
            ("text_hash64", hashes, pa.int64()),
        ):
            out = out.append_column(name, pa.array(vals, type=typ))
        return out
