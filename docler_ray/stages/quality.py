"""Text-analysis stage: language-ID, quality signals, token counts,
fingerprints — appended as columns in one pass.

Actor-pool ``map_batches`` callable (compiled regexes / stopword tables built
once per actor — the reference's model-loading-constructor pattern,
SURVEY.md §2.4) wrapping the pure functions in
docler_ray.functions.analysis / tokens.
"""

from __future__ import annotations

import pyarrow as pa

from docler_ray.functions.analysis import (
    batch_fingerprints,
    content_hash,
    detect_language,
    quality_signals,
)
from docler_ray.functions.tokens import count_tokens, count_whitespace_tokens


class TextAnalyzer:
    """docs/documents batch -> batch + analysis columns.

    Emits: lang_detected, quality_score, stopword_ratio, punct_ratio,
    n_words, n_tokens (BPE-ish), n_ws_tokens, fingerprint, text_hash64.
    """

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        # touch the lazily-built tables once so per-batch cost is pure compute
        detect_language("warm up the stopword tables")
        quality_signals("warm up")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        langs, scores, stop_r, punct_r, n_words = [], [], [], [], []
        n_tok, n_ws, hashes = [], [], []
        for t in texts:
            langs.append(detect_language(t))
            q = quality_signals(t)
            scores.append(q["quality_score"])
            stop_r.append(q["stopword_ratio"])
            punct_r.append(q["punct_ratio"])
            n_words.append(int(q["n_words"]))
            n_tok.append(count_tokens(t))
            n_ws.append(count_whitespace_tokens(t))
            hashes.append(content_hash(t))
        # one fused numpy pass for the whole batch (bit-identical to the
        # per-doc fingerprint(); ~2x the scalar loop on short web docs)
        fps = [int(f) for f in batch_fingerprints(texts)]
        out = batch
        for name, vals, typ in (
            ("lang_detected", langs, pa.string()),
            ("quality_score", scores, pa.float64()),
            ("stopword_ratio", stop_r, pa.float64()),
            ("punct_ratio", punct_r, pa.float64()),
            ("n_words", n_words, pa.int64()),
            ("n_tokens", n_tok, pa.int64()),
            ("n_ws_tokens", n_ws, pa.int64()),
            ("fingerprint", [f & 0x7FFFFFFFFFFFFFFF for f in fps], pa.int64()),
            ("text_hash64", [h & 0x7FFFFFFFFFFFFFFF for h in hashes], pa.int64()),
        ):
            out = out.append_column(name, pa.array(vals, type=typ))
        return out
