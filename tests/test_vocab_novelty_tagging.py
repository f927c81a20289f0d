"""Round-3b operators: BPE pair counting, n-gram novelty, rule tagging —
each pinned equivalent to its DuckDB replay on adversarial corpora."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from docler_ray.stages.tagging import rule_profile, rule_tagger, tag_batch
from docler_ray.stages.vocab import pair_counts_batch, top_symbol_pairs

EDGE_TEXTS = [
    "",
    " ",
    "ab",
    "a",
    "AB aB Ab",  # lowercasing: all count as 'ab'
    "ab-ab_ab.ab",  # punctuation breaks runs, pairs stay within runs
    "abc abc abc",  # 'ab' x3, 'bc' x3
    "x" * 10,  # 'xx' x9 (overlapping adjacent pairs)
    "héllo naïve",  # non-ASCII letters break byte runs
    "123 ab12cd",  # digits break runs
    "ZYX wvu",
    "newline\nab\nab",
]


def _pairs_ref(texts: list[str]) -> dict[str, int]:
    """Pure-Python reference: adjacent pairs within [a-z]+ runs."""
    import re

    counts: dict[str, int] = {}
    for t in texts:
        for w in re.findall(r"[a-z]+", (t or "").lower()):
            for i in range(len(w) - 1):
                p = w[i : i + 2]
                counts[p] = counts.get(p, 0) + 1
    return counts


def test_pair_counts_batch_matches_reference():
    got = pair_counts_batch(EDGE_TEXTS)
    want = _pairs_ref(EDGE_TEXTS)
    nz = {chr(p >> 8) + chr(p & 0xFF): int(got[p]) for p in np.nonzero(got)[0]}
    assert nz == want


def test_pair_counts_no_cross_document_pairs():
    # doc boundary must break pairs: "..a" + "b.." contributes no 'ab'
    got = pair_counts_batch(["za", "bz"])
    nz = {chr(p >> 8) + chr(p & 0xFF): int(got[p]) for p in np.nonzero(got)[0]}
    assert nz == {"za": 1, "bz": 1}


def test_top_symbol_pairs_vs_duckdb(ray_session):
    import ray.data

    texts = EDGE_TEXTS + ["the quick brown fox", "pack my box", "ab" * 50]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = (
        top_symbol_pairs(
            ray.data.from_pandas(df).repartition(3), text_col="text", k=10
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        "WITH words AS (SELECT unnest(regexp_extract_all(lower("
        "coalesce(text, '')), '[a-z]+')) AS w FROM documents), "
        "p AS (SELECT substring(w, i, 2) AS pair FROM words, "
        "UNNEST(range(1, length(w))) AS t(i)), "
        "c AS (SELECT pair, COUNT(*) AS n FROM p GROUP BY pair), "
        "r AS (SELECT pair, n, ROW_NUMBER() OVER (ORDER BY n DESC, pair) "
        "AS rank FROM c) SELECT pair, n, CAST(rank AS BIGINT) AS rank "
        "FROM r WHERE rank <= 10 ORDER BY rank"
    ).df()
    assert got["pair"].tolist() == want["pair"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()


NOVELTY_TEXTS = [
    "a b c d e",  # grams: "a b c","b c d","c d e"
    "a b c d e",  # exact dup of 0 -> all grams shared
    "a b c x y",  # shares "a b c" with 0/1
    "one two",  # too short for 3-grams -> 0/0
    "",
    "unique gram sequence here now",
    "\ta b c d e",  # tab-edged: tokenization must not emit an empty token
    "p q\nr s t\n",  # newline separators and trailing newline
    "  a b c d e  ",  # space-edged
]


def test_ngram_novelty_counts(ray_session):
    import ray.data

    df = pd.DataFrame(
        {"doc_id": np.arange(len(NOVELTY_TEXTS)), "text": NOVELTY_TEXTS}
    )
    got = (
        ngram_novelty_result(ray.data.from_pandas(df).repartition(3))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(_novelty_sql()).df().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_grams"].tolist() == want["n_grams"].tolist()
    assert got["n_shared"].tolist() == want["n_shared"].tolist()
    # spot semantics: docs 0 and 1 are dups -> every gram shared
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "n_grams"] == 3 and by_id.loc[0, "n_shared"] == 3
    assert by_id.loc[2, "n_shared"] == 1  # only "a b c"
    assert by_id.loc[3, "n_grams"] == 0 and by_id.loc[3, "n_shared"] == 0


def ngram_novelty_result(ds) -> pd.DataFrame:
    from docler_ray.stages.novelty import ngram_novelty

    return ngram_novelty(ds, ngram=3).to_pandas()


def _novelty_sql() -> str:
    from docler_ray.functions.tokens import ws_tokens_sql

    return (
        "WITH toks AS (SELECT doc_id, "
        f"{ws_tokens_sql('text')} AS ws "
        "FROM documents), "
        "grams AS (SELECT DISTINCT doc_id, "
        "array_to_string(ws[i : i+2], ' ') AS g "
        "FROM toks, UNNEST(range(1, array_length(ws) - 1)) AS t(i)), "
        "d AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id), "
        "c AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g), "
        "u AS (SELECT gr.doc_id, COUNT(*) AS n_unique FROM grams gr "
        "JOIN c ON gr.g = c.g WHERE c.df = 1 GROUP BY gr.doc_id) "
        "SELECT doc.doc_id, CAST(COALESCE(d.n_grams, 0) AS BIGINT) AS n_grams, "
        "CAST(COALESCE(d.n_grams, 0) - COALESCE(u.n_unique, 0) AS BIGINT) "
        "AS n_shared FROM documents doc "
        "LEFT JOIN d ON doc.doc_id = d.doc_id "
        "LEFT JOIN u ON doc.doc_id = u.doc_id"
    )


TAG_RULES = {
    "perf": r"\b(fast|slow)\b",
    "join": r"\bjoin\b",
}
TAG_COUNTS = {"agg": r"\bagg\b"}

TAG_TEXTS = [
    "fast query",
    "slowly does it",  # \b must NOT match inside 'slowly'
    "JOIN me",  # case-sensitive: no match
    "a join b join c",
    "agg agg agg",
    "",
    "fast slow join agg",
]


def test_tag_batch_vs_duckdb():
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(TAG_TEXTS)), pa.int64()),
            "text": pa.array(TAG_TEXTS, pa.string()),
        }
    )
    got = tag_batch(batch, TAG_RULES, count_patterns=TAG_COUNTS).to_pandas()
    con = duckdb.connect()
    con.register("documents", batch.to_pandas())
    want = con.execute(
        "SELECT doc_id, "
        + ", ".join(
            f"regexp_matches(coalesce(text, ''), '{p}') AS tag_{n}"
            for n, p in TAG_RULES.items()
        )
        + ", "
        + ", ".join(
            "CAST(length(regexp_extract_all(coalesce(text, ''), "
            f"'{p}')) AS BIGINT) AS n_{n}"
            for n, p in TAG_COUNTS.items()
        )
        + " FROM documents"
    ).df()
    for c in [f"tag_{n}" for n in TAG_RULES] + [f"n_{n}" for n in TAG_COUNTS]:
        assert got[c].tolist() == want[c].tolist(), c


def test_rule_profile_sums(ray_session):
    import ray.data

    df = pd.DataFrame(
        {"doc_id": np.arange(len(TAG_TEXTS)), "text": TAG_TEXTS}
    )
    out = rule_profile(
        ray.data.from_pandas(df).repartition(3), TAG_RULES
    ).to_pandas()
    assert out["n_docs"].iloc[0] == len(TAG_TEXTS)
    assert out["perf"].iloc[0] == 2  # 'fast query', 'fast slow join agg' (NOT 'slowly')
    assert out["join"].iloc[0] == 2


def test_rule_tagger_dataset(ray_session):
    import ray.data

    df = pd.DataFrame({"doc_id": np.arange(len(TAG_TEXTS)), "text": TAG_TEXTS})
    out = (
        rule_tagger(
            ray.data.from_pandas(df).repartition(2),
            TAG_RULES,
            count_patterns=TAG_COUNTS,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["tag_perf"].tolist() == [
        True, False, False, False, False, False, True,
    ]
    assert out["n_agg"].tolist() == [0, 0, 0, 0, 3, 0, 1]
