"""Content-defined chunking: boundary rule, shift-resistance (the property
fixed-size blocking lacks), and the distributed profile."""

from __future__ import annotations

import pyarrow as pa

from docler_ray.stages.cdc_chunks import _h52, cdc_dedup_profile, doc_chunks


def _boundary_token():
    """Find a short token whose 52-bit md5 is 0 mod 64."""
    i = 0
    while True:
        t = f"t{i}"
        if _h52(t) % 64 == 0:
            return t
        i += 1


def test_doc_chunks_boundary_rule():
    b = _boundary_token()
    # words w1 w2 B w3 -> chunk [w1 w2 B], chunk [w3]
    text = f"w1 w2 {b} w3"
    chunks = doc_chunks(text)
    assert [n for _, n in chunks] == [3, 1]
    assert chunks[0][0] == _h52(f"w1 w2 {b}")
    assert chunks[1][0] == _h52("w3")
    # trailing boundary: final chunk closes exactly at it, no empty chunk
    assert [n for _, n in doc_chunks(f"w1 {b}")] == [2]
    assert doc_chunks("") == []


def test_cdc_shift_resistance():
    """Prepending a prefix changes only chunks BEFORE the first boundary —
    every later chunk identity survives (the CDC property)."""
    b1, b2 = _boundary_token(), None
    i = 0
    while b2 is None:
        t = f"s{i}"
        if _h52(t) % 64 == 0 and t != b1:
            b2 = t
        i += 1
    base = f"alpha beta {b1} gamma delta {b2} tail words here"
    shifted = "inserted prefix " + base
    h0 = {h for h, _ in doc_chunks(base)}
    h1 = {h for h, _ in doc_chunks(shifted)}
    # chunks after the first boundary are identical
    common = h0 & h1
    assert _h52(f"gamma delta {b2}") in common
    assert _h52("tail words here") in common
    # only the head chunk differs
    assert len(h0 - h1) == 1 and len(h1 - h0) == 1


def test_cdc_profile_counts(ray_session):
    import ray.data

    b = _boundary_token()
    # two identical docs + one unique: the shared chunks dedup
    texts = [f"x y {b} z", f"x y {b} z", "totally different words"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
            }
        )
    )
    df = cdc_dedup_profile(ds).to_pandas()
    row = df.iloc[0]
    assert row["n_chunks"] == 5  # 2+2+1
    assert row["n_distinct_chunks"] == 3
    assert row["token_mass"] == 4 + 4 + 3
    assert row["distinct_token_mass"] == 3 + 1 + 3
