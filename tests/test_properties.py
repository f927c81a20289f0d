"""Property-based guards (hypothesis) for invariants that byte-identical
goldens alone can't cover: arbitrary/adversarial inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docler_ray.html.dom import parse_html
from docler_ray.html.extract import _norm_len, _subtree_stats, extract_html

# HTML-ish soup: tags, text, entities, brokenness
_tokens = st.sampled_from(
    ["a", "bc", " ", "\n", "\t", "<", ">", "/", "=", '"', "'", "&", ";", "!",
     "-", "<p>", "</p>", "<div", "<div>", "</div>", "&amp;", "&#65;", "<!--",
     "-->", "<a href='x'>", "</a>", "<br>", "word", " ", "、"]
)
_soup = st.lists(_tokens, max_size=80).map("".join)


@settings(max_examples=200, deadline=None)
@given(_soup)
def test_stats_memo_matches_get_text(html: str) -> None:
    """The one-pass _Stats summary must equal the naive per-node
    _norm_len(get_text()) on EVERY element of EVERY tree — this is the
    invariant the memoized scorer's byte-identical claim rests on."""
    root = parse_html(html)
    stats = _subtree_stats(root)
    for node in root.iter():
        if node.is_text():
            continue
        assert stats[id(node)].norm_len() == _norm_len(node.get_text())


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_extract_html_total_function(html: str) -> None:
    """extract_html never raises and always emits the leading page marker."""
    result = extract_html(html)
    assert result.content.startswith('<!-- docler:page_break {"next_page":1} -->')


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_pdfish_decode_never_hangs(data: bytes) -> None:
    """Arbitrary bytes either parse or raise ValueError — no other escape."""
    from docler_ray.pdfish.extract import extract_pdfish

    try:
        extract_pdfish(data)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500), st.integers(min_value=60, max_value=300))
def test_chunker_covers_content(text: str, max_size: int) -> None:
    """Markdown chunker: chunk_index contiguous from 0; non-empty input with
    any non-whitespace yields at least one chunk."""
    from docler_ray.functions.chunkers import chunk_markdown

    chunks = chunk_markdown(text, source_doc_id="u", max_chunk_size=max_size)
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
    if text.strip():
        assert chunks


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab 12.!\té中'\n  "),
            max_size=30,
        ),
        max_size=40,
    ),
    st.integers(min_value=5, max_value=200),
)
def test_incremental_token_count_matches_recount(lines, budget):
    """Property: every chunk's incrementally-maintained token_count equals a
    from-scratch recount of its content — the exactness claim of the linear
    grow loop (boundary-delta over the trailing whitespace run)."""
    from docler_ray.functions.chunkers import chunk_by_tokens
    from docler_ray.functions.tokens import count_tokens

    doc = "\n".join(lines)
    for chunk in chunk_by_tokens(doc, [], "d", max_tokens_per_chunk=budget):
        assert chunk["metadata"]["token_count"] == count_tokens(chunk["content"])


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=1, max_codepoint=0x2FFFF, blacklist_categories=("Cs",)
            ),
            max_size=64,
        ),
        max_size=30,
    )
)
def test_batch_fingerprints_bit_identical(texts):
    """Property: the fused whole-batch fingerprint pass equals the per-doc
    fingerprint() for every document — the boundary-masked min must never
    leak a window hash across adjacent documents."""
    import numpy as np

    from docler_ray.functions.analysis import batch_fingerprints, fingerprint

    got = batch_fingerprints(texts)
    exp = np.array(
        [fingerprint(t) & 0xFFFFFFFFFFFFFFFF for t in texts], dtype=np.uint64
    )
    assert (got == exp).all()


# latin-1 page text incl. parens/backslashes/CR/controls the PDF literal
# string grammar must escape or carry faithfully
_pdf_line = st.text(
    alphabet=st.characters(min_codepoint=9, max_codepoint=255),
    max_size=40,
)
_pdf_pages = st.lists(
    st.lists(_pdf_line, max_size=4).map("\n".join), min_size=1, max_size=3
)


@settings(max_examples=150, deadline=None)
@given(_pdf_pages)
def test_realpdf_writer_reader_round_trip(pages: list[str]) -> None:
    """build_simple_pdf -> extract_real_pdf is the identity on the
    latin-1 repertoire modulo join_pages' page assembly (the same
    assembly applied to the source pages) — including parens nesting,
    backslashes, raw CR/LF and every escape path of the literal-string
    grammar."""
    from docler_ray.markers import join_pages
    from docler_ray.pdfish.realpdf import build_simple_pdf, extract_real_pdf

    # the writer splits pages on \n; normalize the comparison the same way
    assert extract_real_pdf(build_simple_pdf(pages)).content == join_pages(pages)


@settings(max_examples=25, deadline=None)
@given(_pdf_pages)
def test_realpdf_encrypted_round_trip(pages: list[str]) -> None:
    from docler_ray.markers import join_pages
    from docler_ray.pdfish.realpdf import build_simple_pdf, extract_real_pdf

    pdf = build_simple_pdf(pages, user_password="pw")
    assert extract_real_pdf(pdf, password="pw").content == join_pages(pages)


# --- round-5 format writers: round-trip properties ---------------------------

# paragraph text that survives each format's own normalization: non-empty
# after strip, no control chars the extractors treat as structure
_para = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=0x2FFF, blacklist_characters="\x7f"
    ),
    min_size=1,
    max_size=60,
).map(lambda s: " ".join(s.split())).filter(bool)


@settings(max_examples=100, deadline=None)
@given(st.lists(_para, min_size=1, max_size=5))
def test_rtf_writer_reader_round_trip(paragraphs: list[str]) -> None:
    """make_rtf -> extract_rtf recovers every paragraph verbatim across
    the whole escape surface (ASCII, \\'hh CP1252 bytes, \\uN? unicode
    incl. the signed-16-bit wrap)."""
    from docler_ray.office.rtf import extract_rtf, make_rtf

    r = extract_rtf(make_rtf("T", paragraphs))
    for p in paragraphs:
        assert p in r.content


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(
                _para,
                st.integers(min_value=-(2**40), max_value=2**40),
                st.booleans(),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_xls_writer_reader_round_trip(rows) -> None:
    """make_xls -> extract_xls recovers every cell: SST strings (both
    encodings), RK ints in and out of 30-bit range, BOOLERR bools."""
    from docler_ray.office.biff import _fmt_number, extract_xls, make_xls

    r = extract_xls(make_xls("T", {"S": rows}))
    for row in rows:
        for v in row:
            if isinstance(v, bool):
                want = "TRUE" if v else "FALSE"
            elif isinstance(v, int):
                want = _fmt_number(float(v))
            else:
                want = v
            assert f" {want} " in r.content or f"| {want} |" in r.content


@settings(max_examples=100, deadline=None)
@given(st.lists(_para, min_size=1, max_size=5))
def test_odt_writer_reader_round_trip(paragraphs: list[str]) -> None:
    """make_odt -> extract_odt recovers every paragraph (XML escaping of
    &/<\\> included)."""
    from docler_ray.office.odf import extract_odt, make_odt

    r = extract_odt(make_odt("T", [("p", p) for p in paragraphs]))
    for p in paragraphs:
        assert p in r.content


@settings(max_examples=60, deadline=None)
@given(st.lists(_para, min_size=1, max_size=4))
def test_ppt_writer_reader_round_trip(paragraphs: list[str]) -> None:
    from docler_ray.office.ppt97 import extract_ppt, make_ppt

    r = extract_ppt(make_ppt("T", [("Head", paragraphs)]))
    for p in paragraphs:
        assert p in r.content
