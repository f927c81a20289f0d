"""Sitemap-protocol parser (sitemaps.org): urlset/sitemapindex kinds,
CDATA, entities, malformed entries, and the flat-map stage contract."""

from __future__ import annotations

import pyarrow as pa

from docler_ray.functions.sitemap import parse_sitemap


def test_urlset_full_fields():
    x = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/'
        'schemas/sitemap/0.9"><url><loc>https://h.example/a?x=1&amp;y=2'
        "</loc><lastmod>2026-01-02</lastmod><changefreq>daily</changefreq>"
        "<priority>0.8</priority></url></urlset>"
    )
    (e,) = parse_sitemap(x)
    assert e == {
        "kind": "url",
        "loc": "https://h.example/a?x=1&y=2",
        "lastmod": "2026-01-02",
        "changefreq": "daily",
        "priority": 0.8,
    }


def test_cdata_loc_is_literal():
    x = "<urlset><url><loc><![CDATA[https://h.example/b?raw&amp]]></loc></url></urlset>"
    (e,) = parse_sitemap(x)
    assert e["loc"] == "https://h.example/b?raw&amp"  # CDATA: no unescape


def test_sitemapindex_kind():
    x = (
        "<sitemapindex><sitemap><loc>https://h.example/s1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc> https://h.example/s2.xml </loc></sitemap>"
        "</sitemapindex>"
    )
    got = parse_sitemap(x)
    assert [e["kind"] for e in got] == ["sitemap", "sitemap"]
    assert got[1]["loc"] == "https://h.example/s2.xml"  # stripped


def test_malformed_entries():
    # loc-less entry dropped; unparseable priority -> None; self-closing
    # loc -> dropped; non-sitemap input and garbage -> []
    x = (
        "<urlset><url><lastmod>2026-03-01</lastmod></url>"
        "<url><loc>u</loc><priority>high</priority></url>"
        "<url><loc/></url></urlset>"
    )
    got = parse_sitemap(x)
    assert len(got) == 1
    assert got[0]["loc"] == "u" and got[0]["priority"] is None
    assert parse_sitemap("<html><body>x</body></html>") == []
    assert parse_sitemap("") == []
    assert parse_sitemap("<urlset><url><loc>unclosed") == []


def test_tag_name_boundaries():
    # <location> must not satisfy a <loc> search
    x = "<urlset><url><location>bad</location><loc>good</loc></url></urlset>"
    (e,) = parse_sitemap(x)
    assert e["loc"] == "good"


def test_parse_sitemaps_stage(ray_session):
    import ray.data

    from docler_ray.stages.urlops import parse_sitemaps

    xmls = [
        "<urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
        "not xml",
        "<sitemapindex><sitemap><loc>s</loc></sitemap></sitemapindex>",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "sitemap_xml": pa.array(xmls, pa.string()),
            }
        )
    )
    df = parse_sitemaps(ds).to_pandas().sort_values(["doc_id", "pos"])
    # NB: df.loc is the pandas indexer — the loc COLUMN needs df["loc"]
    assert list(zip(df.doc_id, df.pos, df.kind, df["loc"])) == [
        (0, 0, "url", "a"),
        (0, 1, "url", "b"),
        (2, 0, "sitemap", "s"),
    ]


# --- RSS/Atom feeds ----------------------------------------------------------


def test_feed_rss_fields_and_drops():
    from docler_ray.functions.sitemap import parse_feed

    rss = (
        '<rss version="2.0"><channel><title>F</title>'
        "<item><title>Post &amp; One</title><link>https://h/p1</link>"
        "<pubDate>Mon, 01 Jan 2026</pubDate><guid>g1</guid></item>"
        "<item><description>no link no title</description></item>"
        "<item><title>T2</title></item></channel></rss>"
    )
    got = parse_feed(rss)
    assert got[0] == {
        "kind": "rss",
        "title": "Post & One",
        "link": "https://h/p1",
        "updated": "Mon, 01 Jan 2026",
        "guid": "g1",
    }
    assert [e["title"] for e in got] == ["Post & One", "T2"]  # bare dropped


def test_feed_atom_href_attribute():
    from docler_ray.functions.sitemap import parse_feed

    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<entry><title>E1</title><link href="https://h/a1"/>'
        "<updated>2026-02-01</updated><id>u1</id></entry>"
        "<entry><title>E2</title>"
        "<link rel='alternate' href='https://h/a2'/></entry></feed>"
    )
    got = parse_feed(atom)
    assert [e["link"] for e in got] == ["https://h/a1", "https://h/a2"]
    assert got[0]["guid"] == "u1" and got[0]["kind"] == "atom"


def test_feed_non_feed_input():
    from docler_ray.functions.sitemap import parse_feed

    assert parse_feed("<html><body>x</body></html>") == []
    assert parse_feed("") == []


# --- meta-refresh + pagination nav signals -----------------------------------


def test_extract_nav_forms():
    from docler_ray.html.metadata import extract_nav

    h = (
        "<html><head>"
        "<meta http-equiv=\"Refresh\" content=\"5; URL='/t?x=1'\">"
        '<link rel="next" href="/p/3"><link rel="prev" href="/p/1">'
        "</head></html>"
    )
    got = extract_nav(h, "https://h.example/p/2")
    assert got == {
        "refresh_url": "https://h.example/t?x=1",
        "refresh_delay": 5,
        "next_url": "https://h.example/p/3",
        "prev_url": "https://h.example/p/1",
    }
    # comma separator, no url= quotes, zero delay
    got = extract_nav(
        '<meta http-equiv=refresh content="0,url=/z">', "https://h.example/a"
    )
    assert got["refresh_url"] == "https://h.example/z"
    assert got["refresh_delay"] == 0
    # malformed delay or javascript target -> no signal
    assert (
        extract_nav(
            '<meta http-equiv=refresh content="soon;url=/x">',
            "https://h.example/a",
        )["refresh_url"]
        is None
    )
    assert (
        extract_nav(
            '<meta http-equiv=refresh content="0;url=javascript:x()">',
            "https://h.example/a",
        )["refresh_url"]
        is None
    )


def test_extract_hreflang_forms():
    from docler_ray.html.metadata import extract_hreflang

    h = (
        '<link rel="alternate" hreflang="EN" href="/en/p">'
        '<link rel="alternate" hreflang="fr-CA" href="https://h.example/fr/p">'
        '<link rel="alternate" href="/no-lang">'          # no hreflang
        '<link rel="stylesheet" hreflang="de" href="/css">'  # wrong rel
        '<link rel="alternate" hreflang="es" href="javascript:x()">'  # nav
    )
    got = extract_hreflang(h, "https://h.example/x/p")
    assert got == [
        ("en", "https://h.example/en/p"),
        ("fr-ca", "https://h.example/fr/p"),
    ]
    assert extract_hreflang("<html></html>", "https://h.example/") == []
