"""Parse kernel: span-sequence equality (north_star per-row invariant)
and link-extraction order parity (ProcessPage.java:203-216)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sitecrawler_spark.crawl import sitegen
from sitecrawler_spark.crawl.parse import (
    parse_html_to_spans,
    parse_html_udf,
    raw_hrefs_from_spans,
    render_spans_to_html,
    explode_outlinks,
)


def test_render_parse_roundtrip_python():
    """Every generated page's rendered HTML parses back to the exact
    (kind, text, media_ref, offset) sequence."""
    rows = sitegen.generate_site(n_pages=40, seed=42)
    checked = 0
    for r in rows:
        if r["empty_body"]:
            continue
        got = parse_html_to_spans(r["html"])
        assert got == r["spans"], r["url"]
        checked += 1
    assert checked > 30


def test_iframe_before_anchor_order():
    spans = [
        {"kind": "text", "text": "t", "media_ref": None, "offset": 0},
        {"kind": "anchor", "text": "/a.html", "media_ref": None, "offset": 1},
        {"kind": "iframe", "text": None, "media_ref": "/if1.html", "offset": 2},
        {"kind": "anchor", "text": "  ", "media_ref": None, "offset": 3},  # blank
        {"kind": "iframe", "text": None, "media_ref": "", "offset": 4},  # empty src
        {"kind": "media", "text": None, "media_ref": "/x.png", "offset": 5},
        {"kind": "anchor", "text": "/b.html", "media_ref": None, "offset": 6},
    ]
    # iframes first (incl. empty src — dropped later by isEmpty, not here),
    # then non-blank anchors, each in document order
    assert raw_hrefs_from_spans(spans) == ["/if1.html", "", "/a.html", "/b.html"]


def test_parse_udf_and_explode_order(spark):
    rows = [r for r in sitegen.generate_site(n_pages=12, seed=7) if not r["empty_body"]]
    df = sitegen.site_to_df(spark, rows)
    parsed = df.select(
        "url", parse_html_udf(F.col("html")).alias("spans2"), "spans"
    )
    for r in parsed.collect():
        exp = [t.asDict() for t in r["spans"]]
        got = [t.asDict() for t in r["spans2"]]
        assert got == exp, r["url"]

    # explode_outlinks link order == python extraction order
    links = (
        explode_outlinks(df.select("url", "spans"), "spans")
        .orderBy("url", "link_pos")
        .collect()
    )
    by_url: dict[str, list[str]] = {}
    for r in links:
        by_url.setdefault(r["url"], []).append(r["raw_href"])
    for row in rows:
        exp = raw_hrefs_from_spans(row["spans"])
        assert by_url.get(row["url"], []) == exp, row["url"]
