"""Page parse kernel: HTML → interleaved span documents → outlinks.

Span model (BASELINE input_hint): ``array<struct<kind:string,
text:string, media_ref:string, offset:int>>`` with kinds
``text | anchor | iframe | media``; offsets dense, 0-based, in document
order. For anchors, ``text`` holds the RAW href attribute (plugins see
pre-normalization hrefs, ProcessPage.java:217-219); for iframe/media,
``media_ref`` holds the RAW src.

Link-extraction order parity with the reference (ProcessPage.java:203-216):
iframe srcs first — collected unconditionally, even when blank
(``getAttribute("src")`` returns "" if absent) — then anchors with a
non-blank href (``StringUtils.isNotBlank``), each group in document
order. The downstream per-href loop then skips EMPTY (not blank)
hrefs (ProcessPage.java:222-224), so a whitespace-only iframe src
survives to normalization while "" is dropped.

The HTML parser is stdlib ``html.parser`` driven inside Arrow-batched
pandas UDFs — no per-row Python at the Spark level; outlink explode and
ordering are native DataFrame ops (posexplode preserves span order).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
SPAN_ARRAY = T.ArrayType(SPAN_STRUCT)

_SKIP_TEXT_IN = {"head", "script", "style", "title"}


class _SpanExtractor(HTMLParser):
    """DOM-order span extraction. Mirrors what the reference observes
    through HtmlUnit: iframes by tag scan (ProcessPage.java:206-210),
    anchors via getAnchors() (:205), plus text/media spans for the
    span-document model."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple[str, str | None, str | None]] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_IN:
            self._skip_depth += 1
            return
        d = dict(attrs)
        if tag == "iframe":
            # reference adds src unconditionally; missing attr -> ""
            self.spans.append(("iframe", None, d.get("src") or ""))
        elif tag == "a":
            self.spans.append(("anchor", d.get("href") or "", None))
        elif tag == "img":
            self.spans.append(("media", None, d.get("src") or ""))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_IN and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth:
            return
        stripped = data.strip()
        if stripped:
            self.spans.append(("text", stripped, None))


def parse_html_to_spans(html: str) -> list[dict]:
    """Pure-Python core: HTML string → span dicts (dense offsets)."""
    p = _SpanExtractor()
    p.feed(html)
    p.close()
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(p.spans)
    ]


@F.pandas_udf(SPAN_ARRAY)
def parse_html_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized HTML → span array."""
    return html.map(lambda h: parse_html_to_spans(h) if h is not None else None)


def raw_hrefs_from_spans(spans: list[dict]) -> list[str]:
    """Link-extraction order: iframes (all, doc order) then non-blank
    anchors (doc order) — ProcessPage.java:203-216. Python model path."""
    ordered = sorted(spans, key=lambda s: s["offset"])
    out = [s["media_ref"] for s in ordered if s["kind"] == "iframe"]
    out.extend(
        s["text"]
        for s in ordered
        if s["kind"] == "anchor" and s["text"] is not None and s["text"].strip() != ""
    )
    return out


def explode_outlinks(pages: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Spark path: pages(doc cols..., spans) → one row per extracted raw
    href with deterministic ``link_pos`` mirroring the reference's
    iframe-first extraction order. Pure native ops (posexplode keeps
    span order; no shuffle)."""
    s = F.col("span")
    exploded = pages.select(
        "*", F.posexplode_outer(F.col(spans_col)).alias("pos", "span")
    ).drop(spans_col)
    is_iframe = s["kind"] == F.lit("iframe")
    is_anchor = (s["kind"] == F.lit("anchor")) & (
        F.trim(F.coalesce(s["text"], F.lit(""))) != ""
    )
    links = exploded.filter(is_iframe | is_anchor).select(
        "*",
        F.when(is_iframe, s["media_ref"]).otherwise(s["text"]).alias("raw_href"),
        # iframe block sorts before anchor block, each in doc order
        F.when(is_iframe, F.lit(0)).otherwise(F.lit(1)).alias("_grp"),
    )
    w_order = (F.col("_grp").cast("long") * F.lit(1 << 32) + F.col("pos")).alias(
        "link_pos"
    )
    return links.select(
        *[c for c in pages.columns if c != spans_col], w_order, "raw_href"
    )


def render_spans_to_html(spans: list[dict], title: str = "") -> str:
    """Deterministic renderer used by the synthetic site generator; the
    parse kernel must round-trip its output back to the same spans."""
    import html as _html

    parts = [f"<html><head><title>{_html.escape(title)}</title></head><body>"]
    for s in sorted(spans, key=lambda x: x["offset"]):
        k = s["kind"]
        if k == "text":
            parts.append(f"<p>{_html.escape(s['text'])}</p>")
        elif k == "anchor":
            parts.append(f'<a href="{_html.escape(s["text"] or "", quote=True)}"></a>')
        elif k == "iframe":
            parts.append(
                f'<iframe src="{_html.escape(s["media_ref"] or "", quote=True)}"></iframe>'
            )
        elif k == "media":
            parts.append(
                f'<img src="{_html.escape(s["media_ref"] or "", quote=True)}"/>'
            )
    parts.append("</body></html>")
    return "".join(parts)
