"""Deterministic synthetic-site generator (seed-stable, no network).

Produces the "web" a crawl resolves against: one row per fetchable URL
with the interleaved span document (BASELINE input_hint shape), the
rendered HTML body (for exercising the parse kernel), and fetch-
simulation columns (status / content_type / redirect_location /
empty_body — FIXTURES.md §1 companion columns).

The link mix deliberately covers every branch of the reference's href
pipeline: absolute http/https, site-relative, path-relative,
protocol-relative, mailto:/tel:/javascript:/#fragment, query params,
disallowed suffixes, blocked paths, /index.jsp, off-site, duplicate
links, blank anchors, and blank iframe srcs.
"""

from __future__ import annotations

import random

from pyspark.sql import types as T

from sitecrawler_spark.crawl.parse import SPAN_ARRAY, render_spans_to_html

WEB_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("redirect_location", T.StringType()),
        T.StructField("empty_body", T.BooleanType()),
        T.StructField("transient_fails", T.IntegerType()),
        T.StructField("spans", SPAN_ARRAY),
        T.StructField("html", T.StringType()),
    ]
)

_SUFFIXES = [".html", "/", ".htm", ".jsp", ".html", "/", ".html", ".php"]
_WORDS = (
    "cloud crm sales service marketing analytics platform data app api "
    "trail head customer success partner developer admin flow einstein"
).split()


def _page_path(i: int, rng: random.Random) -> str:
    suffix = _SUFFIXES[i % len(_SUFFIXES)]
    word = _WORDS[i % len(_WORDS)]
    if suffix == "/":
        return f"/{word}/p{i}/"
    return f"/{word}/p{i}{suffix}"


def generate_site(
    n_pages: int = 40,
    hosts: tuple[str, ...] = ("www.salesforce.com",),
    seed: int = 42,
    links_per_page: int = 6,
    scheme: str = "https",
    p_transient: float = 0.0,
    redirect_chains: int = 0,
) -> list[dict]:
    """Returns web rows (dicts matching WEB_SCHEMA ordering).

    ``redirect_chains``: number of multi-hop redirect chains to plant
    (each 3 hops, crossing hosts when >1 host, mixing absolute and
    site-relative Location styles) — exercises hop-by-hop Location
    resolution against the CURRENT hop URL (ADVICE r1: sitegen used to
    emit only effectively single-hop redirects)."""
    rng = random.Random(seed)
    paths = [_page_path(i, rng) for i in range(n_pages)]
    page_host = [hosts[i % len(hosts)] for i in range(n_pages)]
    urls = [f"{scheme}://{page_host[i]}{paths[i]}" for i in range(n_pages)]

    # plant 3-hop chains a →(abs, crosses hosts)→ b →(site-relative,
    # SAME host — a relative Location only resolves correctly against
    # the CURRENT hop's host, the exact bug class ADVICE r1 flagged)→
    # c →(abs)→ landing
    chain_redirect: dict[int, tuple[int, str]] = {}
    h_stride = len(hosts) if len(hosts) > 1 else 1
    for cidx in range(redirect_chains):
        a = 3 + cidx * (h_stride + 3)
        b, c2, d = a + 1, a + 1 + h_stride, a + 2 + h_stride
        if d >= n_pages:
            break
        chain_redirect[a] = (b, "abs")
        chain_redirect[b] = (c2, "rel")  # page_host[b] == page_host[c2]
        chain_redirect[c2] = (d, "abs")

    rows: list[dict] = []
    for i in range(n_pages):
        r = rng.random()
        status, ctype, redirect, empty = 200, "text/html", None, False
        if i in chain_redirect:
            dst, style = chain_redirect[i]
            status = 301 if i % 2 else 302
            redirect = urls[dst] if style == "abs" else paths[dst]
        elif i > 2:  # keep the first pages healthy so crawls get going
            if r < 0.06:
                status = rng.choice([404, 403, 500])
            elif r < 0.10:
                status = rng.choice([301, 302])
                tgt = urls[(i * 7 + 3) % n_pages]
                # Location header styles: absolute or site-relative
                redirect = tgt if rng.random() < 0.7 else paths[(i * 7 + 3) % n_pages]
            elif r < 0.13:
                empty = True  # → 410 path (ProcessPage.java:182-185)
            elif r < 0.16:
                ctype = rng.choice(["application/pdf", "text/plain"])

        transient = 0
        if p_transient > 0 and status == 200 and not empty and rng.random() < p_transient:
            transient = 1 + rng.randrange(2)  # fails 1-2 times, then succeeds

        spans: list[dict] = []
        off = 0

        def add(kind, text=None, media_ref=None):
            nonlocal off
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref, "offset": off}
            )
            off += 1

        add("text", text=f"Page {i} about {_WORDS[i % len(_WORDS)]}")
        if i % 5 == 0:
            add("iframe", media_ref=urls[(i * 3 + 1) % n_pages])
        if i % 11 == 7:
            add("iframe", media_ref=" ")  # whitespace src: survives isEmpty
        if i % 13 == 9:
            add("iframe", media_ref="")  # empty src: dropped by isEmpty
        for j in range(links_per_page):
            k = (i * links_per_page + j * 5 + 1) % n_pages
            style = (i + j) % 10
            if style < 4:
                add("anchor", text=urls[k])  # absolute
            elif style < 6:
                add("anchor", text=paths[k])  # site-relative
            elif style == 6:
                add("anchor", text=paths[k].lstrip("/"))  # path-relative
            elif style == 7:
                add("anchor", text=f"//{page_host[k]}{paths[k]}")  # protocol-relative
            elif style == 8:
                add("anchor", text=f"{paths[k]}?a=b&c=d&e=f")  # query params
            else:
                add("anchor", text=urls[k] + "#section")  # fragment
            if j == 2:
                add("text", text=f"filler {i}-{j}")
        # noise links exercising filters
        if i % 4 == 0:
            add("anchor", text="mailto:info@salesforce.com")
            add("anchor", text="javascript:void(0)")
        if i % 4 == 1:
            add("anchor", text="tel:+1-800-NO-SOFTWARE")
            add("anchor", text="#top")
        if i % 4 == 2:
            add("anchor", text="https://external.example.org/out.html")
            add("anchor", text=f"/assets/logo{i}.pdf")  # disallowed suffix
        if i % 4 == 3:
            add("anchor", text=f"/logout/session{i}.html")  # blocked pattern
            add("anchor", text="   ")  # blank anchor: dropped at collection
        if i % 6 == 5:
            add("anchor", text=f"{paths[i]}../p{(i + 1) % n_pages}.html")
        if i % 7 == 3:
            add("anchor", text="/sub/index.jsp")  # /index.jsp normalize
        add("media", media_ref=f"/img/banner{i}.png")
        add("text", text=f"footer {i}")

        html = None if empty else render_spans_to_html(spans, title=f"p{i}")
        rows.append(
            {
                "url": urls[i],
                "host": page_host[i],
                "status": status,
                "content_type": ctype,
                "redirect_location": redirect,
                "empty_body": empty,
                "transient_fails": transient,
                "spans": spans,
                "html": "" if empty else html,
            }
        )

    # root index page per host ("{scheme}://{host}/") linking to the first
    # pages on that host — lets default-seed crawls (navigate() seeding
    # baseUrl, SiteCrawler.java:621-628) start from a trailing-slash base
    for h in hosts:
        spans, off = [], 0
        spans.append({"kind": "text", "text": f"index of {h}", "media_ref": None,
                      "offset": 0})
        off = 1
        for i in range(n_pages):
            if page_host[i] == h and off <= 5:
                spans.append({"kind": "anchor", "text": paths[i],
                              "media_ref": None, "offset": off})
                off += 1
        rows.append(
            {
                "url": f"{scheme}://{h}/",
                "host": h,
                "status": 200,
                "content_type": "text/html",
                "redirect_location": None,
                "empty_body": False,
                "transient_fails": 0,
                "spans": spans,
                "html": render_spans_to_html(spans, title=h),
            }
        )
    return rows


def site_to_df(spark, rows: list[dict]):
    return spark.createDataFrame(
        [
            (
                r["url"],
                r["host"],
                r["status"],
                r["content_type"],
                r["redirect_location"],
                r["empty_body"],
                r["transient_fails"],
                [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in r["spans"]
                ],
                r["html"],
            )
            for r in rows
        ],
        WEB_SCHEMA,
    )


def seeds_for(rows: list[dict], n: int = 2) -> list[str]:
    """Seed list: site-relative paths of the first n pages, mirroring
    setIncludePath's path-style input (SiteCrawler.java:437-448)."""
    out = []
    for r in rows[:n]:
        u = r["url"]
        out.append(u[u.index("/", u.index("://") + 3) :])
    return out


# --- corpus fixture: crawl → training-corpus pipeline -----------------------

_CORPUS_TOPICS = (
    "data cloud pipeline index crawler schema query stream".split()
)
_CORPUS_VERBS = "moves stores builds reads writes merges".split()


def _cw(i: int, k: int) -> str:
    """Content word (i, k): an 8-letter base-26 pseudo-word derived
    arithmetically — long, doc-specific tokens whose CHARACTER
    5-shingles are essentially disjoint between different pages (so
    minhash-LSH only pairs real copies; stem-sharing vocab drove
    cross-doc Jaccard to ~0.43 and chained the whole corpus into one
    cluster) while every word 8-gram still carries doc-unique tokens
    (so decontamination drops only planted overlap)."""
    v = (i * 1315423911 + k * 2654435761 + 97) % (26 ** 8)
    chars = []
    for _ in range(8):
        chars.append(chr(97 + v % 26))
        v //= 26
    return "".join(chars)


def _corpus_body(i: int) -> list[str]:
    """Deterministic body lines for corpus page ``i``: English pages
    are stopword-glued content words; i%7==0 pages are French (the
    lang-gate case)."""
    if i % 7 == 0:  # French page → filtered by the lang gate
        return [
            f"le {_cw(i, 0)} est un service de {_cw(i, 1)} et la"
            f" equipe {_cw(i, 2)} est pour les {_cw(i, 3)} du site",
            f"la plateforme {_cw(i, 4)} est un outil de {_cw(i, 5)} et"
            f" le plan {_cw(i, 6)} est pour les {_cw(i, 7)} du groupe",
        ]
    return [
        f"the {_cw(i, 0)} {_cw(i, 1)} is fresh and the {_cw(i, 2)}"
        f" batch {_CORPUS_VERBS[i % 6]} into the {_cw(i, 3)} store"
        f" with {_cw(i, 4)} limits in place",
        f"a {_cw(i, 5)} queue holds {_cw(i, 6)} rows and the"
        f" {_cw(i, 7)} merge lands in a {_cw(i, 8)} table for the"
        f" review of {_cw(i, 9)} runs",
        f"the {_cw(i, 10)} plan is set for {_cw(i, 11)} scale and the"
        f" {_cw(i, 12)} cost stays low in the {_cw(i, 13)} zone of"
        f" {_cw(i, 14)} sites",
    ]


def generate_corpus_site(
    n_pages: int = 44,
    hosts: tuple[str, ...] = ("www.salesforce.com", "docs.salesforce.com"),
    scheme: str = "https",
) -> list[dict]:
    """Deterministic multi-host site whose CONTENT exercises every
    training-corpus stage (the crawl semantics are exercised by
    generate_site):

    - per-host nav/footer text spans on EVERY page, plus a promo line
      on 40% of host-0 pages → boilerplate strip (>20% of host docs
      and ≥3 docs);
    - pages with i%7==0 are French → lang/quality gate drops them;
    - pages with i%9==8 copy the previous page's body verbatim
      (often cross-host: identical after the host-specific chrome is
      stripped — the mirror case) → exact dedup;
    - pages with i%6==3 copy body(i-3) plus one extra line →
      minhash-LSH near-dup clusters;
    - pages with i%3==2 (except the exact-dup pages) embed one body
      line copied from page (i*5)%n_pages → shared word-8-grams
      WITHOUT near-dup-level similarity, the decontamination case;
    - anchors link (i+1), (i*5+7), (i+11) mod n → the crawl reaches
      every page from two seeds.
    """
    paths = [f"/c/sec{i % 4}/p{i}.html" for i in range(n_pages)]
    page_host = [hosts[i % len(hosts)] for i in range(n_pages)]
    urls = [f"{scheme}://{page_host[i]}{paths[i]}" for i in range(n_pages)]

    bodies: list[list[str]] = []
    for i in range(n_pages):
        body = _corpus_body(i)
        if i >= 6 and i % 6 == 3:  # near-dup of i-3 (+1 extra line)
            body = list(bodies[i - 3]) + [
                f"an extra note u{i}x on the {_CORPUS_TOPICS[i % 8]} rollout"
                f" u{i}y for the quarter q{i % 4} with margin u{i}z to spare"
            ]
        if i >= 1 and i % 9 == 8:  # exact dup of i-1's final body
            body = list(bodies[i - 1])
        bodies.append(body)

    rows: list[dict] = []
    for i in range(n_pages):
        h = page_host[i]
        spans: list[dict] = []
        off = 0

        def add(kind, text=None, media_ref=None):
            nonlocal off
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref,
                 "offset": off}
            )
            off += 1

        add("text", text=f"nav {h} home login products pricing")
        if i % 2 == 0 and i % 5 < 2:  # 40% of host-0 pages
            add("text", text="subscribe to the weekly newsletter for updates")
        for line in bodies[i]:
            add("text", text=line)
        # contamination bait: one line from another page — NOT on the
        # exact-dup pages (i%9==8 is always ≡2 mod 3, and a bait line
        # its i-1 source lacks would break the byte-identical mirror)
        if i % 3 == 2 and i % 9 != 8:
            add("text", text=_corpus_body((i * 5) % n_pages)[0])
        add("anchor", text=urls[(i + 1) % n_pages])
        add("anchor", text=paths[(i * 5 + 7) % n_pages])
        add("anchor", text=urls[(i + 11) % n_pages])
        add("text", text=f"footer {h} copyright contact legal")

        rows.append(
            {
                "url": urls[i],
                "host": h,
                "status": 200,
                "content_type": "text/html",
                "redirect_location": None,
                "empty_body": False,
                "transient_fails": 0,
                "spans": spans,
                "html": render_spans_to_html(spans, title=f"p{i}"),
            }
        )
    return rows
