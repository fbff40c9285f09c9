"""Property-based URL-kernel tests (hypothesis): the Python oracle and
the scalar invariants hold on arbitrary inputs; idempotence and
containment properties of clean/normalize."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sitecrawler_spark.kernel import urls_py

url_chars = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=80,
)
hosty = st.from_regex(r"[a-z]{1,8}(\.[a-z]{1,6}){1,2}", fullmatch=True)
pathy = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,10}){0,4}/?", fullmatch=True)
query = st.one_of(
    st.just(""),
    st.from_regex(r"\?[a-z](=[a-z0-9]{0,4})?(&[a-z](=[a-z0-9]{0,4})?){0,3}&{0,2}",
                  fullmatch=True),
)


@st.composite
def http_urls(draw):
    scheme = draw(st.sampled_from(["http://", "https://", "HTTP://", "HtTpS://"]))
    return scheme + draw(hosty) + draw(pathy) + draw(query)


@given(http_urls())
@settings(max_examples=300, deadline=None)
def test_clean_is_idempotent_modulo_protocol(u):
    """clean(clean-with-protocol) == clean for query-free URLs. (With a
    query the reference's whole-string truncation quirk — the strip
    removes the last QUERY char, not the slash, URLCleaner.java:66 —
    legitimately breaks idempotence.)"""
    if "?" in u or "//" in u.split("://", 1)[1]:
        # query: the strip eats a query char; '//': java strips ONE char
        # per call, so a double trailing slash needs two passes — both
        # faithful non-idempotent reference behaviors
        return
    c1 = urls_py.clean_url(u, [], True)
    assert c1 is not None
    c2 = urls_py.clean_url("http://" + c1, [], True)
    assert c2 == c1


@given(http_urls())
@settings(max_examples=300, deadline=None)
def test_clean_drops_protocol_and_query_without_whitelist(u):
    c = urls_py.clean_url(u, [], True)
    assert c is not None
    assert "://" not in c
    assert "?" not in c  # no whitelist → query never emitted


@given(http_urls(), st.lists(st.sampled_from("abcxyz"), max_size=3))
@settings(max_examples=300, deadline=None)
def test_clean_query_keys_subset_of_whitelist(u, wl):
    c = urls_py.clean_url(u, wl, True)
    assert c is not None
    if "?" in c:
        q = c.split("?", 1)[1]
        for part in q.split("&"):
            key = part.split("=", 1)[0]
            assert key in wl


@given(url_chars)
@settings(max_examples=300, deadline=None)
def test_normalize2_total_and_trimmed(u):
    """normalize never throws on arbitrary ASCII input and always
    java-trims."""
    out = urls_py.normalize2(u, "http://base.com")
    assert not out[:1] in (" ", "\t")
    assert not out.endswith((" ", "\t"))


@given(url_chars)
@settings(max_examples=200, deadline=None)
def test_prepend_always_absolute(u):
    out = urls_py.prepend_base_if_needed(u, "http://b.com", None)
    assert "://" in out


@given(http_urls())
@settings(max_examples=200, deadline=None)
def test_parse_components_reassemble(u):
    p = urls_py.java_url_parse(u)
    assert p is not None
    assert p.scheme in ("http", "https")
    # host+path is a substring-wise projection: no '?' in path, no '/'
    # in host
    assert "?" not in p.path
    assert "/" not in p.host and "@" not in p.host


# ---------------------------------------------------------------------------
# Vectorized batch kernel (urls_pd) byte-parity vs the scalar oracle.
# The engine's Arrow UDFs (udfs.make_clean_udf / host_udf / urljoin_udf)
# are thin wrappers over these batch functions, so parity here plus the
# Spark-side goldens in test_url_kernel pins the whole stack.
# ---------------------------------------------------------------------------

import pandas as pd

from sitecrawler_spark.kernel import urls_pd

messy_url = st.one_of(
    http_urls(),
    url_chars,
    st.just(""),
    st.from_regex(r"(http|https|ftp|javascript|mailto)?:?(//)?[a-zA-Z0-9@:._/?&=#%-]{0,40}",
                  fullmatch=True),
)


@given(st.lists(messy_url, min_size=1, max_size=50),
       st.sampled_from([[], ["x"], ["sid", "x"], [""]]),
       st.booleans())
@settings(max_examples=150, deadline=None)
def test_clean_series_matches_scalar(urls, params, strip):
    got = urls_pd.clean_series(pd.Series(urls, dtype=object), params, strip).tolist()
    exp = [urls_py.clean_url(u, params, strip) for u in urls]
    assert got == exp


@given(st.lists(messy_url, min_size=1, max_size=50))
@settings(max_examples=150, deadline=None)
def test_host_series_matches_scalar(urls):
    got = urls_pd.host_series(pd.Series(urls, dtype=object)).tolist()
    exp = [urls_py.url_host(u) for u in urls]
    assert got == exp


@given(st.lists(st.tuples(st.one_of(st.none(), messy_url),
                          st.one_of(st.none(), messy_url)),
                min_size=1, max_size=50))
@settings(max_examples=150, deadline=None)
def test_urljoin_series_matches_urljoin(pairs):
    from urllib.parse import urljoin

    def ref(b, h):
        if b is None or h is None:
            return h
        try:
            return urljoin(b, h)
        except Exception:
            return h

    got = urls_pd.urljoin_series(
        pd.Series([p[0] for p in pairs], dtype=object),
        pd.Series([p[1] for p in pairs], dtype=object),
    ).tolist()
    exp = [ref(b, h) for b, h in pairs]
    assert got == exp


def test_urljoin_series_empty_query_fragment_tails():
    """Refs with an empty trailing '?'/'#' (or '?#') are NOT echoed
    verbatim by urljoin — it strips the dangling separator. These shapes
    must skip the vectorized fast paths (ADVICE r02)."""
    from urllib.parse import urljoin

    base = "http://a.com/x/y"
    hrefs = [
        "http://b.com/p?",
        "http://b.com/p#",
        "http://b.com/p?#x",
        "/p?",
        "/p#",
        "/p?#x",
        "p?",
        "p?#x",
        "http://b.com/p?q=1",   # nonempty query: fast path still valid
        "/p?q=1#frag",
    ]
    got = urls_pd.urljoin_series(
        pd.Series([base] * len(hrefs), dtype=object),
        pd.Series(hrefs, dtype=object),
    ).tolist()
    exp = [urljoin(base, h) for h in hrefs]
    assert got == exp
