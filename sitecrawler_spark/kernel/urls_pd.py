"""Whole-batch (vectorized pandas) implementations of the URL kernel.

These are the batch analogs of ``urls_py`` — every operation is a
pandas string op over the full Arrow batch, with no per-row Python
lambda in any path the engine exercises (input_hint: "no per-row
Python"). Byte-parity with the scalar oracle ``urls_py`` is enforced by
tests/test_url_kernel.py (native expr == Arrow UDF == Python scalar on
golden + randomized corpora).

Reference semantics mirrored (citations into /root/reference):
- ``parse_frame``   ≙ java.net.URL component extraction (urls_py.java_url_parse)
- ``clean_series``  ≙ URLCleaner.getCleanedUrl            URLCleaner.java:58-108
- ``host_series``   ≙ new URL(url).getHost()              (partitioning key)
- ``urljoin_series``≙ HtmlUnit relative-href absolutization; exact
  urllib.parse.urljoin semantics, fast-pathed for the two shapes that
  dominate crawl corpora (absolute http(s) hrefs, root-relative hrefs)
  with a per-row urljoin fallback ONLY for the residual minority
  (dot-segment/protocol-relative/fragment-only hrefs).
"""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd

_SCHEME_SPLIT = r"^([A-Za-z][A-Za-z0-9+.\-]*):([\s\S]*)$"
# lowercase-scheme absolute URL with a nonempty authority — the shape
# urljoin returns verbatim (scheme case-normalization and empty-netloc
# refs diverge, so those fall back; verified empirically).
_ABS_FAST = r"^[a-z][a-z0-9+.\-]*://[^/?#]"
_ORIGIN_FAST = r"^([a-z][a-z0-9+.\-]*://[^/?#]+)"
# a '.' or '..' path segment anywhere — urljoin runs remove_dot_segments
# on relative refs, so these rows take the exact fallback.
_DOT_SEG = r"/\.\.?(?:/|$)"
# Empty trailing query/fragment shapes where urljoin does NOT echo the ref
# verbatim: '...?', '...#', or '...?#...' (empty query before a fragment).
_EMPTY_TAIL = r"[?#]$|\?#"


def parse_frame(u: pd.Series) -> pd.DataFrame:
    """Vector analog of ``urls_py.java_url_parse`` over a whole batch.

    Returns DataFrame(ok: bool, host/path: 'string', query: 'string'
    with <NA> ≙ java getQuery() == null). ``ok`` False ≙ the scalar
    kernel returning None (MalformedURLException analog).
    """
    s = pd.Series(u, dtype="string")
    ext = s.str.extract(_SCHEME_SPLIT, expand=True)
    scheme = ext[0].str.lower()
    ok = scheme.isin(("http", "https")).fillna(False).astype(bool)
    rest = ext[1].fillna("")
    # fragment strips at the first '#' (java parseURL)
    rest = rest.str.split("#", n=1).str[0].astype("string")
    has_auth = rest.str.startswith("//").fillna(False)
    after = rest.str.slice(2).where(has_auth, rest)
    # authority terminates at the first '/' or '?'
    aext = after.str.extract(r"^([^/?]*)([\s\S]*)$", expand=True)
    authority = aext[0].where(has_auth, "")
    rem = aext[1].where(has_auth, after).astype("string")
    # host = after the last '@' in the authority (userinfo dropped)
    host = authority.str.rsplit("@", n=1).str[-1].astype("string")
    # strip :port — valid port is empty or digits, else malformed
    rs = host.str.rsplit(":", n=1)
    hbase = rs.str[0].astype("string")
    pport = rs.str[1]
    has_colon = pport.notna()
    port_ok = pd.Series(pport, dtype="string").str.fullmatch(r"[0-9]*").fillna(False)
    host = hbase.where(has_colon & port_ok, host)
    ok = ok & ~(has_colon & ~port_ok)
    qext = rem.str.extract(r"^([^?]*)(?:\?([\s\S]*))?$", expand=True)
    return pd.DataFrame(
        {"ok": ok, "host": host, "path": qext[0], "query": qext[1]}
    )


def _to_object(s: pd.Series) -> pd.Series:
    """'string' dtype → object with None (what StringType UDFs return)."""
    return s.astype(object).where(s.notna(), None)


def clean_series(
    u: pd.Series,
    allowed_parameters: list[str] | None = None,
    url_path_should_not_end_in_slash: bool = True,
) -> pd.Series:
    """Batch ``URLCleaner.getCleanedUrl`` (URLCleaner.java:58-108),
    including the whole-string trailing-char strip quirk (java:66) and
    ordered query-param whitelisting (java:72-99)."""
    s = pd.Series(u, dtype="string")
    f = parse_frame(s)
    if url_path_should_not_end_in_slash:
        need = (
            f["ok"]
            & f["path"].str.endswith("/").fillna(False)
            & ~f["path"].str.contains(".", regex=False).fillna(False)
        )
        if bool(need.any()):
            f2 = parse_frame(s.str.slice(0, -1))
            for col in f.columns:
                f[col] = f2[col].where(need, f[col])
    out = (f["host"].fillna("") + f["path"].fillna("")).astype("string")
    params = list(allowed_parameters or [])
    q = f["query"]
    if params:
        hasq = f["ok"] & q.notna() & (q != "")
        if bool(hasq.any()):
            # java String.split drops trailing empty strings — strip
            # trailing '&' runs first, then split keeps inner empties
            qq = q[hasq].str.replace(r"&+$", "", regex=True)
            qq = qq[qq != ""].astype(object)
            if len(qq):
                parts = qq.str.split("&").explode()
                keys = parts.str.split("=", n=1).str[0]
                kept = parts[keys.isin(params)]
                if len(kept):
                    joined = kept.groupby(level=0).agg("&".join)
                    out.loc[joined.index] = out.loc[joined.index] + "?" + joined
    return _to_object(out.where(f["ok"], pd.NA))


def host_series(u: pd.Series) -> pd.Series:
    """Batch ``urls_py.url_host``: host of a full URL, '' when
    unparseable (partitioning key — never null)."""
    f = parse_frame(pd.Series(u, dtype="string"))
    return _to_object(f["host"].fillna("").where(f["ok"], ""))


def urljoin_series(base: pd.Series, href: pd.Series) -> pd.Series:
    """Batch absolutization with exact urllib.parse.urljoin semantics.

    Fast paths (vectorized, verified byte-equal to urljoin):
      * href is an absolute lowercase-scheme URL with nonempty netloc →
        urljoin returns it verbatim (no dot-segment normalization for
        refs carrying an authority);
      * href is root-relative ('/x', not '//x'), has no '.'/'..' path
        segment, and base has a lowercase-scheme origin → origin + href.
    Everything else (protocol-relative, dot-segments, fragment/query-
    only, null base) takes a per-row urljoin fallback — a residual
    minority on crawl corpora.
    """
    b = pd.Series(base, dtype="string")
    h = pd.Series(href, dtype="string")
    out = pd.Series(pd.NA, index=h.index, dtype="string")
    done = pd.Series(False, index=h.index)

    # Refs with an empty trailing query/fragment ('p?', 'p#', 'p?#x') are
    # NOT returned verbatim by urljoin — it strips the dangling '?'/'#'
    # (e.g. urljoin(b, 'http://b.com/p?') == 'http://b.com/p'), so route
    # them through the exact per-row fallback.
    tricky = h.str.contains(_EMPTY_TAIL, regex=True).fillna(False)

    abs_fast = h.str.match(_ABS_FAST).fillna(False) & ~tricky
    out = out.mask(abs_fast, h)
    done |= abs_fast

    origin = b.str.extract(_ORIGIN_FAST, expand=True)[0]
    rooted = (
        ~done
        & ~tricky
        & h.str.startswith("/").fillna(False)
        & ~h.str.startswith("//").fillna(False)
        & ~h.str.contains(_DOT_SEG, regex=True).fillna(True)
        & origin.notna()
    )
    out = out.mask(rooted, origin + h)
    done |= rooted

    rem = ~done
    if bool(rem.any()):
        fb = []
        for bb, hh in zip(b[rem].tolist(), h[rem].tolist()):
            bb = None if pd.isna(bb) else bb
            hh = None if pd.isna(hh) else hh
            if bb is None or hh is None:
                fb.append(hh)
                continue
            try:
                fb.append(urljoin(bb, hh))
            except Exception:  # reference logs and keeps the raw href
                fb.append(hh)
        out[rem] = pd.array(fb, dtype="string")
    return _to_object(out)
