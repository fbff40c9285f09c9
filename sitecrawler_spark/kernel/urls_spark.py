"""Spark-native Column builders for the URL kernel.

Same semantics as ``urls_py`` (the Java-parity oracle), expressed as
pure Catalyst expressions — whole-stage-codegen'd, no Python in the hot
path. Every builder is tested for equality against the Python kernel on
golden + randomized inputs (tests/test_url_kernel.py).

Citations: URLNormalizer.java:49-60, URLCleaner.java:58-108,
SiteCrawler.java:1120-1141 (prepend), :1152-1227 (isExcluded).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sitecrawler_spark.config import CrawlerConfig

_BIG = 1 << 30  # "rest of string" length for Column.substr


def java_trim(c: Column) -> Column:
    """Java String.trim: strip chars <= U+0020 from both ends."""
    return F.regexp_replace(c, r"^[\x00-\x20]+|[\x00-\x20]+$", "")


def normalize2(c: Column, base: str | None) -> Column:
    """URLNormalizer.normalize(url, base) — URLNormalizer.java:49-60.
    Java quirks kept: null base concatenates "null"; the /index.jsp
    replace hits every occurrence (guarded by endsWith)."""
    u = java_trim(c)
    u = F.when(
        u.startswith("/") & ~u.startswith("//"),
        F.concat(F.lit("null" if base is None else base), u),
    ).otherwise(u)
    return F.when(
        u.endswith("/index.jsp"), F.replace(u, F.lit("/index.jsp"), F.lit("/"))
    ).otherwise(u)


def prepend_base_if_needed(
    c: Column, base_url: str | None, base_url_secure: str | None
) -> Column:
    """SiteCrawler.prependBaseUrlIfNeeded — SiteCrawler.java:1120-1141."""
    base = base_url_secure if base_url_secure is not None else base_url
    if base is None:
        raise ValueError("Cannot have both baseUrl AND baseUrlSecure be null!")
    slashed = F.when(c.startswith("/"), c).otherwise(F.concat(F.lit("/"), c))
    return F.when(c.contains("://"), c).otherwise(F.concat(F.lit(base), slashed))


def _parse(u: Column) -> tuple[Column, Column, Column, Column]:
    """java.net.URL-compatible (is_http, host, path, query) for
    http(s):// URLs. query is null ≙ java getQuery()==null.

    Deliberately regex-free: java.util.regex on every row costs ~10× the
    equivalent substring_index/translate chain (measured 8M rows:
    135 s → ~14 s at 8 cores), and this parse underlies clean_url,
    url_host, and the politeness host key — the hottest expressions in
    the engine."""
    lower7 = F.lower(F.substring(u, 1, 7))
    lower8 = F.lower(F.substring(u, 1, 8))
    is_http1 = lower7 == "http://"
    is_http2 = lower8 == "https://"
    is_http = is_http1 | is_http2
    nofrag = F.substring_index(u, "#", 1)  # fragment strips at first '#'
    after = nofrag.substr(
        F.when(is_http1, F.lit(8)).otherwise(F.lit(9)), F.lit(_BIG)
    )
    # authority terminates at the first '/' or '?' (whichever first)
    authority = F.substring_index(F.substring_index(after, "/", 1), "?", 1)
    hostport = F.substring_index(authority, "@", -1)  # after last '@'
    port_part = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    valid_port = F.translate(port_part, "0123456789", "") == ""
    # port splits at the LAST colon (matches the Python kernel's rfind)
    host = F.when(
        hostport.contains(":"),
        hostport.substr(
            F.lit(1), F.length(hostport) - F.length(port_part) - F.lit(1)
        ),
    ).otherwise(hostport)
    pathq = after.substr(F.length(authority) + F.lit(1), F.lit(_BIG))
    path = F.substring_index(pathq, "?", 1)
    qpos = F.instr(pathq, "?")
    query = F.when(qpos > 0, pathq.substr(qpos + F.lit(1), F.lit(_BIG)))
    ok = is_http & valid_port
    return ok, host, path, query


def clean_url(
    c: Column,
    allowed_parameters: list[str] | None = None,
    url_path_should_not_end_in_slash: bool = True,
) -> Column:
    """URLCleaner.getCleanedUrl — URLCleaner.java:58-108, as a native
    expression. Faithful to the reference's whole-string truncation on
    the trailing-slash strip (URLCleaner.java:66): when the path ends in
    '/' with no '.', the LAST CHAR OF THE URL STRING is dropped and the
    URL re-parsed (mangles the final query char if a query is present).
    """
    allowed_parameters = allowed_parameters or []
    ok, host, path, query = _parse(c)
    with_q = _strip_and_params(
        c, host, path, query, allowed_parameters, url_path_should_not_end_in_slash
    )
    # path-form java.net.URL ("http:foo" — host '', rest is the path):
    # a SEPARATE small top-level branch rather than extra cases inside
    # _parse — path-form never occurs in the engine's traffic (full_url
    # is always base-prefixed), and widening the shared hot parse tree
    # measurably regressed codegen (~2× on q_seen_antijoin)
    is_pf, pf_path, pf_query = _parse_path_form(c)
    pf = _strip_and_params(
        c, F.lit(""), pf_path, pf_query, allowed_parameters,
        url_path_should_not_end_in_slash,
    )
    # else null ≙ MalformedURLException
    return F.when(ok, with_q).when(is_pf, pf)


def _parse_path_form(u: Column):
    """(is_path_form, path, query) for 'http:rest' / 'https:rest' —
    valid java.net.URL with empty host (java parseURL no-authority
    branch)."""
    is_p1 = (F.lower(F.substring(u, 1, 5)) == "http:") & (
        F.lower(F.substring(u, 1, 7)) != "http://"
    )
    is_p2 = (F.lower(F.substring(u, 1, 6)) == "https:") & (
        F.lower(F.substring(u, 1, 8)) != "https://"
    )
    nofrag = F.substring_index(u, "#", 1)
    after = nofrag.substr(
        F.when(is_p1, F.lit(6)).otherwise(F.lit(7)), F.lit(_BIG)
    )
    path = F.substring_index(after, "?", 1)
    qpos = F.instr(after, "?")
    query = F.when(qpos > 0, after.substr(qpos + F.lit(1), F.lit(_BIG)))
    return is_p1 | is_p2, path, query


def _strip_and_params(
    c: Column,
    host: Column,
    path: Column,
    query: Column,
    allowed_parameters: list[str],
    url_path_should_not_end_in_slash: bool,
) -> Column:
    """Trailing-slash quirk + ordered param whitelist over parsed parts.

    Single parse + analytic strip: re-parsing url[:-1] (the reference's
    whole-string truncation, URLCleaner.java:66) only ever changes one
    component — the fragment if '#' is present (never emitted), else the
    query's last char if '?' is present, else the path's last char.
    Avoids quadratic expression blowup from a second parse over a
    conditional of the first."""
    strip = (
        path.endswith("/") & ~path.contains(".")
        if url_path_should_not_end_in_slash
        else F.lit(False)
    )
    has_hash = c.contains("#")
    has_q = query.isNotNull()
    path = F.when(
        strip & ~has_hash & ~has_q, path.substr(F.lit(1), F.length(path) - F.lit(1))
    ).otherwise(path)
    query = F.when(
        strip & ~has_hash & has_q,
        F.when(query == "", F.lit(None)).otherwise(
            query.substr(F.lit(1), F.length(query) - F.lit(1))
        ),
    ).otherwise(query)

    hostpath = F.concat(host, path)
    if allowed_parameters:
        # java String.split drops trailing empty strings: trim trailing '&'s
        qtrim = F.regexp_replace(query, "&+$", "")
        parts = F.split(qtrim, "&")
        kept = F.filter(
            parts,
            lambda x: F.substring_index(x, "=", 1).isin(*allowed_parameters),
        )
        return F.when(
            query.isNotNull() & (query != "") & (F.size(kept) > 0),
            F.concat(hostpath, F.lit("?"), F.array_join(kept, "&")),
        ).otherwise(hostpath)
    return hostpath


def url_host(c: Column) -> Column:
    """Host column for partitioning / politeness; '' if unparseable."""
    ok, host, _p, _q = _parse(c)
    return F.when(ok, host).otherwise(F.lit(""))


def is_excluded_static(c: Column, cfg: CrawlerConfig) -> Column:
    """SiteCrawler.isExcluded minus the visited probes
    (SiteCrawler.java:1152-1227). Returns a boolean Column that is true
    when the URL is excluded. The visited probes (:1204-1207,
    :1220-1224) are anti-joins — see operators/admission.py."""
    scope_ok = F.lit(False)
    if cfg.base_url is not None:
        scope_ok = scope_ok | c.startswith(cfg.base_url)
    if cfg.base_url_secure is not None:
        scope_ok = scope_ok | c.startswith(cfg.base_url_secure)
    # site-relative "/x" but not "//x", length > 1 (SiteCrawler.java:1167)
    scope_ok = scope_ok | (
        (F.length(c) > 1) & c.startswith("/") & ~c.startswith("//")
    )

    # suffix gate (:1185-1202)
    if cfg.require_allowed_suffixes:
        suffix = F.lower(F.substring_index(c, "?", 1))
        suffix_ok = F.lit(False)
        for s in cfg.allowed_suffixes:
            suffix_ok = suffix_ok | suffix.endswith(s)
    else:
        suffix_ok = F.lit(True)

    # blocked substrings incl. compiled robots rules (:1209-1212)
    blocked_hit = F.lit(False)
    for b in list(cfg.blocked) + cfg.robots_blocked_patterns():
        blocked_hit = blocked_hit | c.contains(b)

    # allowed whitelist (:1214-1217)
    if cfg.allowed:
        allowed_ok = F.lit(False)
        for a in cfg.allowed:
            allowed_ok = allowed_ok | c.contains(a)
    else:
        allowed_ok = F.lit(True)

    return ~(scope_ok & suffix_ok & ~blocked_hit & allowed_ok)


def admitted_static(c: Column, cfg: CrawlerConfig) -> Column:
    """Convenience: NOT excluded (static predicates only)."""
    return ~is_excluded_static(c, cfg)


def portable_hash64(c: Column) -> Column:
    """Deterministic 60-bit hash reproducible in DuckDB:
    spark:  conv(substr(md5(x),1,15),16,10) :: long
    duckdb: ('0x' || substr(md5(x),1,15)) :: bigint
    Used for oracle-checkable hashing (minhash, salting, doc ids). The
    engine's internal hot-path hashing uses xxhash64 (faster, JVM)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
