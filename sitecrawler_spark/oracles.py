"""DuckDB oracle SQL for each driver-contract query.

Independent SQL re-implementations of the operator semantics (NOT the
Spark plans), over the same parquet views. Column aliases match
queries.py exactly; the driver hash-compares values.
"""

from __future__ import annotations

from sitecrawler_spark.queries import (
    ALLOWED_PARAMS,
    CFG,
    HREFS_SQL,
    NORM_BASE,
    POLITENESS_K,
    URLS_SQL,
)

# --- SQL fragment builders (URL kernel semantics in pure SQL) --------------


def _clean_sql(url_expr: str, allowed_params: list[str], strip_slash: bool) -> str:
    """URLCleaner.getCleanedUrl as a DuckDB expression over ``url_expr``
    (corpus URLs are well-formed http(s), no fragment/port/userinfo —
    the general java.net.URL quirks are covered by the kernel tests).
    Faithful to the whole-string truncation quirk (URLCleaner.java:66)."""
    path0 = f"regexp_extract({url_expr}, '^https?://[^/?#]*([^?#]*)', 1)"
    if strip_slash:
        u = (
            f"CASE WHEN {path0} LIKE '%/' AND NOT contains({path0}, '.') "
            f"THEN substr({url_expr}, 1, length({url_expr}) - 1) "
            f"ELSE {url_expr} END"
        )
    else:
        u = url_expr
    host = f"regexp_extract({u}, '^https?://([^/?#]*)', 1)"
    path = f"regexp_extract({u}, '^https?://[^/?#]*([^?#]*)', 1)"
    q = f"CASE WHEN contains({u}, '?') THEN regexp_extract({u}, '\\?(.*)$', 1) END"
    if not allowed_params:
        return f"concat({host}, {path})"
    inlist = ", ".join(f"'{p}'" for p in allowed_params)
    kept = (
        f"list_filter(string_split(regexp_replace({q}, '&+$', ''), '&'), "
        f"p -> list_contains([{inlist}], string_split(p, '=')[1]))"
    )
    return (
        f"CASE WHEN {q} IS NOT NULL AND {q} <> '' AND len({kept}) > 0 "
        f"THEN concat({host}, {path}, '?', array_to_string({kept}, '&')) "
        f"ELSE concat({host}, {path}) END"
    )


def _normalize2_sql(href_expr: str, base: str) -> str:
    """URLNormalizer.normalize(url, base) as DuckDB SQL
    (URLNormalizer.java:49-60; java-trim + prepend + replace-all quirk)."""
    t = (
        f"regexp_replace(regexp_replace({href_expr}, '^[\\x00-\\x20]+', ''), "
        f"'[\\x00-\\x20]+$', '')"
    )
    pre = (
        f"CASE WHEN starts_with({t}, '/') AND NOT starts_with({t}, '//') "
        f"THEN concat('{base}', {t}) ELSE {t} END"
    )
    return (
        f"CASE WHEN ends_with({pre}, '/index.jsp') "
        f"THEN replace({pre}, '/index.jsp', '/') ELSE {pre} END"
    )


def _admitted_sql(url_expr: str) -> str:
    """Static admission predicate (SiteCrawler.java:1152-1217) for CFG."""
    scope = (
        f"(starts_with({url_expr}, '{CFG.base_url}') "
        f"OR starts_with({url_expr}, '{CFG.base_url_secure}') "
        f"OR (length({url_expr}) > 1 AND starts_with({url_expr}, '/') "
        f"AND NOT starts_with({url_expr}, '//')))"
    )
    sfx = f"lower(string_split({url_expr}, '?')[1])"
    suffix_ok = " OR ".join(f"ends_with({sfx}, '{s}')" for s in CFG.allowed_suffixes)
    blocked = " OR ".join(f"contains({url_expr}, '{b}')" for b in CFG.blocked)
    return f"({scope} AND ({suffix_ok}) AND NOT ({blocked}))"


# --- per-query oracle SQL ---------------------------------------------------

ORACLES: dict[str, str] = {}

ORACLES["q_admission_filter"] = f"""
WITH urls AS ({URLS_SQL})
SELECT doc_id, url FROM urls WHERE {_admitted_sql('url')}
"""

ORACLES["q_url_clean"] = f"""
WITH urls AS ({URLS_SQL})
SELECT doc_id, url, {_clean_sql('url', ALLOWED_PARAMS, True)} AS url_clean
FROM urls
"""

ORACLES["q_url_normalize"] = f"""
WITH hrefs AS ({HREFS_SQL})
SELECT doc_id, href, {_normalize2_sql('href', NORM_BASE)} AS url_norm
FROM hrefs
"""

ORACLES["q_prepend_base"] = f"""
WITH hrefs AS ({HREFS_SQL})
SELECT doc_id, href,
  CASE WHEN contains(href, '://') THEN href
       ELSE concat('{CFG.base_url_secure}',
                   CASE WHEN starts_with(href, '/') THEN href
                        ELSE concat('/', href) END)
  END AS full_url
FROM hrefs
"""

ORACLES["q_seen_antijoin"] = f"""
WITH urls AS ({URLS_SQL}),
visited AS (
  SELECT url AS s FROM urls WHERE doc_id % 3 = 0
  UNION ALL
  SELECT {_clean_sql('url', ALLOWED_PARAMS, True)} AS s FROM urls
  WHERE doc_id % 3 = 0 AND {_clean_sql('url', ALLOWED_PARAMS, True)} IS NOT NULL
),
cand AS (
  SELECT doc_id, url, {_clean_sql('url', ALLOWED_PARAMS, True)} AS url_clean
  FROM urls WHERE doc_id % 3 <> 0
)
SELECT doc_id, url FROM cand
WHERE NOT EXISTS (SELECT 1 FROM visited v WHERE v.s = cand.url)
  AND NOT EXISTS (SELECT 1 FROM visited v WHERE v.s = cand.url_clean)
"""

ORACLES["q_frontier_dedup"] = f"""
WITH urls AS ({URLS_SQL}),
k AS (
  SELECT doc_id, url,
         coalesce({_clean_sql('url', [], True)}, concat('RAW:', url)) AS key
  FROM urls
),
r AS (
  SELECT doc_id, url,
         row_number() OVER (PARTITION BY key ORDER BY doc_id) AS rn
  FROM k
)
SELECT doc_id, url FROM r WHERE rn = 1
"""

ORACLES["q_politeness_topk"] = f"""
WITH urls AS ({URLS_SQL}),
h AS (
  SELECT doc_id, url,
         regexp_extract(url, '^https?://([^/?#]*)', 1) AS host
  FROM urls
),
r AS (
  SELECT doc_id, url, host,
         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS hrn
  FROM h
)
SELECT doc_id, url, host, hrn FROM r WHERE hrn <= {POLITENESS_K}
"""

ORACLES["q_referrer_agg"] = f"""
WITH urls AS ({URLS_SQL}),
m AS (SELECT max(doc_id) + 1 AS n FROM urls),
e1 AS (
  SELECT a.url AS src, b.url AS dst
  FROM urls a, urls b, m WHERE b.doc_id = (a.doc_id * 7 + 3) % m.n
),
e2 AS (
  SELECT a.url AS src, b.url AS dst
  FROM urls a, urls b, m WHERE b.doc_id = (a.doc_id * 3 + 1) % m.n
),
edges AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
SELECT dst,
       count(DISTINCT src) AS n_referrers,
       string_agg(DISTINCT src, ',' ORDER BY src) AS referrers
FROM edges GROUP BY dst
"""

_sfx = "lower(string_split(url, '?')[1])"
ORACLES["q_suffix_gate"] = f"""
WITH urls AS ({URLS_SQL})
SELECT ({' OR '.join(f"ends_with({_sfx}, '{s}')" for s in CFG.allowed_suffixes)})
         AS admitted,
       count(*) AS n
FROM urls GROUP BY 1
"""

ORACLES["q_error_dispatch"] = f"""
WITH urls AS ({URLS_SQL}),
s AS (
  SELECT doc_id,
    CASE doc_id % 9 WHEN 0 THEN 200 WHEN 1 THEN 301 WHEN 2 THEN 302
         WHEN 3 THEN 403 WHEN 4 THEN 404 WHEN 5 THEN 410 WHEN 6 THEN 500
         ELSE 200 END AS status,
    doc_id % 10 = 9 AS empty,
    CASE WHEN doc_id % 12 = 11 THEN 'application/pdf' ELSE 'text/html' END AS ctype
  FROM urls
)
SELECT CASE WHEN status >= 400 OR (status > 300 AND status < 303) THEN status
            WHEN empty THEN 410
            ELSE NULL END AS error_code,
       count(*) AS n
FROM s GROUP BY 1
"""

ORACLES["q_lineitem_pricing"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q_events_hourly"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
"""
