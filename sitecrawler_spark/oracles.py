"""DuckDB oracle SQL for each driver-contract query.

Independent SQL re-implementations of the operator semantics (NOT the
Spark plans), over the same parquet views. Column aliases match
queries.py exactly; the driver hash-compares values.
"""

from __future__ import annotations

from sitecrawler_spark.queries import (
    ALLOWED_PARAMS,
    BM25_QUERIES,
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
    CASE doc_id % 14 WHEN 7 THEN 900 WHEN 8 THEN 1000 WHEN 9 THEN 1001
         WHEN 10 THEN 1002 WHEN 11 THEN 2000 WHEN 12 THEN 2001
         WHEN 13 THEN 3000 ELSE NULL END AS exc,
    doc_id % 10 = 9 AS empty,
    CASE WHEN doc_id % 12 = 11 THEN 'application/pdf' ELSE 'text/html' END AS ctype
  FROM urls
)
SELECT CASE WHEN exc IS NOT NULL THEN exc
            WHEN status >= 400 OR (status > 300 AND status < 303) THEN status
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


# --------------------------------------------------------------------------
# training-data pipeline oracles
# --------------------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
_PUNCT_RE = "[!-/:-@\\[-`{-~]"

_STOP = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "on", "with", "a"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "para", "con"],
}


def _stopcount(lang: str) -> str:
    words = "|".join(_STOP[lang])
    return f"len(regexp_extract_all(lower(text), '\\b({words})\\b'))"


# Serpentine LPT shard balancing (layout.balanced_shards): 0-based rank
# by tokens desc / doc_id asc, pos = rank mod 2S, reverse direction on
# odd passes. Mirrors the Spark op's integer arithmetic exactly.
ORACLES["q_balanced_shards"] = """
WITH w AS (
  SELECT doc_id,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\\s+'))
          END)::BIGINT AS tokens
  FROM documents
),
r AS (
  SELECT tokens,
         row_number() OVER (ORDER BY tokens DESC, doc_id) - 1 AS rank
  FROM w
),
s AS (
  SELECT tokens,
         (CASE WHEN rank % 16 < 8 THEN rank % 16
               ELSE 15 - (rank % 16) END)::INT AS shard
  FROM r
)
SELECT shard, count(*)::BIGINT AS n_docs, sum(tokens)::BIGINT AS shard_tokens
FROM s GROUP BY 1
"""

ORACLES["q_token_counts"] = f"""
SELECT doc_id,
  CASE WHEN trim(text) = '' THEN 0
       ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws_tokens,
  len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens
FROM documents
"""

ORACLES["q_quality_score"] = f"""
SELECT doc_id, round(
    least(length(text) / 500.0, 1.0) * 0.3
  + least({_stopcount('en')}
      / greatest(CASE WHEN trim(text) = '' THEN 0
          ELSE len(string_split_regex(trim(text), '\\s+')) END, 1.0) * 4.0,
      1.0) * 0.4
  + (1.0 - least(len(regexp_extract_all(text, '{_PUNCT_RE}'))
      / greatest(length(text), 1.0) * 10.0, 1.0)) * 0.2
  + (1.0 - least(len(regexp_extract_all(text, '[A-Z]'))
      / greatest(length(text), 1.0) * 10.0, 1.0)) * 0.1
, 4) AS quality
FROM documents
"""

ORACLES["q_lang_id"] = f"""
WITH s AS (
  SELECT doc_id,
    {_stopcount('en')} AS c_en, {_stopcount('fr')} AS c_fr,
    {_stopcount('de')} AS c_de, {_stopcount('es')} AS c_es
  FROM documents
)
SELECT doc_id,
  CASE WHEN greatest(c_en, c_fr, c_de, c_es) = 0 THEN 'und'
       WHEN c_en = greatest(c_en, c_fr, c_de, c_es) THEN 'en'
       WHEN c_fr = greatest(c_en, c_fr, c_de, c_es) THEN 'fr'
       WHEN c_de = greatest(c_en, c_fr, c_de, c_es) THEN 'de'
       ELSE 'es' END AS lang_pred
FROM s
"""

ORACLES["q_fingerprint"] = f"""
SELECT doc_id,
  md5({_NORM}) AS fp_md5,
  list_min(list_transform(
    range(1, greatest(length({_NORM}) - 15, 1) + 1),
    i -> ('0x' || substr(md5(substr({_NORM}, i, 16)), 1, 15))::BIGINT
  )) AS fp_rolling
FROM documents
"""

ORACLES["q_exact_dedup"] = f"""
WITH r AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id FROM r WHERE rn = 1
"""

_SHINGLES = (
    f"list_distinct(list_transform("
    f"range(1, greatest(length({_NORM}) - 4, 1) + 1), "
    f"i -> substr({_NORM}, i, 5)))"
)


def _minhash_j(j: int) -> str:
    return (
        f"list_min(list_transform({_SHINGLES}, "
        f"s -> ('0x' || substr(md5(concat(s, '#{j}')), 1, 15))::BIGINT))"
    )


ORACLES["q_minhash_signature"] = f"""
SELECT doc_id,
  concat_ws(',', {', '.join(_minhash_j(j) for j in range(8))}) AS sig
FROM documents
"""

ORACLES["q_minhash_pairs"] = f"""
WITH sigs AS (
  SELECT doc_id AS id,
         [{', '.join(_minhash_j(j) for j in range(8))}] AS sig
  FROM documents
),
bands AS (
  SELECT id, unnest([
    concat_ws('_', 0, sig[1], sig[2]),
    concat_ws('_', 1, sig[3], sig[4]),
    concat_ws('_', 2, sig[5], sig[6]),
    concat_ws('_', 3, sig[7], sig[8])
  ]) AS band_key
  FROM sigs
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.id < b.id
"""

_TOKHASHES = (
    "list_transform(string_split_regex(trim(lower(text)), '\\s+'), "
    "t -> ('0x' || substr(md5(concat(t, '#0')), 1, 15))::BIGINT)"
)

_simhash_terms = " + ".join(
    f"(CASE WHEN list_sum(list_transform({_TOKHASHES}, "
    f"h -> 2 * ((h >> {j}) & 1) - 1)) > 0 THEN {2 ** j} ELSE 0 END)"
    for j in range(24)
)
ORACLES["q_simhash"] = f"""
SELECT doc_id, ({_simhash_terms})::BIGINT AS simhash
FROM documents
"""

_SH_A = _SHINGLES
_SH_B = _SHINGLES.replace("lower(text)", "lower(text_b)")
ORACLES["q_ngram_jaccard"] = f"""
WITH b AS (
  SELECT doc_id - 1 AS join_id, text AS text_b FROM documents
),
p AS (
  SELECT d.doc_id AS id_a, d.doc_id + 1 AS id_b,
         {_SH_A} AS sa, {_SH_B} AS sb
  FROM documents d JOIN b ON d.doc_id = b.join_id
)
SELECT id_a, id_b,
  round(len(list_intersect(sa, sb))
        / greatest(len(sa) + len(sb) - len(list_intersect(sa, sb)), 1.0),
        6) AS jaccard
FROM p
"""

ORACLES["q_ann_bruteforce"] = """
WITH p AS (SELECT vec_id AS query_id, embedding AS qvec
           FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.qvec::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim
  FROM embeddings e, p WHERE e.vec_id <> p.query_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5
"""

ORACLES["q_ann_lsh"] = """
WITH planes AS (
  SELECT * FROM (VALUES (0), (1), (2), (3), (4), (5)) t(p)
),
pl AS (
  SELECT p, ([
    [-1.0, -1.0, -1.0, -1.0, 1.0, -1.0, 1.0, 1.0, -1.0, 1.0, 1.0, 1.0, -1.0, -1.0, 1.0, 1.0, -1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, 1.0, 1.0, 1.0, -1.0, -1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, -1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, 1.0, -1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, -1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0],
    [1.0, 1.0, 1.0, -1.0, -1.0, 1.0, -1.0, -1.0, -1.0, -1.0, 1.0, 1.0, 1.0, -1.0, 1.0, 1.0, -1.0, 1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0, 1.0, -1.0, -1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, -1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 1.0, 1.0, -1.0, 1.0, -1.0, 1.0, 1.0, -1.0, -1.0, 1.0, -1.0, 1.0, -1.0, -1.0, -1.0, -1.0, -1.0],
    [1.0, 1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0, 1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, -1.0, -1.0, -1.0, -1.0, 1.0, 1.0, -1.0, 1.0, 1.0, -1.0, -1.0, 1.0, 1.0, -1.0, -1.0, 1.0, 1.0, -1.0, -1.0, 1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0, 1.0, 1.0],
    [-1.0, -1.0, 1.0, -1.0, 1.0, -1.0, -1.0, 1.0, 1.0, 1.0, -1.0, 1.0, 1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, 1.0, -1.0, -1.0, 1.0, -1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, -1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, -1.0, 1.0, 1.0, -1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, -1.0],
    [-1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0, 1.0, -1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, 1.0, 1.0, -1.0, 1.0, 1.0, -1.0, -1.0, 1.0, 1.0, 1.0, -1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, 1.0, 1.0, -1.0, 1.0, 1.0, -1.0, -1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 1.0, -1.0, -1.0, 1.0, 1.0, 1.0, -1.0, 1.0, -1.0],
    [1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0, 1.0, -1.0, -1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, -1.0, 1.0, 1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, 1.0, 1.0, 1.0, -1.0, -1.0, 1.0, 1.0, -1.0, 1.0]
  ])[p + 1] AS vec FROM planes
),
emb AS (
  SELECT vec_id, embedding,
    (SELECT sum(CASE WHEN list_dot_product(e2.embedding::DOUBLE[], pl.vec) > 0
                     THEN 1 << pl.p ELSE 0 END)
     FROM pl) AS bucket
  FROM embeddings e2
),
p AS (SELECT vec_id AS query_id, embedding AS qvec, bucket
      FROM emb WHERE vec_id < 10),
cand AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.qvec::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim
  FROM emb e JOIN p ON e.bucket = p.bucket AND e.vec_id <> p.query_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5
"""

ORACLES["q_events_sessionize"] = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN prev_ts IS NULL
                OR epoch(ts) - epoch(prev_ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sess AS (
  SELECT user_id, ts, event_type,
         (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM sess GROUP BY user_id, session_id
"""


_PIPE_SHINGLES = _SHINGLES  # shingles over `text` — valid inside any CTE


def _pipe_minhash_j(j: int) -> str:
    return (
        f"list_min(list_transform({_PIPE_SHINGLES}, "
        f"s -> ('0x' || substr(md5(concat(s, '#{j}')), 1, 15))::BIGINT))"
    )


ORACLES["q_training_pipeline"] = f"""
WITH RECURSIVE scored AS (
  SELECT doc_id, text,
    round(
      least(length(text) / 500.0, 1.0) * 0.3
    + least({_stopcount('en')}
        / greatest(CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END, 1.0) * 4.0,
        1.0) * 0.4
    + (1.0 - least(len(regexp_extract_all(text, '{_PUNCT_RE}'))
        / greatest(length(text), 1.0) * 10.0, 1.0)) * 0.2
    + (1.0 - least(len(regexp_extract_all(text, '[A-Z]'))
        / greatest(length(text), 1.0) * 10.0, 1.0)) * 0.1
    , 4) AS quality,
    CASE WHEN greatest({_stopcount('en')}, {_stopcount('fr')},
                       {_stopcount('de')}, {_stopcount('es')}) = 0 THEN 'und'
         WHEN {_stopcount('en')} = greatest({_stopcount('en')}, {_stopcount('fr')},
                       {_stopcount('de')}, {_stopcount('es')}) THEN 'en'
         WHEN {_stopcount('fr')} = greatest({_stopcount('en')}, {_stopcount('fr')},
                       {_stopcount('de')}, {_stopcount('es')}) THEN 'fr'
         WHEN {_stopcount('de')} = greatest({_stopcount('en')}, {_stopcount('fr')},
                       {_stopcount('de')}, {_stopcount('es')}) THEN 'de'
         ELSE 'es' END AS lang_pred,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents
),
kept AS (
  SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'
),
uniqd AS (
  SELECT doc_id, text, quality, lang_pred, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY md5({_NORM})
                                 ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1
),
sigs AS (
  SELECT doc_id AS id,
         [{', '.join(_pipe_minhash_j(j) for j in range(8))}] AS sig
  FROM uniqd
),
bands AS (
  SELECT id, unnest([
    concat_ws('_', 0, sig[1], sig[2]),
    concat_ws('_', 1, sig[3], sig[4]),
    concat_ws('_', 2, sig[5], sig[6]),
    concat_ws('_', 3, sig[7], sig[8])
  ]) AS band_key
  FROM sigs
),
edges AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.id < b.id
),
und AS (
  SELECT id_a AS s, id_b AS d FROM edges
  UNION SELECT id_b, id_a FROM edges
),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM uniqd
  UNION
  SELECT u.d, reach.lbl FROM reach JOIN und u ON u.s = reach.id
),
comp AS (
  SELECT id, min(lbl) AS component_id FROM reach GROUP BY id
),
sizes AS (
  SELECT component_id, count(*) AS cluster_size FROM comp GROUP BY component_id
)
SELECT u.doc_id, u.lang_pred, u.quality, u.n_tokens, s.cluster_size
FROM comp
JOIN sizes s USING (component_id)
JOIN uniqd u ON u.doc_id = comp.id
WHERE comp.id = comp.component_id
"""

ORACLES["q_simhash_pairs"] = f"""
WITH sims AS (
  SELECT doc_id AS id, ({_simhash_terms})::BIGINT AS sim FROM documents
),
bands AS (
  SELECT id, unnest([
    concat_ws('_', 0, (sim >> 0) & 63),
    concat_ws('_', 1, (sim >> 6) & 63),
    concat_ws('_', 2, (sim >> 12) & 63),
    concat_ws('_', 3, (sim >> 18) & 63)
  ]) AS band_key
  FROM sims
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.id < b.id
)
SELECT c.id_a, c.id_b,
       bit_count(xor(sa.sim, sb.sim))::INTEGER AS hamming
FROM cand c
JOIN sims sa ON sa.id = c.id_a
JOIN sims sb ON sb.id = c.id_b
WHERE bit_count(xor(sa.sim, sb.sim)) <= 8
"""

ORACLES["q_ann_ivf"] = """
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id % 25 = 0
),
scored AS (
  SELECT e.vec_id AS id, e.embedding AS vec, c.centroid_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      c.cvec::DOUBLE[]), 6) AS csim
  FROM embeddings e, cent c
),
assign AS (
  SELECT id, vec, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY csim DESC, centroid_id) AS r
    FROM scored) WHERE r = 1
),
probe AS (
  SELECT id AS query_id, vec AS qvec, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY csim DESC, centroid_id) AS r
    FROM scored WHERE id < 10) WHERE r <= 3
),
cand AS (
  SELECT p.query_id, a.id AS neighbor_id,
         round(list_cosine_similarity(p.qvec::DOUBLE[],
                                      a.vec::DOUBLE[]), 6) AS sim
  FROM assign a JOIN probe p ON a.centroid_id = p.centroid_id
  WHERE a.id <> p.query_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5
"""

# Connected components as a recursive fixpoint: reach(id, lbl) = "lbl's
# id reaches id"; min reachable label per node = component id. An
# independent implementation of the same fixpoint the Spark side
# computes by iterative min-label propagation.
ORACLES["q_dedup_clusters"] = f"""
WITH RECURSIVE sigs AS (
  SELECT doc_id AS id,
         [{', '.join(_minhash_j(j) for j in range(8))}] AS sig
  FROM documents
),
bands AS (
  SELECT id, unnest([
    concat_ws('_', 0, sig[1], sig[2]),
    concat_ws('_', 1, sig[3], sig[4]),
    concat_ws('_', 2, sig[5], sig[6]),
    concat_ws('_', 3, sig[7], sig[8])
  ]) AS band_key
  FROM sigs
),
edges AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.id < b.id
),
und AS (
  SELECT id_a AS s, id_b AS d FROM edges
  UNION SELECT id_b, id_a FROM edges
),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT u.d, reach.lbl FROM reach JOIN und u ON u.s = reach.id
),
comp AS (
  SELECT id, min(lbl) AS component_id FROM reach GROUP BY id
),
sizes AS (
  SELECT component_id, count(*) AS cluster_size FROM comp GROUP BY component_id
)
SELECT comp.id AS doc_id, comp.component_id, sizes.cluster_size,
       comp.id = comp.component_id AS is_canonical
FROM comp JOIN sizes USING (component_id)
"""


ORACLES["q_events_rollup"] = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY ROLLUP(event_type, hour)
"""

ORACLES["q_events_quantiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""

ORACLES["q_orders_top_customers"] = """
WITH t AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         round(sum(o.o_totalprice), 2) AS total,
         count(*) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_custkey, c.c_name, n.n_name
)
SELECT * FROM (
  SELECT t.*, row_number() OVER (ORDER BY total DESC, c_custkey) AS rank
  FROM t) s WHERE rank <= 20
"""

ORACLES["q_text_features"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5(concat(word, '#1')), 1, 15))::BIGINT AS hv
  FROM tok WHERE word <> ''
),
sums AS (
  SELECT doc_id, (hv % 16)::INTEGER AS dim,
         sum(CASE WHEN hv % 32 < 16 THEN 1.0 ELSE -1.0 END) AS v
  FROM h GROUP BY doc_id, dim
),
grid AS (
  SELECT d.doc_id, g.range::INTEGER AS dim
  FROM (SELECT DISTINCT doc_id FROM documents) d CROSS JOIN range(16) g
),
f AS (
  SELECT grid.doc_id, grid.dim, COALESCE(sums.v, 0.0) AS v
  FROM grid LEFT JOIN sums USING (doc_id, dim)
),
n AS (SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY doc_id)
SELECT f.doc_id, f.dim, round(f.v / greatest(n.nrm, 1e-12), 6) AS feat
FROM f JOIN n USING (doc_id)
"""

ORACLES["q_tfidf_topterms"] = """
WITH t AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
tok AS (SELECT doc_id, word FROM t WHERE word <> ''),
tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word,
         round(tf.tf * ln((SELECT n FROM n) * 1.0 / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq USING (word)
),
r AS (
  SELECT doc_id, word, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, word) AS rank
  FROM scored
)
SELECT doc_id, rank, word, tfidf FROM r WHERE rank <= 3
"""

ORACLES["q_winnow_pairs"] = """
WITH t AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word,
         generate_subscripts(
           string_split_regex(trim(lower(text)), '\\s+'), 1) AS pos
  FROM documents
),
tok AS MATERIALIZED (SELECT doc_id, word, pos FROM t WHERE word <> ''),
g AS (
  SELECT doc_id, pos,
         concat_ws(' ', word,
                   lead(word, 1) OVER wl,
                   lead(word, 2) OVER wl,
                   lead(word, 3) OVER wl) AS gram,
         lead(word, 3) OVER wl AS last_w
  FROM tok WINDOW wl AS (PARTITION BY doc_id ORDER BY pos)
),
gh AS MATERIALIZED (
  SELECT doc_id, pos,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
  FROM g WHERE last_w IS NOT NULL
),
wm AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         lead(h, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS h_full
  FROM gh
),
fps AS MATERIALIZED (
  SELECT DISTINCT doc_id, fp FROM wm WHERE h_full IS NOT NULL
),
ok AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 10000),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS shared
  FROM fps a
  JOIN ok ON ok.fp = a.fp
  JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, shared FROM p WHERE shared >= 3
"""


ORACLES["q_inverted_index"] = """
WITH t AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
tok AS (SELECT doc_id, word FROM t WHERE word <> '')
SELECT word,
       count(DISTINCT doc_id)::BIGINT AS df,
       count(*)::BIGINT AS tf_total,
       array_to_string(list_sort(list(DISTINCT doc_id))[1:100], ',')
         AS postings
FROM tok GROUP BY word
"""


def bm25_oracle() -> str:
    """Generated oracle for q_bm25: the VALUES clause is rendered from
    queries.BM25_QUERIES so the query terms live in exactly one place
    (ADVICE r04 — a hand-synced copy here broke silently on edit)."""
    return (
        _bm25_ctes()
        + "\nSELECT query_id, doc_id, rank, score FROM r WHERE rank <= 10"
    )


def _bm25_ctes() -> str:
    """The shared BM25 CTE chain (WITH … r AS (ranked)) — composed by
    bm25_oracle (final ranked select) and ndcg_oracle (which stacks
    the relevance/DCG CTEs on top of the same ranking)."""
    values = ", ".join(
        f"({qid}, '{term}')"
        for qid, terms in sorted(BM25_QUERIES.items())
        for term in terms
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
tok AS (SELECT doc_id, word FROM t WHERE word <> ''),
tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl
),
q(query_id, word) AS (VALUES {values}),
tfq AS (
  SELECT q.query_id, tf.doc_id, tf.word, tf.tf FROM tf JOIN q USING (word)
),
dfq AS (
  SELECT word, count(DISTINCT doc_id)::BIGINT AS df FROM tfq GROUP BY 1
),
scored AS (
  SELECT tfq.query_id, tfq.doc_id,
         round(ln(1.0 + ((s.n_docs - dfq.df) + 0.5) / (dfq.df + 0.5))
               * tfq.tf * 2.2
               / (tfq.tf + 1.2 * (0.25 + 0.75 *
                    (dl.dl / (s.sum_dl::DOUBLE / s.n_docs))))
               * 1e6)::BIGINT AS ti
  FROM tfq JOIN dfq USING (word) JOIN dl USING (doc_id), stats s
),
agg AS (
  SELECT query_id, doc_id, sum(ti)::BIGINT AS score_i
  FROM scored GROUP BY 1, 2
),
r AS (
  SELECT query_id, doc_id,
         round(score_i::DOUBLE / 1000000.0, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_i DESC, doc_id) AS rank
  FROM agg
)"""


def ndcg_oracle(k: int = 10) -> str:
    """Generated oracle for q_ndcg: the shared BM25 ranking CTEs plus
    rule-derived graded relevance (rel = total tf of the query's terms
    — a grade that differs from BM25's length-normalized score, so
    NDCG < 1 and discriminates; linear Järvelin gain, no 2^rel
    overflow) and micro-integer discounted gains - sums are exact
    longs, the final NDCG is one exactly-rounded double division, so
    both engines agree bit-for-bit (the bm25/dsir discipline)."""
    return (
        _bm25_ctes()
        + f""",
relv AS (
  SELECT q.query_id, d.doc_id, count(*)::INT AS rel
  FROM tok d JOIN q USING (word)
  GROUP BY 1, 2
),
dcg AS (
  SELECT r.query_id,
         sum(round(COALESCE(relv.rel, 0)::DOUBLE
                   / log2(r.rank + 1) * 1e6)::BIGINT) AS dcg_micro
  FROM r LEFT JOIN relv USING (query_id, doc_id)
  WHERE r.rank <= {k}
  GROUP BY 1
),
ideal AS (
  SELECT query_id, rel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id) AS pos
  FROM relv
),
idcg AS (
  SELECT query_id,
         sum(round(rel::DOUBLE
                   / log2(pos + 1) * 1e6)::BIGINT) AS idcg_micro
  FROM ideal WHERE pos <= {k} GROUP BY 1
)
SELECT dcg.query_id,
       round(dcg.dcg_micro::DOUBLE / idcg.idcg_micro, 6) AS ndcg,
       round(dcg.dcg_micro / 1e6, 6) AS dcg,
       round(idcg.idcg_micro / 1e6, 6) AS idcg
FROM dcg JOIN idcg USING (query_id)"""
    )


ORACLES["q_lm_score"] = """
WITH t AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word,
         generate_subscripts(
           string_split_regex(trim(lower(text)), '\\s+'), 1) AS pos
  FROM documents
),
tok AS MATERIALIZED (SELECT doc_id, word, pos FROM t WHERE word <> ''),
big AS (
  SELECT doc_id, word,
         lag(word) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tok
),
bg AS (SELECT doc_id, prev, word FROM big WHERE prev IS NOT NULL),
uni AS (SELECT word AS prev, count(*) AS uc FROM tok GROUP BY word),
bc AS (SELECT prev, word, count(*) AS bc FROM bg GROUP BY prev, word),
v AS (SELECT count(DISTINCT word)::DOUBLE AS v FROM tok),
scored AS (
  -- integer micro-units: order-independent exact sum, one final division
  SELECT bg.doc_id,
         round(ln((bc.bc + 1.0) / (uni.uc + (SELECT v FROM v)))
               * 1000000)::BIGINT AS lp6
  FROM bg JOIN bc USING (prev, word) JOIN uni USING (prev)
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round(sum(lp6) / (count(*) * 1000000.0), 6) AS lm_score
FROM scored GROUP BY doc_id
"""


ORACLES["q_media_meta"] = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum,
       lower(substring(hex(encode(text)), 1, 8)) AS magic_hex,
       octet_length(encode(text)) = length(text) AS is_ascii
FROM documents
"""

ORACLES["q_doc_chunks"] = """
WITH c AS (
  SELECT doc_id,
    list_transform(
      range(1, len(string_split_regex(trim(text), '\\s+')) + 1, 48),
      s -> array_to_string(
        (string_split_regex(trim(text), '\\s+'))[s:s + 63], ' ')
    ) AS chunks
  FROM documents
),
e AS (
  SELECT doc_id,
         unnest(chunks) AS chunk_text,
         generate_subscripts(chunks, 1) - 1 AS chunk_id
  FROM c
)
SELECT doc_id, chunk_id, chunk_text,
       len(string_split_regex(chunk_text, '\\s+')) AS n_chunk_tokens
FROM e WHERE chunk_text <> ''
"""

ORACLES["q_word_freq"] = """
WITH t AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
  FROM documents
)
SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM t WHERE word <> '' GROUP BY word
"""


def _lloyd_ctes(
    n_centroids: int, n_iters: int, init_stride: int
) -> list[str]:
    """Shared Lloyd-unrolled CTE block (assignment = rounded-cosine
    argmax; update = per-dim mean re-assembled in dim order, cast to
    FLOAT exactly like kmeans_centroids so both engines quantize the
    new centroids identically). Trained centroids land in
    cent{n_iters}; used by ann_kmeans_oracle and, as the trained
    coarse quantizer, by ann_ivfpq_oracle."""
    ctes = [f"""cent0 AS (
  SELECT centroid_id, cvec FROM (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id,
           embedding AS cvec
    FROM embeddings WHERE vec_id % {init_stride} = 0) s
  WHERE centroid_id < {n_centroids}
)"""]
    for i in range(1, n_iters + 1):
        ctes.append(f"""assign_km{i} AS (
  SELECT id, vec, centroid_id FROM (
    SELECT id, vec, centroid_id,
           row_number() OVER (PARTITION BY id
                              ORDER BY csim DESC, centroid_id) AS r
    FROM (
      SELECT e.vec_id AS id, e.embedding AS vec, c.centroid_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[],
                                          c.cvec::DOUBLE[]), 6) AS csim
      FROM embeddings e, cent{i - 1} c) s1) s2
  WHERE r = 1
),
upd{i} AS (
  SELECT centroid_id, (list(m ORDER BY dim))::FLOAT[] AS cvec FROM (
    SELECT centroid_id, dim, avg(val) AS m FROM (
      SELECT centroid_id, unnest(vec) AS val,
             generate_subscripts(vec, 1) AS dim
      FROM assign_km{i}) u1
    GROUP BY centroid_id, dim) u2
  GROUP BY centroid_id
),
cent{i} AS (
  SELECT * FROM upd{i}
  UNION ALL
  SELECT c.* FROM cent{i - 1} c
  LEFT JOIN upd{i} u USING (centroid_id) WHERE u.centroid_id IS NULL
)""")
    return ctes


def ann_kmeans_oracle(
    n_centroids: int = 20, n_iters: int = 2, init_stride: int = 25,
    k: int = 5, n_probe: int = 3,
) -> str:
    """Generated oracle for q_ann_kmeans: the Lloyd iterations unrolled
    as SQL CTEs (_lloyd_ctes), then the same 3-probe IVF search as
    q_ann_ivf."""
    ctes = _lloyd_ctes(n_centroids, n_iters, init_stride)
    final = f"""scored AS (
  SELECT e.vec_id AS id, e.embedding AS vec, c.centroid_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      c.cvec::DOUBLE[]), 6) AS csim
  FROM embeddings e, cent{n_iters} c
),
assign AS (
  SELECT id, vec, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY csim DESC, centroid_id) AS r
    FROM scored) s WHERE r = 1
),
probe AS (
  SELECT id AS query_id, vec AS qvec, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY csim DESC, centroid_id) AS r
    FROM scored WHERE id < 10) s WHERE r <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.id AS neighbor_id,
         round(list_cosine_similarity(p.qvec::DOUBLE[],
                                      a.vec::DOUBLE[]), 6) AS sim
  FROM assign a JOIN probe p ON a.centroid_id = p.centroid_id
  WHERE a.id <> p.query_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM cand
)"""
    return (
        "WITH " + ",\n".join(ctes) + ",\n" + final
        + f"\nSELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= {k}"
    )


def pagerank_oracle(n_iters: int = 5, damping: float = 0.85) -> str:
    """Generated oracle for q_pagerank: the PageRank recurrence unrolled
    as one plain aggregate-join CTE per iteration (DuckDB's recursive
    CTEs prohibit GROUP BY in the recursive term, so unrolling IS the
    honest SQL expression of a fixed-iteration rank)."""
    from sitecrawler_spark.queries import PAGERANK_EDGES_SQL

    base = 1.0 - damping
    ctes = [
        f"nodes AS (SELECT doc_id AS id FROM documents)",
        f"nn AS (SELECT count(*) AS n FROM documents)",
        f"edges AS ({PAGERANK_EDGES_SQL})",
        "deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        ctes.append(f"""r{i} AS (
  SELECT nodes.id,
         {base} / (SELECT n FROM nn)
         + {damping} * COALESCE(s.s, 0) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, sum(r{i - 1}.rank / deg.out_deg) AS s
    FROM edges e
    JOIN r{i - 1} ON r{i - 1}.id = e.src
    JOIN deg ON deg.src = e.src
    GROUP BY e.dst) s USING (id)
)""")
        # noqa: the join on deg is per-edge constant lookup
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id AS doc_id, round(rank, 6) AS rank FROM r{n_iters}"
    )


def trustrank_oracle(
    n_iters: int = 5, damping: float = 0.85, seed_mod: int = 13
) -> str:
    """Generated oracle for q_trustrank: the TrustRank recurrence
    (Gyöngyi 2004 §4.3) unrolled as one aggregate-join CTE per
    iteration — pagerank_oracle's pattern with the uniform teleport
    replaced by the normalized seed indicator d. ``base`` is
    interpolated via Python float repr so both engines multiply by the
    identical IEEE double (1.0 - 0.85 != 0.15 exactly)."""
    from sitecrawler_spark.queries import PAGERANK_EDGES_SQL

    base = 1.0 - damping
    ctes = [
        "nodes AS (SELECT doc_id AS id FROM documents)",
        f"edges AS ({PAGERANK_EDGES_SQL})",
        "deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)",
        f"seeds AS (SELECT id FROM nodes WHERE id % {seed_mod} = 0)",
        "ns AS (SELECT count(*) AS n FROM seeds)",
        """dvec AS (
  SELECT nodes.id,
         CASE WHEN seeds.id IS NOT NULL
              THEN 1.0 / (SELECT n FROM ns) ELSE 0.0 END AS d
  FROM nodes LEFT JOIN seeds USING (id)
)""",
        "t0 AS (SELECT id, d AS trust FROM dvec)",
    ]
    for i in range(1, n_iters + 1):
        ctes.append(f"""t{i} AS (
  SELECT dvec.id,
         {base} * dvec.d
         + {damping} * COALESCE(s.s, 0) AS trust
  FROM dvec LEFT JOIN (
    SELECT e.dst AS id, sum(t{i - 1}.trust / deg.out_deg) AS s
    FROM edges e
    JOIN t{i - 1} ON t{i - 1}.id = e.src
    JOIN deg ON deg.src = e.src
    GROUP BY e.dst) s USING (id)
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id AS doc_id, round(trust, 6) AS trust FROM t{n_iters}"
    )


def hits_oracle(n_iters: int = 5) -> str:
    """Generated oracle for q_hits: the HITS recurrence unrolled as two
    aggregate-join CTEs per iteration (authority from hubs, hubs from
    the fresh authorities), max-normalized and rounded 9dp per pass —
    the identical iteration contract the Spark operator pins, so the
    fixpoint matches bit-for-bit."""
    from sitecrawler_spark.queries import PAGERANK_EDGES_SQL

    ctes = [
        "nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents)",
        f"edges AS MATERIALIZED ({PAGERANK_EDGES_SQL})",
        "h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        ctes.append(f"""a{i}r AS MATERIALIZED (
  SELECT e.dst AS id, sum(h{i - 1}.hub) AS s
  FROM edges e JOIN h{i - 1} ON h{i - 1}.id = e.src GROUP BY e.dst
)""")
        ctes.append(f"""a{i} AS MATERIALIZED (
  SELECT nodes.id,
         round(COALESCE(s, 0) / (SELECT max(s) FROM a{i}r), 9) AS auth
  FROM nodes LEFT JOIN a{i}r USING (id)
)""")
        ctes.append(f"""h{i}r AS MATERIALIZED (
  SELECT e.src AS id, sum(a{i}.auth) AS s
  FROM edges e JOIN a{i} ON a{i}.id = e.dst GROUP BY e.src
)""")
        ctes.append(f"""h{i} AS MATERIALIZED (
  SELECT nodes.id,
         round(COALESCE(s, 0) / (SELECT max(s) FROM h{i}r), 9) AS hub
  FROM nodes LEFT JOIN h{i}r USING (id)
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT h.id AS doc_id, round(h.hub, 6) AS hub,
       round(a.auth, 6) AS authority
FROM h{n_iters} h JOIN a{n_iters} a ON a.id = h.id"""
    )


def embed_neardup_oracle(
    dim: int = 64, n_planes: int = 3, n_tables: int = 6,
    threshold: float = 0.4,
) -> str:
    """Generated oracle for q_embed_neardup: mirrors multi-table SRP
    bucketing with plane literals from the SAME deterministic
    _hyperplane the Spark side uses."""
    from sitecrawler_spark.dedup.ann import _hyperplane

    def bucket_expr(table: int) -> str:
        terms = []
        for p in range(n_planes):
            plane = _hyperplane(dim, table * 1000 + p)
            lit = "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"
            terms.append(
                f"CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 "
                f"THEN {1 << p} ELSE 0 END"
            )
        return " + ".join(terms)

    per_table = [
        f"SELECT vec_id, embedding, {t} AS tbl, {bucket_expr(t)} AS bucket "
        f"FROM embeddings"
        for t in range(n_tables)
    ]
    return f"""
WITH b AS ({' UNION ALL '.join(per_table)}),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM b x JOIN b y
    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]), 6) AS sim
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.id_a
  JOIN embeddings e ON e.vec_id = c.id_b
)
SELECT id_a, id_b, sim FROM scored WHERE sim >= {threshold}
"""


ORACLES["q_span_media_align"] = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
         generate_subscripts(string_split(text,' '),1)-1 AS i
  FROM documents
), k AS (
  SELECT doc_id, i, tok,
     CASE WHEN i%5=0 THEN 'anchor' WHEN i%7=0 THEN 'media' ELSE 'text' END AS kind
  FROM t
), ctx AS (
  SELECT doc_id, i, tok, kind,
    last_value(CASE WHEN kind='text' THEN tok END IGNORE NULLS) OVER
      (PARTITION BY doc_id ORDER BY i
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_text,
    first_value(CASE WHEN kind='text' THEN tok END IGNORE NULLS) OVER
      (PARTITION BY doc_id ORDER BY i
       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_text
  FROM k
)
SELECT doc_id, i::BIGINT AS offset, concat('ref://', tok) AS media_ref,
       prev_text, next_text
FROM ctx WHERE kind='media'
"""


ORACLES["q_sequence_packing"] = """
WITH d AS (
  SELECT doc_id, source, len(string_split(text,' ')) AS ntok FROM documents
), c AS (
  SELECT doc_id, source, ntok,
    sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS cum_before
  FROM d
)
SELECT source, floor(cum_before / 256)::BIGINT AS seq_id,
       count(*)::BIGINT AS n_docs, sum(ntok)::BIGINT AS tokens,
       sum(CASE WHEN floor(cum_before / 256) <> floor((cum_before + ntok - 1) / 256)
                THEN 1 ELSE 0 END)::BIGINT AS boundary_crossings
FROM c GROUP BY 1,2
"""


ORACLES["q_decontamination"] = """
WITH toks AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
g0 AS (SELECT doc_id, ts, generate_subscripts(ts,1) AS j, unnest(ts) FROM toks),
grams AS (SELECT doc_id, array_to_string(list_slice(ts, j, j+2), ' ') AS g
          FROM g0 WHERE j + 2 <= len(ts)),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
SELECT doc_id, count(DISTINCT g)::BIGINT AS n_hits
FROM grams JOIN bench USING (g)
WHERE doc_id % 97 <> 0
GROUP BY 1
"""


# the bloom-routed variant is EXACT by construction (bloom negatives
# definite, positives re-verified) — its oracle IS the broadcast
# path's, turning the no-broadcast scale route into a gated equivalence
ORACLES["q_decontaminate_bloom"] = ORACLES["q_decontamination"]


ORACLES["q_stratified_sample"] = """
WITH h AS (
  SELECT lang, doc_id,
         ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT AS hk
  FROM documents
), r AS (
  SELECT lang, doc_id, hk,
         row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
  FROM h
)
SELECT lang, doc_id, rk::BIGINT AS rk FROM r WHERE rk <= 3
"""


ORACLES["q_mix_weights"] = """
WITH s AS (SELECT source, sum(len(string_split(text,' ')))::BIGINT AS tokens
           FROM documents GROUP BY 1),
t AS (SELECT source, tokens, sqrt(tokens) AS w FROM s)
SELECT source, tokens, round(w / sum(w) OVER (), 6) AS weight,
       round((w / sum(w) OVER ()) * 1000000 / tokens, 6) AS epochs
FROM t
"""


ORACLES["q_incremental_dedup"] = f"""
WITH sigs AS (
  SELECT doc_id AS id, doc_id % 3 = 0 AS is_batch,
         [{', '.join(_minhash_j(j) for j in range(8))}] AS sig
  FROM documents
),
bands AS (
  SELECT id, is_batch, unnest([
    concat_ws('_', 0, sig[1], sig[2]),
    concat_ws('_', 1, sig[3], sig[4]),
    concat_ws('_', 2, sig[5], sig[6]),
    concat_ws('_', 3, sig[7], sig[8])
  ]) AS band_key
  FROM sigs
)
,
-- mirror the engine's corpus-side skew cap (banded_pairs_against
-- max_bucket_size=10000): an over-cap corpus bucket is excluded on
-- BOTH sides of the gate, so the cap can never silently diverge at a
-- scale factor where a bucket crosses it (ADVICE r03)
corpus_ok AS (
  SELECT band_key FROM bands WHERE NOT is_batch
  GROUP BY band_key HAVING count(*) <= 10000
)
SELECT DISTINCT a.id AS batch_id, b.id AS corpus_id
FROM bands a
JOIN bands b ON a.band_key = b.band_key
JOIN corpus_ok c ON b.band_key = c.band_key
WHERE a.is_batch AND NOT b.is_batch
"""


ORACLES["q_ann_filtered"] = """
WITH p AS (SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
           FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.qvec::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim
  FROM embeddings e, p
  WHERE e.vec_id <> p.query_id AND e.label = p.qlabel
),
r AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5
"""


ORACLES["q_quality_filter"] = """
WITH q AS (__QUALITY_SQL__),
l AS (SELECT d.lang, q.doc_id, q.quality
      FROM q JOIN documents d USING (doc_id)),
r AS (SELECT lang, doc_id, quality,
        row_number() OVER (PARTITION BY lang
                           ORDER BY quality DESC, doc_id) AS rn,
        count(*) OVER (PARTITION BY lang) AS n
      FROM l)
SELECT lang, doc_id, quality FROM r WHERE rn <= ceil(n / 2.0)
"""


ORACLES["q_events_session_windows"] = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                OR epoch(ts) - epoch(prev_ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sess AS (
  SELECT user_id, ts,
         (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS sid
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


# q_quality_filter reuses the exact quality expression as a CTE
ORACLES["q_quality_filter"] = ORACLES["q_quality_filter"].replace(
    "__QUALITY_SQL__", ORACLES["q_quality_score"].strip()
)


ORACLES["q_events_asof"] = """
WITH a AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'click'),
b AS (SELECT user_id, ts AS vts, event_id AS vid FROM events
      WHERE event_type = 'view')
SELECT a.user_id, a.event_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       b.vid AS view_event_id,
       strftime(b.vts, '%Y-%m-%d %H:%M:%S') AS view_ts
FROM a ASOF LEFT JOIN b
  ON a.user_id = b.user_id AND b.vts <= a.ts
"""


ORACLES["q_events_asof_tolerance"] = """
WITH a AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'click'),
b AS (SELECT user_id, ts AS vts, event_id AS vid FROM events
      WHERE event_type = 'view')
SELECT a.user_id, a.event_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       m.vid AS view_event_id,
       strftime(m.vts, '%Y-%m-%d %H:%M:%S') AS view_ts
FROM a LEFT JOIN LATERAL (
  SELECT b.vid, b.vts FROM b
  WHERE b.user_id = a.user_id
    AND abs(epoch(b.vts) - epoch(a.ts)) <= 600
  ORDER BY abs(epoch(b.vts) - epoch(a.ts)) ASC,
           CASE WHEN b.vts <= a.ts THEN 0 ELSE 1 END ASC
  LIMIT 1
) m ON true
"""


ORACLES["q_events_range_join"] = """
WITH intervals AS (
  SELECT event_id AS interval_id, ts AS lo,
         ts + INTERVAL 2 HOUR AS hi
  FROM events WHERE event_id % 97 = 0
)
SELECT e.event_id, i.interval_id
FROM events e JOIN intervals i
  ON e.ts >= i.lo AND e.ts < i.hi
"""


ORACLES["q_cms_word_counts"] = """
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
cells AS (
  SELECT j, ('0x' || substr(md5(concat('cms' || j || ':', word)), 1, 15))::BIGINT % 64 AS bucket,
         count(*) AS c
  FROM w, (VALUES (0), (1), (2)) rows(j)
  GROUP BY 1, 2
),
items AS (SELECT DISTINCT word FROM w)
SELECT i.word,
       least(coalesce(c0.c, 0), coalesce(c1.c, 0), coalesce(c2.c, 0)) AS est
FROM items i
LEFT JOIN cells c0 ON c0.j = 0 AND c0.bucket = ('0x' || substr(md5(concat('cms0:', i.word)), 1, 15))::BIGINT % 64
LEFT JOIN cells c1 ON c1.j = 1 AND c1.bucket = ('0x' || substr(md5(concat('cms1:', i.word)), 1, 15))::BIGINT % 64
LEFT JOIN cells c2 ON c2.j = 2 AND c2.bucket = ('0x' || substr(md5(concat('cms2:', i.word)), 1, 15))::BIGINT % 64
"""


# q_cms_merge_rollup's Spark side merges parity-split PARTIAL sketches;
# the oracle is the DIRECT single-pass build — hash equality is the
# cross-engine merge-algebra proof (see queries.q_cms_merge_rollup)
ORACLES["q_cms_merge_rollup"] = ORACLES["q_cms_word_counts"]


ORACLES["q_hll_distinct_users"] = """
WITH u AS (SELECT DISTINCT user_id::VARCHAR AS u FROM events),
hv AS (
  SELECT (('0x' || substr(md5(u), 1, 15))::BIGINT >> 54) AS bucket,
         ((('0x' || substr(md5(u), 1, 15))::BIGINT & 18014398509481983) >> 38) AS v
  FROM u
),
regs AS (
  SELECT bucket, max((CASE WHEN v >= 32768 THEN 1 WHEN v >= 16384 THEN 2 WHEN v >= 8192 THEN 3 WHEN v >= 4096 THEN 4 WHEN v >= 2048 THEN 5 WHEN v >= 1024 THEN 6 WHEN v >= 512 THEN 7 WHEN v >= 256 THEN 8 WHEN v >= 128 THEN 9 WHEN v >= 64 THEN 10 WHEN v >= 32 THEN 11 WHEN v >= 16 THEN 12 WHEN v >= 8 THEN 13 WHEN v >= 4 THEN 14 WHEN v >= 2 THEN 15 WHEN v >= 1 THEN 16 ELSE 17 END)) AS reg FROM hv GROUP BY bucket
),
agg AS (
  SELECT sum(power(2.0, -reg)) AS s, count(*) AS nonzero FROM regs
),
est AS (
  SELECT CASE WHEN (2905.460551022604) / (s + (64 - nonzero)) <= 160.0
              AND (64 - nonzero) > 0
         THEN 64.0 * ln(64.0 / (64 - nonzero))
         ELSE (2905.460551022604) / (s + (64 - nonzero)) END AS e
  FROM agg
)
SELECT round(e, 4) AS est,
       (SELECT count(DISTINCT user_id) FROM events) AS exact_distinct
FROM est
"""


ORACLES["q_hll_merge_rollup"] = """
WITH u AS (
  SELECT DISTINCT event_type, event_id::VARCHAR AS u FROM events
),
hv AS (
  SELECT event_type,
         (('0x' || substr(md5(u), 1, 15))::BIGINT >> 54) AS bucket,
         ((('0x' || substr(md5(u), 1, 15))::BIGINT & 18014398509481983) >> 38) AS v
  FROM u
),
regs AS (
  SELECT event_type, bucket,
         max((CASE WHEN v >= 32768 THEN 1 WHEN v >= 16384 THEN 2 WHEN v >= 8192 THEN 3 WHEN v >= 4096 THEN 4 WHEN v >= 2048 THEN 5 WHEN v >= 1024 THEN 6 WHEN v >= 512 THEN 7 WHEN v >= 256 THEN 8 WHEN v >= 128 THEN 9 WHEN v >= 64 THEN 10 WHEN v >= 32 THEN 11 WHEN v >= 16 THEN 12 WHEN v >= 8 THEN 13 WHEN v >= 4 THEN 14 WHEN v >= 2 THEN 15 WHEN v >= 1 THEN 16 ELSE 17 END)) AS reg
  FROM hv GROUP BY event_type, bucket
),
merged AS (
  SELECT bucket, max(reg) AS reg FROM regs GROUP BY bucket
),
agg_t AS (
  SELECT event_type, sum(power(2.0, -reg)) AS s, count(*) AS nonzero
  FROM regs GROUP BY event_type
),
agg_m AS (
  SELECT sum(power(2.0, -reg)) AS s, count(*) AS nonzero FROM merged
),
est_t AS (
  SELECT event_type AS scope,
         CASE WHEN (2905.460551022604) / (s + (64 - nonzero)) <= 160.0
              AND (64 - nonzero) > 0
         THEN 64.0 * ln(64.0 / (64 - nonzero))
         ELSE (2905.460551022604) / (s + (64 - nonzero)) END AS e
  FROM agg_t
),
est_m AS (
  SELECT 'ALL' AS scope,
         CASE WHEN (2905.460551022604) / (s + (64 - nonzero)) <= 160.0
              AND (64 - nonzero) > 0
         THEN 64.0 * ln(64.0 / (64 - nonzero))
         ELSE (2905.460551022604) / (s + (64 - nonzero)) END AS e
  FROM agg_m
)
SELECT scope, round(e, 4) AS est FROM est_t
UNION ALL
SELECT scope, round(e, 4) AS est FROM est_m
"""


def ann_pq_oracle(
    dim: int = 64, m_sub: int = 4, k_cent: int = 8, stride: int = 61,
    k: int = 5,
) -> str:
    """Generated oracle for q_ann_pq: product-quantization encode + ADC
    mirrored in DuckDB. Codebooks are the same deterministic
    stride-sampled subvectors; inner dot/L2 sums run in identical
    element order (list_sum over an ordered transform ≙ Spark's ordered
    zip_with fold) and the ADC total is the same explicit
    left-associated t0+t1+...+t{M-1}, so results are bit-identical."""
    dsub = dim // m_sub

    def l2(off: int) -> str:
        return (
            f"round(list_sum(list_transform(range(1, {dsub + 1}), i -> "
            f"((e.embedding[{off} + i])::DOUBLE - c.cvec[{off} + i]) * "
            f"((e.embedding[{off} + i])::DOUBLE - c.cvec[{off} + i]))), 6)"
        )

    def dot(off: int) -> str:
        return (
            f"round(list_sum(list_transform(range(1, {dsub + 1}), i -> "
            f"(q.embedding[{off} + i])::DOUBLE * c.cvec[{off} + i])), 6)"
        )

    ctes = [f"""cb AS (
  SELECT cid, cvec FROM (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
           embedding::DOUBLE[] AS cvec
    FROM embeddings WHERE vec_id % {stride} = 0) s
  WHERE cid < {k_cent}
)"""]
    for m in range(m_sub):
        off = m * dsub
        ctes.append(f"""enc{m} AS (
  SELECT vec_id, cid AS code{m} FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS r
    FROM (
      SELECT e.vec_id, c.cid, {l2(off)} AS d
      FROM embeddings e, cb c) s1) s2
  WHERE r = 1
)""")
        ctes.append(f"""tab{m} AS (
  SELECT q.vec_id AS query_id, c.cid, {dot(off)} AS t
  FROM embeddings q, cb c WHERE q.vec_id < 10
)""")
    codes_join = " JOIN ".join(
        [f"enc0"] + [f"enc{m} USING (vec_id)" for m in range(1, m_sub)]
    )
    tab_joins = "\n  ".join(
        f"JOIN tab{m} t{m} ON t{m}.query_id = t0.query_id "
        f"AND t{m}.cid = e.code{m}"
        for m in range(1, m_sub)
    )
    adc = " + ".join(f"t{m}.t" for m in range(m_sub))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
codes AS (SELECT * FROM {codes_join}),
scored AS (
  SELECT t0.query_id, e.vec_id AS neighbor_id, {adc} AS adc
  FROM codes e
  JOIN tab0 t0 ON t0.cid = e.code0
  {tab_joins}
  WHERE t0.query_id <> e.vec_id
),
r AS (
  SELECT query_id, neighbor_id, round(adc, 6) AS adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, adc FROM r WHERE rank <= {k}
"""
    )


def ann_ivfpq_oracle(
    dim: int = 64, m_sub: int = 4, k_cent: int = 8, stride: int = 61,
    k: int = 5, centroid_stride: int = 25, n_probe: int = 3,
    by_residual: bool = False, trained_coarse: bool = False,
    coarse_k: int = 20, coarse_iters: int = 2, coarse_init_stride: int = 25,
) -> str:
    """Generated oracle for q_ann_ivfpq (and the by_residual variant):
    IVFADC mirrored in DuckDB — the q_ann_ivf oracle's coarse
    assign/probe CTEs compose with the q_ann_pq oracle's
    codebook/encode/ADC CTEs; candidates are the probed inverted lists
    only. by_residual quantizes vec − coarse_centroid and adds the
    exact q·c_list coarse term. trained_coarse swaps the sampled
    coarse quantizer for Lloyd-trained centroids (_lloyd_ctes — the
    FAISS pattern of a trained quantizer feeding the IVFPQ index).
    Same element-ordered sums, same explicit left-associated ADC
    total, bit-identical."""
    dsub = dim // m_sub

    def l2(off: int) -> str:
        if by_residual:
            return (
                f"round(list_sum(list_transform(range(1, {dsub + 1}), i -> "
                f"(e.rvec[{off} + i] - c.cvec[{off} + i]) * "
                f"(e.rvec[{off} + i] - c.cvec[{off} + i]))), 6)"
            )
        return (
            f"round(list_sum(list_transform(range(1, {dsub + 1}), i -> "
            f"((e.embedding[{off} + i])::DOUBLE - c.cvec[{off} + i]) * "
            f"((e.embedding[{off} + i])::DOUBLE - c.cvec[{off} + i]))), 6)"
        )

    def dot(off: int) -> str:
        return (
            f"round(list_sum(list_transform(range(1, {dsub + 1}), i -> "
            f"(q.embedding[{off} + i])::DOUBLE * c.cvec[{off} + i])), 6)"
        )

    if by_residual:
        cb_cte = f"""res AS (
  SELECT e.vec_id, a.centroid_id,
         list_transform(range(1, {dim + 1}), i ->
           (e.embedding[i])::DOUBLE - (c.ccvec[i])::DOUBLE) AS rvec
  FROM embeddings e
  JOIN assign a ON a.id = e.vec_id
  JOIN cent c ON c.centroid_id = a.centroid_id
),
cb AS (
  SELECT cid, cvec FROM (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
           rvec AS cvec
    FROM res WHERE vec_id % {stride} = 0) s
  WHERE cid < {k_cent}
)"""
    else:
        cb_cte = f"""cb AS (
  SELECT cid, cvec FROM (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
           embedding::DOUBLE[] AS cvec
    FROM embeddings WHERE vec_id % {stride} = 0) s
  WHERE cid < {k_cent}
)"""
    if trained_coarse:
        ctes = _lloyd_ctes(coarse_k, coarse_iters, coarse_init_stride)
        ctes.append(f"""cent AS (
  SELECT centroid_id, cvec AS ccvec FROM cent{coarse_iters}
)""")
    else:
        ctes = [f"""cent AS (
  SELECT vec_id AS centroid_id, embedding AS ccvec
  FROM embeddings WHERE vec_id % {centroid_stride} = 0
)"""]
    ctes += ["""cscored AS (
  SELECT e.vec_id AS id, c.centroid_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      c.ccvec::DOUBLE[]), 6) AS csim
  FROM embeddings e, cent c
)""", """assign AS (
  SELECT id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY csim DESC, centroid_id) AS r
    FROM cscored) WHERE r = 1
)""", f"""probe AS (
  SELECT id AS query_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY csim DESC, centroid_id) AS r
    FROM cscored WHERE id < 10) WHERE r <= {n_probe}
)"""]
    ctes.append(cb_cte)
    if by_residual:
        ctes.append(f"""coarse AS (
  SELECT q.vec_id AS query_id, c.centroid_id,
         round(list_sum(list_transform(range(1, {dim + 1}), i ->
           (q.embedding[i])::DOUBLE * (c.ccvec[i])::DOUBLE)), 6) AS tc
  FROM embeddings q, cent c WHERE q.vec_id < 10
)""")
    enc_src = "res e" if by_residual else "embeddings e"
    for m in range(m_sub):
        off = m * dsub
        ctes.append(f"""enc{m} AS (
  SELECT vec_id, cid AS code{m} FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS r
    FROM (
      SELECT e.vec_id, c.cid, {l2(off)} AS d
      FROM {enc_src}, cb c) s1) s2
  WHERE r = 1
)""")
        ctes.append(f"""tab{m} AS (
  SELECT q.vec_id AS query_id, c.cid, {dot(off)} AS t
  FROM embeddings q, cb c WHERE q.vec_id < 10
)""")
    codes_join = " JOIN ".join(
        ["enc0"] + [f"enc{m} USING (vec_id)" for m in range(1, m_sub)]
    )
    tab_joins = "\n  ".join(
        f"JOIN tab{m} t{m} ON t{m}.query_id = p.query_id "
        f"AND t{m}.cid = e.code{m}"
        for m in range(m_sub)
    )
    adc = " + ".join(f"t{m}.t" for m in range(m_sub))
    coarse_join = ""
    if by_residual:
        adc = "cc.tc + " + adc
        coarse_join = (
            "JOIN coarse cc ON cc.query_id = p.query_id "
            "AND cc.centroid_id = a.centroid_id\n  "
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
codes AS (SELECT * FROM {codes_join}),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id, {adc} AS adc
  FROM codes e
  JOIN assign a ON a.id = e.vec_id
  JOIN probe p ON p.centroid_id = a.centroid_id
  {coarse_join}{tab_joins}
  WHERE p.query_id <> e.vec_id
),
r AS (
  SELECT query_id, neighbor_id, round(adc, 6) AS adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, adc FROM r WHERE rank <= {k}
"""
    )


def crawl_e2e_oracle() -> str:
    """Oracle for q_crawl_e2e: run the single-threaded reference model
    (pure Python, no Spark) over the same deterministic site and emit
    its visit order as a VALUES literal DuckDB can SELECT. The model and
    the engine are independent implementations of the reference's crawl
    semantics, so the hash compare is a real cross-check — SQL itself
    cannot express the cyclic crawl dataflow."""
    from sitecrawler_spark.crawl.model import ReferenceCrawlModel
    from sitecrawler_spark.queries import crawl_e2e_setup

    rows, cfg, seeds = crawl_e2e_setup()
    res = ReferenceCrawlModel(cfg, rows).crawl(seeds)
    vals = []
    for i, url in enumerate(res.visit_order):
        page = res.pages[i]
        assert page["url"] == url, "model pages/visit_order misaligned"
        ec = page["error_code"]
        ec_sql = "CAST(NULL AS INTEGER)" if ec is None else f"CAST({ec} AS INTEGER)"
        u = url.replace("'", "''")
        vals.append(f"(CAST({i + 1} AS INTEGER), '{u}', {ec_sql})")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(vals)
        + ") AS t(visit_rank, full_url, error_code)"
    )


def crawl_to_corpus_oracle() -> str:
    """Oracle for q_crawl_to_corpus: the CRAWL comes from the
    independent single-threaded reference model (crawl/model.py — SQL
    cannot express the cyclic dataflow, same argument as
    crawl_e2e_oracle); its spans-bearing pages in visit order become a
    VALUES table of (doc_id, host, line_id, line), and every PIPELINE
    stage is an independent SQL re-implementation composed as CTEs:
    per-host boilerplate strip → quality/lang/Gopher gate (the
    q_training_pipeline / q_gopher_quality fragments) → exact dedup →
    minhash-LSH + recursive-CTE components → 8-gram decontamination
    (eval slice doc_id%11=0) → 128-token concat-and-split packing."""
    from sitecrawler_spark.crawl.model import ReferenceCrawlModel
    from sitecrawler_spark.queries import crawl_to_corpus_setup

    rows, cfg, seeds = crawl_to_corpus_setup()
    res = ReferenceCrawlModel(cfg, rows).crawl(seeds)
    vals = []
    doc_id = 0
    for i, url in enumerate(res.visit_order):
        page = res.pages[i]
        assert page["url"] == url, "model pages/visit_order misaligned"
        if page["spans"] is None:
            continue
        doc_id += 1
        host = url.split("/")[2]
        line_id = 0
        for s in page["spans"]:
            if s["kind"] != "text":
                continue
            line = s["text"].replace("'", "''")
            vals.append(
                f"({doc_id}, '{host}', {line_id}, '{line}')"
            )
            line_id += 1
    values = ", ".join(vals)
    return f"""
WITH RECURSIVE p(doc_id, host, line_id, line) AS (VALUES {values}),
hostc AS (
  SELECT host, count(DISTINCT doc_id) AS host_docs FROM p GROUP BY 1
),
lf AS (
  SELECT host, line, count(DISTINCT doc_id) AS n_docs_line
  FROM p GROUP BY 1, 2
),
bp AS (
  SELECT lf.host, lf.line FROM lf JOIN hostc USING (host)
  WHERE n_docs_line >= 3 AND 5 * n_docs_line > host_docs
),
keptl AS (
  SELECT p.* FROM p LEFT JOIN bp ON p.host = bp.host AND p.line = bp.line
  WHERE bp.line IS NULL
),
docs0 AS (
  SELECT doc_id, host, string_agg(line, ' ' ORDER BY line_id) AS text
  FROM keptl GROUP BY 1, 2
),
scored AS (
  SELECT doc_id, host, text,
    round(
      least(length(text) / 500.0, 1.0) * 0.3
    + least({_stopcount('en')}
        / greatest(CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END, 1.0) * 4.0,
        1.0) * 0.4
    + (1.0 - least(len(regexp_extract_all(text, '{_PUNCT_RE}'))
        / greatest(length(text), 1.0) * 10.0, 1.0)) * 0.2
    + (1.0 - least(len(regexp_extract_all(text, '[A-Z]'))
        / greatest(length(text), 1.0) * 10.0, 1.0)) * 0.1
    , 4) AS quality,
    CASE WHEN greatest({_stopcount('en')}, {_stopcount('fr')},
                       {_stopcount('de')}, {_stopcount('es')}) = 0 THEN 'und'
         WHEN {_stopcount('en')} = greatest({_stopcount('en')}, {_stopcount('fr')},
                       {_stopcount('de')}, {_stopcount('es')}) THEN 'en'
         WHEN {_stopcount('fr')} = greatest({_stopcount('en')}, {_stopcount('fr')},
                       {_stopcount('de')}, {_stopcount('es')}) THEN 'fr'
         WHEN {_stopcount('de')} = greatest({_stopcount('en')}, {_stopcount('fr')},
                       {_stopcount('de')}, {_stopcount('es')}) THEN 'de'
         ELSE 'es' END AS lang_pred,
    (CASE WHEN trim(text) = '' THEN 0
          ELSE len(string_split_regex(trim(text), '\\s+')) END)::BIGINT
      AS n_tokens,
    round(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                  x -> length(x)))::DOUBLE
          / greatest(len(string_split_regex(trim(text), '\\s+')),
                     1)::DOUBLE, 6) AS mwl,
    ({_stopcount('en')})::BIGINT AS stops
  FROM docs0
),
gated AS (
  SELECT doc_id, host, text, n_tokens FROM scored
  WHERE quality >= 0.5 AND lang_pred = 'en' AND n_tokens >= 20
    AND mwl >= 3.0 AND mwl <= 10.0 AND stops >= 2
),
uniqd AS (
  SELECT doc_id, host, text, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY md5({_NORM})
                                 ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1
),
sigs AS (
  SELECT doc_id AS id,
         [{', '.join(_pipe_minhash_j(j) for j in range(16))}] AS sig
  FROM uniqd
),
bands AS (
  SELECT id, unnest([
    concat_ws('_', 0, sig[1], sig[2], sig[3], sig[4]),
    concat_ws('_', 1, sig[5], sig[6], sig[7], sig[8]),
    concat_ws('_', 2, sig[9], sig[10], sig[11], sig[12]),
    concat_ws('_', 3, sig[13], sig[14], sig[15], sig[16])
  ]) AS band_key
  FROM sigs
),
edges AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.id < b.id
),
und AS (
  SELECT id_a AS s, id_b AS d FROM edges
  UNION SELECT id_b, id_a FROM edges
),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM uniqd
  UNION
  SELECT u.d, reach.lbl FROM reach JOIN und u ON u.s = reach.id
),
comp AS (
  SELECT id, min(lbl) AS component_id FROM reach GROUP BY id
),
canon AS (
  SELECT u.doc_id, u.host, u.text, u.n_tokens
  FROM comp JOIN uniqd u ON u.doc_id = comp.id
  WHERE comp.id = comp.component_id
),toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM canon),
g0 AS (
  SELECT doc_id, ts, generate_subscripts(ts, 1) AS j, unnest(ts) FROM toks
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(ts, j, j + 7), ' ') AS g
  FROM g0 WHERE j + 7 <= len(ts)
),
evalg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 11 = 0),
contaminated AS (
  SELECT DISTINCT grams.doc_id FROM grams JOIN evalg USING (g)
  WHERE grams.doc_id % 11 <> 0
),
clean AS (
  SELECT c.* FROM canon c
  WHERE c.doc_id % 11 <> 0
    AND c.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
cum AS (
  SELECT doc_id, host, n_tokens,
    sum(n_tokens) OVER (PARTITION BY host ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      AS cum_before
  FROM clean
)
SELECT host, floor(cum_before / 128)::BIGINT AS seq_id,
       count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS tokens,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_list
FROM cum GROUP BY 1, 2
"""


def crawl_e2e_budgeted_oracle() -> str:
    """Oracle for q_crawl_e2e_budgeted: the pure-Python wave-mode model
    (ReferenceCrawlModel.crawl_budgeted — list/dict implementation of
    the engine's target-only politeness semantics) rendered as a VALUES
    literal. Independent of the DataFrame engine; hash-compared by the
    driver."""
    from sitecrawler_spark.crawl.model import ReferenceCrawlModel
    from sitecrawler_spark.queries import crawl_e2e_budgeted_setup

    rows, cfg, seeds = crawl_e2e_budgeted_setup()
    res = ReferenceCrawlModel(cfg, rows).crawl_budgeted(
        seeds, budget=cfg.politeness_budget
    )
    vals = []
    for i, url in enumerate(res.visit_order):
        page = res.pages[i]
        assert page["url"] == url, "model pages/visit_order misaligned"
        ec = page["error_code"]
        ec_sql = "CAST(NULL AS INTEGER)" if ec is None else f"CAST({ec} AS INTEGER)"
        u = url.replace("'", "''")
        vals.append(f"(CAST({i + 1} AS INTEGER), '{u}', {ec_sql})")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(vals)
        + ") AS t(visit_rank, full_url, error_code)"
    )


def ann_lsh_multi_oracle(
    dim: int = 64, n_planes: int = 4, n_tables: int = 6, k: int = 5
) -> str:
    """Generated oracle for q_ann_lsh_multi: mirrors multi-table
    Hamming-1-multiprobe SRP bucketing in DuckDB. Plane literals come
    from the SAME deterministic _hyperplane the Spark side uses, so
    bucket assignment is bit-identical."""
    from sitecrawler_spark.dedup.ann import _hyperplane

    def bucket_expr(table: int) -> str:
        terms = []
        for p in range(n_planes):
            plane = _hyperplane(dim, table * 1000 + p)
            lit = "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"
            terms.append(
                f"CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 "
                f"THEN {1 << p} ELSE 0 END"
            )
        return " + ".join(terms)

    per_table = [
        f"SELECT vec_id, embedding, {t} AS tbl, {bucket_expr(t)} AS bucket "
        f"FROM embeddings"
        for t in range(n_tables)
    ]
    probe_deltas = ", ".join(f"({0})" if False else f"({d})"
                             for d in [0] + [1 << i for i in range(n_planes)])
    return f"""
WITH b AS ({' UNION ALL '.join(per_table)}),
p AS (
  SELECT vec_id AS query_id, tbl, xor(bucket, dd.d) AS bucket
  FROM b, (VALUES {probe_deltas}) dd(d)
  WHERE vec_id < 10
),
cand AS (
  SELECT DISTINCT p.query_id, b.vec_id AS neighbor_id
  FROM b JOIN p ON b.tbl = p.tbl AND b.bucket = p.bucket
  WHERE b.vec_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      n.embedding::DOUBLE[]), 6) AS sim
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings n ON n.vec_id = c.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= {k}
"""


ORACLES["q_span_stats"] = """
WITH t AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS i
  FROM documents
)
SELECT CASE WHEN i % 5 = 0 THEN 'anchor'
            WHEN i % 7 = 0 THEN 'media' ELSE 'text' END AS kind,
       count(*) AS n,
       sum(length(tok))::BIGINT AS chars,
       count(CASE WHEN i % 7 = 0 AND i % 5 <> 0 THEN concat('ref://', tok) END) AS n_refs,
       max(i) AS max_offset
FROM t GROUP BY 1
"""


def opic_oracle(n_iters: int = 5) -> str:
    """Generated oracle for q_opic: the synchronous OPIC cash/history
    recurrence (bank → distribute → dangling redistribution) unrolled
    as one CTE per iteration, 9dp per-iteration round matching the
    operator's contract (operators/graph.opic)."""
    from sitecrawler_spark.queries import PAGERANK_EDGES_SQL

    ctes = [
        "nodes AS (SELECT doc_id AS id FROM documents)",
        "nn AS (SELECT count(*) AS n FROM documents)",
        f"edges AS ({PAGERANK_EDGES_SQL})",
        "deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)",
        """s0 AS MATERIALIZED (
  SELECT nodes.id,
         round(1.0 / (SELECT n FROM nn), 9) AS cash,
         0.0 AS hist,
         COALESCE(deg.out_deg, 0) AS out_deg
  FROM nodes LEFT JOIN deg ON deg.src = nodes.id
)""",
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        ctes.append(f"""s{i} AS MATERIALIZED (
  SELECT sp.id,
         round(COALESCE(c.s, 0)
               + (SELECT COALESCE(sum(cash), 0) FROM s{p} WHERE out_deg = 0)
                 / (SELECT n FROM nn), 9) AS cash,
         round(sp.hist + sp.cash, 9) AS hist,
         sp.out_deg
  FROM s{p} sp LEFT JOIN (
    SELECT e.dst AS id, sum(s{p}.cash / s{p}.out_deg) AS s
    FROM edges e JOIN s{p} ON s{p}.id = e.src
    GROUP BY e.dst) c USING (id)
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id AS doc_id,
       round((hist + cash) / {n_iters + 1}.0, 6) AS importance
FROM s{n_iters}"""
    )


_TRAP_URLS_SQL_ORACLE = None


def _trap_urls_sql() -> str:
    from sitecrawler_spark.queries import TRAP_URLS_SQL

    return TRAP_URLS_SQL


def url_trap_score_oracle() -> str:
    """Independent DuckDB expression of the trap signals via list
    lambdas (list_filter/list_transform) over the shared deterministic
    deep-path corpus."""
    return f"""
WITH urls AS ({_trap_urls_sql()}),
feats AS (
  SELECT doc_id, url,
    list_filter(
      string_split(regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1), '/'),
      x -> x <> '') AS segs,
    regexp_extract(url, '\\?(.*)$', 1) AS q
  FROM urls
),
m AS (
  SELECT doc_id, url,
    len(segs) AS depth,
    COALESCE(list_max(list_transform(
      list_distinct(segs),
      s -> len(list_filter(segs, x -> x = s)))), 0) AS max_seg_repeat,
    CASE WHEN q = '' THEN 0 ELSE len(string_split(q, '&')) END AS n_params,
    CASE WHEN q LIKE '%sess=%' THEN 1 ELSE 0 END AS has_session_param
  FROM feats
)
SELECT doc_id, url,
  CAST(depth AS BIGINT) AS depth,
  CAST(max_seg_repeat AS BIGINT) AS max_seg_repeat,
  CAST(n_params AS BIGINT) AS n_params,
  CAST(has_session_param AS BIGINT) AS has_session_param,
  0.5 * (max_seg_repeat - 1)
    + 0.25 * greatest(depth - 3, 0)
    + 0.25 * has_session_param AS trap_score,
  (0.5 * (max_seg_repeat - 1)
    + 0.25 * greatest(depth - 3, 0)
    + 0.25 * has_session_param) >= 1.0 AS is_trap
FROM m
"""


ORACLES["q_recrawl_schedule"] = """
WITH hist AS (
  SELECT user_id AS page_id, ts,
         floor(epoch(ts) / (3600 * (1 + user_id % 5))) AS content_ver
  FROM events
),
obs AS (
  SELECT page_id,
         CAST(content_ver <> lag(content_ver)
              OVER (PARTITION BY page_id ORDER BY ts) AS INTEGER) AS changed
  FROM hist
),
agg AS (
  SELECT page_id,
         count(*) AS n_fetches,
         CAST(COALESCE(sum(changed), 0) AS BIGINT) AS n_changes
  FROM obs GROUP BY page_id
),
lam AS (
  SELECT page_id, n_fetches, n_changes,
         -ln((n_fetches - 1 - n_changes + 0.5) / (n_fetches - 1 + 0.5))
           AS lambda_raw
  FROM agg WHERE n_fetches >= 3
)
SELECT page_id, n_fetches, n_changes,
       round(lambda_raw, 6) AS lambda_hat,
       round(CASE WHEN lambda_raw > 0
                  THEN least(1.0 / lambda_raw, 1000.0)
                  ELSE 1000.0 END, 6) AS recrawl_intervals
FROM lam
"""


# DSIR importance resampling (Xie 2023): hashed unigram+bigram bucket
# distributions, add-one smoothing, per-bucket log-ratio rounded ONCE
# to integer micro-units (exact long sums thereafter), Gumbel-top-64
# with the portable-hash uniform — mirrors queries.q_dsir_select /
# textops.dsir_logweights arithmetic step for step
ORACLES["q_dsir_select"] = """
WITH base AS (
  SELECT doc_id, (doc_id % 13 = 0) AS is_target,
         string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, is_target,
         unnest(list_concat(
           t,
           CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i + 1])
                ELSE [] END)) AS g
  FROM base
),
gb AS (
  SELECT doc_id, is_target,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % 1024 AS b
  FROM grams
),
counts AS (
  SELECT b,
         sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
         sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS cr
  FROM gb GROUP BY b
),
totals AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM counts),
lr AS (
  SELECT b,
         round(1e6 * (ln(ct + 1) - ln(tt + 1024)
                      - ln(cr + 1) + ln(tr + 1024)))::BIGINT AS lr_micro
  FROM counts, totals
),
lw AS (
  SELECT doc_id, is_target, sum(lr_micro)::BIGINT AS logw_micro
  FROM gb JOIN lr USING (b)
  GROUP BY doc_id, is_target
),
keyed AS (
  SELECT doc_id, logw_micro,
         logw_micro + round(-ln(-ln(
           ((('0x' || substr(md5('dsir|' || doc_id), 1, 15))::BIGINT
             % 1099511627776)::DOUBLE + 1.0) / 1099511627777.0
         )) * 1e6)::BIGINT AS sel_key
  FROM lw WHERE NOT is_target
)
SELECT doc_id, logw_micro, sel_key FROM keyed
ORDER BY sel_key DESC, doc_id LIMIT 64
"""


def logreg_oracle(label_sql: str = "lang = 'en'") -> str:
    """Generated oracle for q_quality_classifier: the whole batch-GD
    logistic-regression training loop unrolled as SQL CTEs, one
    (margin, residual, gradient, weight-update) block per iteration —
    hyperparameters read from queries.QUALITY_CLF so query and oracle
    cannot drift (the bm25_oracle pattern). Mirrors
    textops/classifier.py step for step: exact BIGINT margins and
    gradients; the sigmoid is the only float op and is rounded straight
    back to micro-units."""
    from sitecrawler_spark.queries import QUALITY_CLF

    d = QUALITY_CLF["n_buckets"]
    k = QUALITY_CLF["n_iters"]
    lr = QUALITY_CLF["lr"]
    ctes = [
        f"""base AS (
  SELECT doc_id AS id, CASE WHEN {label_sql} THEN 1 ELSE 0 END AS y,
         string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
)""",
        f"""feats AS (
  SELECT id, y, b, 1::BIGINT AS c FROM (
    SELECT DISTINCT id, y,
           ('0x' || substr(md5(g), 1, 15))::BIGINT % {d} AS b
    FROM (SELECT id, y,
                 unnest(list_concat(
                   t,
                   CASE WHEN len(t) >= 2
                        THEN list_transform(range(1, len(t)),
                                            i -> t[i] || ' ' || t[i + 1])
                        ELSE [] END)) AS g
          FROM base))
  UNION ALL
  SELECT id, y, -1 AS b, 1::BIGINT AS c FROM base
)""",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM base)",
        f"w0 AS (SELECT unnest(range(-1, {d}))::INT AS b, 0::BIGINT AS w)",
    ]
    for i in range(1, k + 1):
        ctes.append(f"""m{i} AS (
  SELECT f.id, f.y, sum(f.c * w.w)::BIGINT AS mm
  FROM feats f JOIN w{i - 1} w USING (b) GROUP BY 1, 2
),
r{i} AS (
  SELECT id,
         round(1e6 * (1.0 / (1.0 + exp(-(mm / 1000000.0))) - y))::BIGINT
           AS r
  FROM m{i}
),
g{i} AS (
  SELECT f.b, sum(f.c * r.r)::BIGINT AS g
  FROM feats f JOIN r{i} r USING (id) GROUP BY 1
),
w{i} AS (
  SELECT w.b, (w.w - round({lr} * coalesce(g.g, 0) / nn.n))::BIGINT AS w
  FROM w{i - 1} w LEFT JOIN g{i} g USING (b), nn
)""")
    return (
        "WITH " + ",\n".join(ctes) + f""",
mf AS (
  SELECT f.id, f.y, sum(f.c * w.w)::BIGINT AS mm
  FROM feats f JOIN w{k} w USING (b) GROUP BY 1, 2
)
SELECT id AS doc_id, y, mm AS margin_micro, mm > 0 AS pred FROM mf"""
    )


ORACLES["q_quality_classifier"] = logreg_oracle()
# evaluation wraps the SAME generated training CTE — one GROUP BY on
# top, so the two gates can never disagree about the model they test
ORACLES["q_classifier_eval"] = (
    "SELECT y, pred, count(*)::BIGINT AS n FROM (\n"
    + logreg_oracle()
    + "\n) t GROUP BY 1, 2"
)


# the MODULE gate for crawl/recrawl.change_rates_from_history — same
# derived history as q_recrawl_schedule but keyed by synthetic URL/host
# and fingerprint (fp = content version); `+ 0.0` mirrors the module's
# IEEE -0.0 canonicalization for the X=0 (never-changed) case
ORACLES["q_url_change_rates"] = """
WITH hist AS (
  SELECT concat('https://h', user_id % 37, '.example.com/p', user_id)
           AS full_url,
         concat('h', user_id % 37, '.example.com') AS host,
         epoch(ts) AS wave,
         floor(epoch(ts) / (3600 * (1 + user_id % 5))) AS fp
  FROM events
),
obs AS (
  SELECT full_url, host,
         CAST(fp <> lag(fp)
              OVER (PARTITION BY full_url ORDER BY wave) AS INTEGER)
           AS changed
  FROM hist
),
agg AS (
  SELECT full_url, host,
         count(*) AS n_fetches,
         CAST(COALESCE(sum(changed), 0) AS BIGINT) AS n_changes
  FROM obs GROUP BY full_url, host
)
SELECT full_url, host, n_fetches, n_changes,
       round(-ln((n_fetches - 1 - n_changes + 0.5) / (n_fetches - 1 + 0.5))
             + 0.0, 6) AS lambda_hat
FROM agg WHERE n_fetches >= 3
"""


def sitemap_parse_oracle() -> str:
    """Independent DuckDB re-parse of the shared sitemap corpus:
    regexp_extract_all over the block regexes + generate_subscripts for
    entry position (the posexplode analog)."""
    from sitecrawler_spark.queries import SITEMAPS_SQL
    from sitecrawler_spark.sources.sitemap import (
        CHANGEFREQ_RE, LASTMOD_RE, LOC_RE, PRIORITY_RE, SITEMAP_BLOCK_RE,
        URL_BLOCK_RE,
    )

    def arm(block_re: str, kind: str) -> str:
        return f"""
SELECT doc_id, '{kind}' AS kind,
       CAST(generate_subscripts(blocks, 1) - 1 AS BIGINT) AS pos,
       unnest(blocks) AS block
FROM (SELECT doc_id,
             regexp_extract_all(xml, '{block_re}', 1) AS blocks
      FROM sitemaps)"""

    return f"""
WITH sitemaps AS ({SITEMAPS_SQL}),
blocks AS ({arm(URL_BLOCK_RE, 'url')} UNION ALL {arm(SITEMAP_BLOCK_RE, 'sitemap')})
SELECT doc_id, kind, pos,
       regexp_extract(block, '{LOC_RE}', 1) AS loc,
       regexp_extract(block, '{LASTMOD_RE}', 1) AS lastmod,
       regexp_extract(block, '{CHANGEFREQ_RE}', 1) AS changefreq,
       TRY_CAST(regexp_extract(block, '{PRIORITY_RE}', 1) AS DOUBLE) AS priority
FROM blocks
"""


# ---- round-4 batch: semantic dedup / gopher quality / z-order / ----
# ---- weighted sampling                                          ----

ORACLES["q_gopher_quality"] = f"""
WITH toks AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS t,
         length(regexp_replace(trim(text), '\\s', '', 'g')) AS ns_len
  FROM documents
),
base AS (
  SELECT doc_id, text, ns_len,
    (CASE WHEN trim(text) = '' THEN 0 ELSE len(t) END)::BIGINT AS n_tokens,
    round(1.0 - len(list_distinct(t))::DOUBLE
              / greatest(len(t), 1)::DOUBLE, 6) AS dup_word_frac,
    CASE WHEN len(t) < 3 THEN 0.0 ELSE round(
      1.0 - len(list_distinct(list_transform(range(1, len(t) - 1),
                                             s -> array_to_string(t[s:s+2], ' '))))::DOUBLE
          / (len(t) - 2)::DOUBLE, 6) END AS dup_3gram_frac,
    round(list_sum(list_transform(t, x -> length(x)))::DOUBLE
          / greatest(len(t), 1)::DOUBLE, 6) AS mean_word_len,
    ({_stopcount('en')})::BIGINT AS stop_hits,
    t
  FROM toks
),
grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
                                       s -> array_to_string(t[s:s+1], ' '))) AS gram
  FROM base WHERE len(t) >= 2
),
counts AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
top AS (
  SELECT doc_id, gram AS top_2gram, cnt AS top_2gram_count FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY cnt DESC, gram DESC) AS rn
    FROM counts) s WHERE rn = 1
),
j AS (
  SELECT b.doc_id, b.n_tokens, b.dup_word_frac, b.dup_3gram_frac,
         b.mean_word_len, b.stop_hits, t.top_2gram,
         t.top_2gram_count::BIGINT AS top_2gram_count,
         round(coalesce(t.top_2gram_count * (length(t.top_2gram) - 1)::DOUBLE
                        / greatest(b.ns_len, 1)::DOUBLE, 0.0), 6)
           AS top_2gram_frac
  FROM base b LEFT JOIN top t USING (doc_id)
)
SELECT *,
       (n_tokens >= 20 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND dup_3gram_frac <= 0.2 AND top_2gram_frac <= 0.08
        AND stop_hits >= 2) AS keep
FROM j
"""


ORACLES["q_weighted_sample"] = """
WITH h AS (
  SELECT lang, doc_id, n_chars,
         ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT AS hk
  FROM documents
),
k AS (
  SELECT lang, doc_id, n_chars,
         round(ln(((hk % 1099511627776) + 1.0) / 1099511627777.0)
               / n_chars::DOUBLE, 9) AS es_key
  FROM h
)
SELECT lang, doc_id, n_chars, es_key, rk::BIGINT AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY es_key DESC, doc_id) AS rk
  FROM k) s
WHERE rk <= 3
"""


def _quantize_sql(v: str, lo: float, hi: float, bits: int) -> str:
    n_cells = 1 << bits
    span = hi - lo
    return (
        f"least(floor((least(greatest(({v})::DOUBLE, {lo}), {hi}) - {lo})"
        f" * {n_cells} / {span})::BIGINT, {n_cells - 1})"
    )


def zorder_key_oracle(bits: int = 16) -> str:
    """Generated oracle for q_zorder_key: the identical quantize +
    Morton-interleave integer arithmetic unrolled as SQL bit ops."""
    terms = []
    for j in range(bits):
        for i, col in enumerate(("ucell", "vcell")):
            terms.append(f"((({col} >> {j}) & 1) << {j * 2 + i})")
    interleave = " | ".join(terms)
    return f"""
WITH q AS (
  SELECT event_id,
         {_quantize_sql('user_id', 0.0, 150.0, bits)} AS ucell,
         {_quantize_sql('value', 0.0, 500.0, bits)} AS vcell
  FROM events
)
SELECT event_id, ucell, vcell, ({interleave})::BIGINT AS zkey FROM q
"""


def semantic_dedup_oracle(
    n_clusters: int = 8, n_iters: int = 2, init_stride: int = 60,
    threshold: float = 0.4,
) -> str:
    """Generated oracle for q_semantic_dedup: the same unrolled-SQL
    Lloyd recurrence as ann_kmeans_oracle (assignment = rounded-cosine
    argmax, FLOAT-quantized centroid updates, empty clusters carried),
    then the SemDeDup prune — a doc is dropped when a smaller-id doc in
    its cluster has rounded cosine ≥ threshold."""
    ctes = [f"""cent0 AS (
  SELECT centroid_id, cvec FROM (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id,
           embedding AS cvec
    FROM embeddings WHERE vec_id % {init_stride} = 0) s
  WHERE centroid_id < {n_clusters}
)"""]
    for i in range(1, n_iters + 1):
        ctes.append(f"""assign{i} AS (
  SELECT id, vec, centroid_id FROM (
    SELECT id, vec, centroid_id,
           row_number() OVER (PARTITION BY id
                              ORDER BY csim DESC, centroid_id) AS r
    FROM (
      SELECT e.vec_id AS id, e.embedding AS vec, c.centroid_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[],
                                          c.cvec::DOUBLE[]), 6) AS csim
      FROM embeddings e, cent{i - 1} c) s1) s2
  WHERE r = 1
),
upd{i} AS (
  SELECT centroid_id, (list(m ORDER BY dim))::FLOAT[] AS cvec FROM (
    SELECT centroid_id, dim, avg(val) AS m FROM (
      SELECT centroid_id, unnest(vec) AS val,
             generate_subscripts(vec, 1) AS dim
      FROM assign{i}) u1
    GROUP BY centroid_id, dim) u2
  GROUP BY centroid_id
),
cent{i} AS (
  SELECT * FROM upd{i}
  UNION ALL
  SELECT c.* FROM cent{i - 1} c
  LEFT JOIN upd{i} u USING (centroid_id) WHERE u.centroid_id IS NULL
)""")
    return f"""
WITH {', '.join(ctes)},
scored AS (
  SELECT e.vec_id AS id, e.embedding AS vec, c.centroid_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      c.cvec::DOUBLE[]), 6) AS csim
  FROM embeddings e, cent{n_iters} c
),
assign AS (
  SELECT id, vec, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY csim DESC, centroid_id) AS r
    FROM scored) s WHERE r = 1
),
dropped AS (
  SELECT DISTINCT b.id FROM assign a
  JOIN assign b ON a.centroid_id = b.centroid_id AND a.id < b.id
  WHERE round(list_cosine_similarity(a.vec::DOUBLE[], b.vec::DOUBLE[]), 6)
        >= {threshold}
)
SELECT a.id AS vec_id, a.centroid_id::BIGINT AS centroid_id
FROM assign a LEFT JOIN dropped d ON a.id = d.id
WHERE d.id IS NULL
"""


def bpe_model(
    corpus: list[tuple[str, int]], n_merges: int,
) -> tuple[list[tuple[int, str, str, int]], dict[str, list[str]]]:
    """Independent textbook BPE trainer (pure Python): pair counts
    weighted by word frequency, argmax with (count desc, left, right)
    tie-break, index-walk greedy left-to-right merge."""
    freq = dict(corpus)
    vocab = {w: list(w) for w, _ in corpus}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = freq[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, c))
        for w, syms in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def bpe_train_oracle(n_merges: int = 12) -> str:
    """Oracle for q_bpe_train: run bpe_model on the shared synthetic
    corpus and emit every word's final segmentation as a VALUES
    literal (crawl_e2e pattern — the train loop is cyclic dataflow
    SQL cannot express; engine and model are independent
    implementations, so the hash compare is a real cross-check)."""
    from sitecrawler_spark.queries import bpe_corpus

    corpus = bpe_corpus()
    _, vocab = bpe_model(corpus, n_merges)
    freq = dict(corpus)
    vals = [
        f"('{w}', CAST({freq[w]} AS BIGINT), '{' '.join(syms)}')"
        for w, syms in sorted(vocab.items())
    ]
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(vals)
        + ") AS t(word, freq, seg)"
    )


# --- round 4c: interleaved-payload pipeline ops ----------------------------
# Span-kind closed forms (multiples of k in [0, n-1] = (n-1)//k + 1)
# mirror queries._span_kind_counts.

ORACLES["q_interleaved_pack"] = """
WITH d AS (
  SELECT doc_id, source, len(string_split(text,' ')) AS ntok FROM documents
), m AS (
  SELECT doc_id, source, ntok,
         ((ntok-1)//7 + 1) - ((ntok-1)//35 + 1) AS n_media
  FROM d
), c AS (
  SELECT doc_id, source, ntok, n_media,
         (ntok - n_media) + 16*n_media AS cost,
         sum((ntok - n_media) + 16*n_media) OVER
           (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ((ntok - n_media) + 16*n_media) AS cum_before
  FROM m
)
SELECT source, (cum_before // 512)::BIGINT AS seq_id,
       count(*)::BIGINT AS n_docs,
       sum(ntok - n_media)::BIGINT AS text_tokens,
       sum(16*n_media)::BIGINT AS media_tokens,
       sum(n_media)::BIGINT AS n_media
FROM c GROUP BY 1,2
"""


ORACLES["q_span_reconstruct"] = """
WITH t AS (
  SELECT doc_id, text, string_split(text,' ') AS ts FROM documents
), r AS (
  SELECT doc_id, text, len(ts) AS n,
    array_to_string(
      list_transform(range(len(ts)), i -> CASE
        WHEN i%5=0 THEN '[' || ts[i+1] || ']'
        WHEN i%7=0 THEN '<|media:ref://' || ts[i+1] || '|>'
        ELSE ts[i+1] END),
      ' ') AS recon
  FROM t
)
SELECT doc_id, n::BIGINT AS n_spans,
       (((n-1)//7 + 1) - ((n-1)//35 + 1))::BIGINT AS n_media,
       replace(replace(replace(replace(recon,'<|media:ref://',''),'|>',''),'[',''),']','')
         = text AS roundtrip_ok,
       ('0x' || substr(md5(recon),1,15))::BIGINT AS recon_hash
FROM r
"""


ORACLES["q_boilerplate_strip"] = """
WITH t AS (
  SELECT doc_id, source, string_split(text,' ') AS ts FROM documents
), la AS (
  SELECT doc_id, source,
    ['nav ' || source || ' home login'] ||
    list_transform(range((len(ts)+7)//8),
                   g -> array_to_string(list_slice(ts, g*8+1, g*8+8), ' ')) ||
    ['footer ' || source || ' copyright contact'] AS ll
  FROM t
), l2 AS (
  SELECT doc_id, source,
         generate_subscripts(ll,1)-1 AS line_id, unnest(ll) AS line_text
  FROM la
), stats AS (
  SELECT source, line_text, count(DISTINCT doc_id) AS n_docs_line
  FROM l2 GROUP BY 1,2
), hostc AS (
  SELECT source, count(DISTINCT doc_id) AS host_docs FROM documents GROUP BY 1
), flagged AS (
  SELECT s.source, s.line_text FROM stats s JOIN hostc h USING(source)
  WHERE s.n_docs_line >= 3 AND 5*s.n_docs_line > h.host_docs
)
SELECT l.doc_id, count(*)::BIGINT AS n_lines,
       sum(CASE WHEN f.line_text IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       bit_xor(CASE WHEN f.line_text IS NULL THEN
         ('0x' || substr(md5(l.line_id || ':' || l.line_text),1,15))::BIGINT
       END) AS kept_hash
FROM l2 l LEFT JOIN flagged f
  ON l.source = f.source AND l.line_text = f.line_text
GROUP BY 1
"""


# ExactSubstr dedup (Lee et al. 2022 §4.1) at 8-gram granularity:
# rolling 60-bit fingerprints per position, keep-first per fingerprint
# via row_number (DuckDB-side only; the Spark plan uses a pre-filtered
# agg+join — see dedup.exact_substring_spans), then the classic
# gaps-and-islands merge. Island ids are 1-based cumulative sums in
# (start, end) order, matching the Spark window exactly.
ORACLES["q_exact_substr"] = """
WITH t AS (
  SELECT doc_id, string_split(text,' ') AS ts FROM documents
), occ AS (
  SELECT doc_id, generate_subscripts(fps, 1) - 1 AS pos, unnest(fps) AS fp
  FROM (
    SELECT doc_id,
           CASE WHEN len(ts) >= 8 THEN
             list_transform(range(len(ts) - 7),
               i -> ('0x' || substr(md5(
                      array_to_string(list_slice(ts, i + 1, i + 8), ' ')
                    ), 1, 15))::BIGINT)
           ELSE [] END AS fps
    FROM t)
), mk AS (
  SELECT doc_id, pos AS s, pos + 8 AS e FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn,
           count(*) OVER (PARTITION BY fp) AS cnt
    FROM occ)
  WHERE cnt > 1 AND rn > 1
), isl AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_max
    FROM mk)
)
SELECT doc_id, island::BIGINT AS island,
       min(s)::BIGINT AS start, max(e)::BIGINT AS "end"
FROM isl GROUP BY doc_id, island
"""


# CCNet corpus-wide line keep-first (Wenzek 2020 §3.1): same `la` line
# fixture as q_boilerplate_strip; keep rule = lexicographic-first
# (doc_id, line_id) per 60-bit line hash, mirrored as a row_number
# window (DuckDB-side only — the Spark plan uses agg+join, see
# dedup.line_dedup_keep_first's skew note).
ORACLES["q_line_dedup"] = """
WITH t AS (
  SELECT doc_id, source, string_split(text,' ') AS ts FROM documents
), la AS (
  SELECT doc_id, source,
    ['nav ' || source || ' home login'] ||
    list_transform(range((len(ts)+7)//8),
                   g -> array_to_string(list_slice(ts, g*8+1, g*8+8), ' ')) ||
    ['footer ' || source || ' copyright contact'] AS ll
  FROM t
), l2 AS (
  SELECT doc_id,
         generate_subscripts(ll,1)-1 AS line_id, unnest(ll) AS line_text
  FROM la
), k AS (
  SELECT doc_id, line_id, line_text,
         row_number() OVER (
           PARTITION BY ('0x' || substr(md5(line_text),1,15))::BIGINT
           ORDER BY doc_id, line_id) AS rn
  FROM l2
)
SELECT doc_id, count(*)::BIGINT AS n_lines,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       bit_xor(CASE WHEN rn = 1 THEN
         ('0x' || substr(md5(line_id || ':' || line_text),1,15))::BIGINT
       END) AS kept_hash
FROM k GROUP BY 1
"""


ORACLES["q_pii_redact"] = """
WITH a AS (
  SELECT doc_id,
    text ||
    CASE WHEN doc_id%3 <> 0
         THEN ' contact user' || (doc_id%97) || '@ex' || (doc_id%7) || '.com'
         ELSE ' contact none' END ||
    CASE WHEN doc_id%4 <> 0
         THEN ' from 10.' || (doc_id%256) || '.0.' || (doc_id%100)
         ELSE ' from nowhere' END ||
    CASE WHEN doc_id%5 = 0 THEN ' cc admin@site.org' ELSE '' END AS aug
  FROM documents
), r AS (
  SELECT doc_id, aug,
    regexp_replace(
      regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS red
  FROM a
)
SELECT doc_id,
  len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT
    AS n_emails,
  len(regexp_extract_all(aug, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT
    AS n_ips,
  ('0x' || substr(md5(red),1,15))::BIGINT AS red_hash
FROM r
"""


def _hq(num: int, den: int) -> str:
    r = f"(n * {num} + {den} - 1) // {den}"
    return (
        f"max(CASE WHEN cum >= {r} AND cum - cnt < {r} THEN "
        f"round((bin + ({r} - (cum - cnt))::DOUBLE / cnt::DOUBLE) * 2.5 + 0.0, 6) "
        f"END)"
    )


ORACLES["q_quantile_sketch"] = f"""
WITH h AS (
  SELECT event_type,
         least(255, greatest(0, floor(value / 2.5)))::INT AS bin,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type,
       {_hq(50, 100)} AS p50,
       {_hq(90, 100)} AS p90,
       {_hq(99, 100)} AS p99
FROM c GROUP BY 1
"""


ORACLES["q_anchor_index"] = """
WITH d AS (
  SELECT doc_id, string_split(text,' ') AS ts FROM documents
), an AS (
  SELECT doc_id,
         list_transform(range((len(ts)+4)//5), k -> ts[5*k+1]) AS anchor_toks
  FROM d
), n AS (SELECT max(doc_id)+1 AS nn FROM documents),
e AS (
  SELECT ((a.doc_id*7+3) % n.nn) AS dst_id, a.anchor_toks FROM an a, n
  UNION ALL
  SELECT ((a.doc_id*3+1) % n.nn) AS dst_id, a.anchor_toks FROM an a, n
)
SELECT dst_id, count(*)::BIGINT AS n_inlinks,
       array_to_string(
         list_slice(list_sort(list_distinct(flatten(list(anchor_toks)))), 1, 64),
         ' ') AS anchor_terms
FROM e GROUP BY 1
"""


# mirror the engine's MIRROR_FP_BUCKET_CAP=10000 boilerplate guard:
# fingerprints shared by more rows than the cap are dropped before
# the host-pair self-join (queries.q_mirror_detect).
ORACLES["q_mirror_detect"] = """
WITH c AS (
  SELECT source, doc_id,
         ('0x' || substr(md5(text),1,15))::BIGINT AS fp
  FROM documents
  UNION ALL
  SELECT 'mirror-of-' || source AS source, doc_id,
         ('0x' || substr(md5(text),1,15))::BIGINT AS fp
  FROM documents WHERE doc_id % 3 = 0
), hn AS (
  SELECT source, count(*)::BIGINT AS n_docs FROM c GROUP BY 1
), bn AS (
  SELECT fp FROM c GROUP BY fp HAVING count(*) <= 10000
), cc AS (
  SELECT c.* FROM c JOIN bn USING (fp)
), sh AS (
  SELECT a.source AS host_a, b.source AS host_b, count(*)::BIGINT AS shared_docs
  FROM cc a JOIN cc b ON a.fp = b.fp AND a.source < b.source
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT sh.host_a, sh.host_b, sh.shared_docs,
       ha.n_docs AS docs_a, hb.n_docs AS docs_b,
       round(sh.shared_docs / least(ha.n_docs, hb.n_docs), 6) AS overlap
FROM sh JOIN hn ha ON sh.host_a = ha.source
        JOIN hn hb ON sh.host_b = hb.source
"""


# ---- round-5d additions ---------------------------------------------------

# q_epoch_shuffle: same 60-bit portable hash (kernel/urls_spark.
# portable_hash64) and tie-break; a total order, so row_number is exact.
ORACLES["q_epoch_shuffle"] = """
SELECT doc_id,
       row_number() OVER (
         ORDER BY ('0x' || substr(md5(concat('epoch-1:', doc_id)), 1, 15))::BIGINT,
                  doc_id)::BIGINT AS position
FROM documents
"""

# q_token_fertility: exact integer sums; each ratio is one IEEE double
# division rounded to integer micro-units (same bits both engines).
ORACLES["q_token_fertility"] = f"""
WITH t AS (
  SELECT lang,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws,
    len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe,
    strlen(text) AS b  -- DuckDB strlen = UTF-8 byte length (octet_length is BLOB-only)
  FROM documents)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(ws)::BIGINT AS ws_tokens,
       sum(bpe)::BIGINT AS bpe_tokens,
       sum(b)::BIGINT AS text_bytes,
       round(sum(bpe) * 1000000.0 / greatest(sum(ws), 1))::BIGINT
         AS fertility_micro,
       round(sum(b) * 1000000.0 / greatest(sum(bpe), 1))::BIGINT
         AS bytes_per_token_micro
FROM t GROUP BY lang
"""

# q_domain_blocklist: per-source micro-quality rollup vs the corpus
# mean; the blocked flag is an all-integer cross-multiply (exact).
ORACLES["q_domain_blocklist"] = """
WITH q AS (__QUALITY_SQL__),
j AS (SELECT d.source, round(q.quality * 10000)::BIGINT AS q_micro
      FROM q JOIN documents d USING (doc_id)),
per AS (SELECT source, count(*)::BIGINT AS n_docs,
               sum(q_micro)::BIGINT AS sum_q_micro
        FROM j GROUP BY source),
tot AS (SELECT count(*)::BIGINT AS tn, sum(q_micro)::BIGINT AS tq FROM j)
SELECT source, n_docs, sum_q_micro,
       round(sum_q_micro / (n_docs * 10000.0), 4) AS mean_quality,
       (n_docs >= 10 AND sum_q_micro * tn * 5 < tq * n_docs * 4) AS blocked
FROM per, tot
"""
ORACLES["q_domain_blocklist"] = ORACLES["q_domain_blocklist"].replace(
    "__QUALITY_SQL__", ORACLES["q_quality_score"].strip()
)


# q_corpus_snapshot_diff: identical epoch derivation + fp compare.
ORACLES["q_corpus_snapshot_diff"] = """
WITH e1 AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp_old
  FROM documents),
e2 AS (
  SELECT doc_id,
         ('0x' || substr(md5(CASE WHEN doc_id % 5 = 0
                                  THEN 'v2:' || text
                                  ELSE text END), 1, 15))::BIGINT AS fp_new
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         ('0x' || substr(md5('new:' || text), 1, 15))::BIGINT AS fp_new
  FROM documents WHERE doc_id % 11 = 0),
j AS (SELECT coalesce(e1.doc_id, e2.doc_id) AS doc_id, fp_old, fp_new
      FROM e1 FULL OUTER JOIN e2 ON e1.doc_id = e2.doc_id)
SELECT doc_id,
       CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old <> fp_new THEN 'changed'
            ELSE 'unchanged' END AS status
FROM j
"""
