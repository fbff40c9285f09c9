"""Pure-Python URL kernel — the byte-exact oracle of the reference's
Java URL semantics. Used by the single-threaded crawl model (tests) and
as the scalar core of the Arrow-vectorized UDFs.

Semantics replicated branch-by-branch (citations into /root/reference):
- ``normalize2``  ≙ URLNormalizer.normalize(String,String)   URLNormalizer.java:49-60
- ``normalize3``  ≙ URLNormalizer.normalize(String,String,String) URLNormalizer.java:72-108
- ``clean_url``   ≙ URLCleaner.getCleanedUrl                  URLCleaner.java:58-108
- ``prepend_base_if_needed`` ≙ SiteCrawler.prependBaseUrlIfNeeded SiteCrawler.java:1120-1141
- ``is_excluded_static``     ≙ SiteCrawler.isExcluded minus seen-set checks
                                                              SiteCrawler.java:1152-1227
- ``java_url_parse`` mimics java.net.URL component extraction for
  http/https URLs (the only schemes reachable in the crawl pipeline —
  scope check F1 admits only base-prefixed or site-relative URLs).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Java String.trim() strips chars <= U+0020 from both ends — narrower than
# Python str.strip() (which strips all unicode whitespace).
_JAVA_TRIM_RE = re.compile(r"^[\x00-\x20]+|[\x00-\x20]+$")

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")


def java_trim(s: str) -> str:
    return _JAVA_TRIM_RE.sub("", s)


def normalize2(url: str, base: str | None) -> str:
    """2-arg normalize (URLNormalizer.java:49-60).

    Note Java quirks kept on purpose:
    - ``base + url`` with a null base concatenates the literal "null".
    - ``url.replace("/index.jsp", "/")`` replaces EVERY occurrence of the
      literal, not just the trailing one (guarded by endsWith).
    """
    url = java_trim(url)
    if url.startswith("/") and not url.startswith("//"):
        url = ("null" if base is None else base) + url
    if url.endswith("/index.jsp"):
        url = url.replace("/index.jsp", "/")
    return url


def normalize3(url: str, base: str | None, page_origin: str | None) -> str:
    """3-arg normalize (URLNormalizer.java:72-108). Branch order is
    load-bearing; replicated exactly."""
    url = java_trim(url)
    if (url.startswith("/") and not url.startswith("//")) or url.startswith(
        "http://"
    ) or url.startswith("https://"):
        return normalize2(url, base)

    if (
        url == ""
        or url.startswith("tel:")
        or url.startswith("#")
        or url.startswith("???")
        or url.startswith("mailto:")
        or url.startswith("javascript:")
    ):
        return normalize2(url, base)

    if url.startswith("//"):
        # URLNormalizer.java:84-90 — NPE if page_origin is None (faithful)
        page_origin_protocol = page_origin[: page_origin.index("/")]
        url = page_origin_protocol + url
        return normalize2(url, base)

    if page_origin is not None and not page_origin.endswith("/") and "/" in page_origin:
        page_origin = page_origin[: page_origin.rfind("/") + 1]
        url = page_origin + url
        return normalize2(url, base)

    if page_origin is not None and page_origin.endswith("/"):
        url = page_origin + url
        return normalize2(url, base)

    return normalize2(url, base)


@dataclass
class ParsedUrl:
    scheme: str
    host: str
    path: str
    query: str | None  # None ≙ java getQuery() == null


def java_url_parse(url: str) -> ParsedUrl | None:
    """Component extraction matching java.net.URL for http/https.

    Returns None ≙ MalformedURLException (unknown/missing protocol).
    Not modeled (unreachable through the crawl pipeline's scope filter):
    non-http schemes, IPv6 bracket hosts.
    """
    m = _SCHEME_RE.match(url)
    if not m:
        return None
    scheme = m.group(1).lower()
    if scheme not in ("http", "https"):
        return None
    rest = url[m.end() :]
    # java parseURL strips the fragment at the first '#'
    hash_pos = rest.find("#")
    if hash_pos >= 0:
        rest = rest[:hash_pos]
    if rest.startswith("//"):
        rest = rest[2:]
        # authority terminates at the first '/' or '?'
        cut = len(rest)
        for ch in "/?":
            p = rest.find(ch)
            if p >= 0:
                cut = min(cut, p)
        authority, rest = rest[:cut], rest[cut:]
        # userinfo: host is after the last '@' in the authority
        host = authority.rpartition("@")[2]
        # strip :port
        colon = host.rfind(":")
        if colon >= 0:
            port_part = host[colon + 1 :]
            if port_part == "" or port_part.isdigit():
                host = host[:colon]
            else:
                return None  # java: invalid port -> MalformedURLException
    else:
        # path-form URL ("http:foo") — valid java.net.URL, host empty
        host = ""
    qpos = rest.find("?")
    if qpos >= 0:
        path, query = rest[:qpos], rest[qpos + 1 :]
    else:
        path, query = rest, None
    return ParsedUrl(scheme=scheme, host=host, path=path, query=query)


def clean_url(
    url: str | None,
    allowed_parameters: list[str] | None = None,
    url_path_should_not_end_in_slash: bool = True,
) -> str | None:
    """URLCleaner.getCleanedUrl (URLCleaner.java:58-108).

    host+path only; trailing '/' stripped iff the path contains no '.'
    and the option is set — NOTE the strip removes the last char of the
    WHOLE url string (URLCleaner.java:66), which mangles the final query
    char when a query is present; replicated faithfully. Query params
    kept only if whitelisted, in original order (URLCleaner.java:72-99).
    """
    if url is None:
        return None
    allowed_parameters = allowed_parameters or []
    p = java_url_parse(url)
    if p is None:
        return None
    if p.path.endswith("/") and "." not in p.path and url_path_should_not_end_in_slash:
        p2 = java_url_parse(url[:-1])
        if p2 is None:
            return None
        p = p2
    out = p.host + p.path
    q = p.query
    if q is not None and q != "" and allowed_parameters:
        first = True
        parts = q.split("&")
        # java String.split drops trailing empty strings
        while parts and parts[-1] == "":
            parts.pop()
        for qpart in parts:
            qkey = qpart
            if "=" in qpart:
                qkey = qpart[: qpart.index("=")]
            if qkey in allowed_parameters:
                out += "?" if first else "&"
                first = False
                out += qpart
    return out


def prepend_base_if_needed(
    url: str, base_url: str | None, base_url_secure: str | None
) -> str:
    """SiteCrawler.prependBaseUrlIfNeeded (SiteCrawler.java:1120-1141)."""
    if url is None:
        raise ValueError("url cannot be null")
    if "://" in url:
        return url
    if not url.startswith("/"):
        url = "/" + url
    if base_url_secure is not None:
        return base_url_secure + url
    if base_url is not None:
        return base_url + url
    raise ValueError("Cannot have both baseUrl AND baseUrlSecure be null!")


def is_excluded_static(
    url: str,
    base_url: str | None,
    base_url_secure: str | None,
    allowed_suffixes: list[str],
    require_allowed_suffixes: bool,
    blocked: list[str],
    allowed: list[str],
) -> bool:
    """SiteCrawler.isExcluded minus the two visited-set probes
    (SiteCrawler.java:1152-1227; seen checks :1204-1207 and :1220-1224
    are anti-joins in the Spark engine). Predicate order preserved."""
    starts_base = base_url is not None and url.startswith(base_url)
    starts_secure = base_url_secure is not None and url.startswith(base_url_secure)
    # site-relative: "/x" but not "//x", length > 1 (SiteCrawler.java:1167)
    all_good = len(url) > 1 and url.startswith("/") and not url.startswith("//")
    if not starts_base and not starts_secure and not all_good:
        return True

    # suffix gate (SiteCrawler.java:1185-1202): path before '?', lowercased
    suffix = url.split("?")[0].lower()
    has_allowed_suffix = any(suffix.endswith(s) for s in allowed_suffixes)
    if not require_allowed_suffixes:
        has_allowed_suffix = True
    if not has_allowed_suffix:
        return True

    # blocked substrings (:1209-1212)
    if any(b in url for b in blocked):
        return True
    # allowed whitelist (:1214-1217)
    if allowed and not any(a in url for a in allowed):
        return True
    return False


def is_excluded(
    url: str,
    visited: set[str],
    base_url: str | None,
    base_url_secure: str | None,
    allowed_suffixes: list[str],
    require_allowed_suffixes: bool,
    blocked: list[str],
    allowed: list[str],
    allowed_parameters: list[str] | None = None,
    url_path_should_not_end_in_slash: bool = True,
) -> bool:
    """Full isExcluded including the visited probes, for the
    single-threaded oracle model. Order: scope → suffix → visited(url)
    → blocked → allowed → visited(clean_url)."""
    starts_base = base_url is not None and url.startswith(base_url)
    starts_secure = base_url_secure is not None and url.startswith(base_url_secure)
    all_good = len(url) > 1 and url.startswith("/") and not url.startswith("//")
    if not starts_base and not starts_secure and not all_good:
        return True
    suffix = url.split("?")[0].lower()
    has_allowed_suffix = any(suffix.endswith(s) for s in allowed_suffixes)
    if not require_allowed_suffixes:
        has_allowed_suffix = True
    if not has_allowed_suffix:
        return True
    if url in visited:  # SiteCrawler.java:1204-1207
        return True
    if any(b in url for b in blocked):
        return True
    if allowed and not any(a in url for a in allowed):
        return True
    clean = clean_url(url, allowed_parameters, url_path_should_not_end_in_slash)
    if clean is not None and clean in visited:  # :1220-1224
        return True
    return False


def url_host(url: str) -> str:
    """Host of a full URL; '' when unparseable (used for partitioning)."""
    p = java_url_parse(url)
    return p.host if p else ""
