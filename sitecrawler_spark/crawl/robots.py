"""robots.txt → admission rules.

The reference does NOT honor robots.txt (README.md:159-160) and tells
users to parse it themselves and feed the disallow list to
``setBlocked``. This module is that documented workflow, made
first-class: parse a robots.txt body into ``RobotsRule``s (which
``CrawlerConfig.robots_blocked_patterns`` compiles into the same
substring-predicate form as ``blocked``), and optionally prefetch
robots.txt for the seed hosts over live HTTP.

Parser scope: the original robots exclusion protocol — User-agent
groups and Disallow path prefixes. Allow/crawl-delay/wildcards are out
of scope (the admission filter is substring-based, mirroring
setBlocked's semantics, SiteCrawler.java:1209-1212).
"""

from __future__ import annotations

from sitecrawler_spark.config import RobotsRule


def parse_robots_txt(
    body: str, host: str, user_agent: str = "*"
) -> list[RobotsRule]:
    """Disallow rules applying to ``user_agent`` (exact-token or '*'
    groups). Later groups append; empty Disallow (allow-all) is skipped."""
    rules: list[RobotsRule] = []
    group_uas: list[str] = []
    in_rules = False  # a rule line ends the current User-agent run
    ua = user_agent.lower()
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_rules:
                group_uas = []
                in_rules = False
            group_uas.append(val.lower())
        else:
            in_rules = True
            if key == "disallow" and val and (
                "*" in group_uas or ua in group_uas
            ):
                rules.append(RobotsRule(host=host, disallow=val))
    return rules


def fetch_robots_rules(
    base_urls: list[str],
    user_agent: str = "*",
    timeout_s: float = 10.0,
    opener=None,
) -> list[RobotsRule]:
    """GET {origin}/robots.txt for each base URL's origin and parse.
    Missing/unreachable robots.txt ⇒ no rules for that host (the
    permissive default). Pass the opener from
    ``fetcher.build_opener_for`` to inherit proxy/SSL/cookie config."""
    import urllib.request

    from sitecrawler_spark.kernel import urls_py

    if opener is None:
        opener = urllib.request.build_opener()
    out: list[RobotsRule] = []
    seen_origins: set[str] = set()
    for base in base_urls:
        p = urls_py.java_url_parse(base)
        if p is None or not p.host:
            continue
        # keep the :port in the authority (java getHost drops it; the
        # admission patterns and the GET both need the full authority)
        rest = base.split("://", 1)[1]
        authority = rest.split("/", 1)[0].split("?", 1)[0]
        origin = f"{p.scheme}://{authority}"
        if origin in seen_origins:
            continue
        seen_origins.add(origin)
        try:
            req = urllib.request.Request(
                origin + "/robots.txt", headers={"User-Agent": user_agent}
            )
            with opener.open(req, timeout=timeout_s) as resp:
                body = resp.read().decode("utf-8", "replace")
        except Exception:
            continue  # permissive default
        out.extend(parse_robots_txt(body, authority, user_agent))
    return out
