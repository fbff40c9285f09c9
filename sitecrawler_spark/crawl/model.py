"""Single-threaded executable model of the reference crawl loop.

This is the ORACLE the Spark engine is tested against. It replicates,
in queue order, the canonical behavior of the reference at
threadLimit=1 (SURVEY.md §3.4):

- navigate() seeding            SiteCrawler.java:621-628
- setIncludePath admission      SiteCrawler.java:437-448 (enqueues the
  RAW path; exclusion checked on the base-prepended form)
- main loop                     SiteCrawler.java:1009-1051: poll →
  prependBaseUrlIfNeeded → isExcluded recheck → schedule fetch →
  insert url AND cleaned url into visited BEFORE the fetch completes
  (:1042-1047) → visitedCounter++
- stop conditions               SiteCrawler.java:1070-1100 (frontier
  empty; shortCircuitAfter: stops when visitedCounter > N, checked
  before each dequeue)
- page processing               ProcessPage.java:142-301 (error codes,
  redirect handling :368-379, link pipeline :203-267)
- page-consumer admission       SiteCrawler.java:943-957 (isExcluded +
  isScheduled per href, then enqueue)

Fetches resolve against the synthetic web (sitegen rows); unknown URL
→ 404. No network.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from urllib.parse import urljoin

from sitecrawler_spark import errors
from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.crawl.parse import parse_html_to_spans, raw_hrefs_from_spans
from sitecrawler_spark.kernel.urls_py import (
    clean_url,
    is_excluded,
    normalize2,
    prepend_base_if_needed,
)


@dataclass
class CrawlResult:
    visit_order: list[str] = field(default_factory=list)  # dequeue (fetch) order
    visited: set[str] = field(default_factory=set)        # the seen set (urls+cleans)
    pages: list[dict] = field(default_factory=list)       # per-fetch outcome rows
    links: list[tuple[str, str]] = field(default_factory=list)  # (src, dst-normalized)
    errors: list[tuple[str, int]] = field(default_factory=list)  # (url, error_code)


class ReferenceCrawlModel:
    def __init__(self, cfg: CrawlerConfig, web_rows: list[dict], use_html: bool = False):
        self.cfg = cfg
        self.web = {r["url"]: r for r in web_rows}
        self.use_html = use_html  # parse rendered HTML instead of stored spans

    # -- fetch simulation ---------------------------------------------------

    def _fetch(self, url: str):
        """Returns (row_or_None, status). Unknown URL → 404
        (FailingHttpStatusCodeException path)."""
        row = self.web.get(url)
        if row is None:
            return None, 404
        return row, row["status"]

    # -- ProcessPage.process() ----------------------------------------------

    def _process(self, location: str, res: CrawlResult) -> list[str]:
        """Returns the ProcessPage result collection (normalized hrefs +
        redirect targets), mirroring ProcessPage.java:142-267,368-379."""
        cfg = self.cfg
        row, status = self._fetch(location)

        if status >= 400 or (errors.is_redirect(status) and cfg.disable_redirects):
            # throw-on-bad-status (WebClientFactory.java:85) →
            # FailingHttpStatusCodeException → handleException
            out: list[str] = []
            res.errors.append((location, status))
            res.pages.append(
                {"url": location, "status": status, "error_code": status, "spans": None}
            )
            if errors.is_redirect(status) and cfg.disable_redirects:
                # handleRedirect (ProcessPage.java:368-379): normalize the
                # Location header against baseUrl (NOT baseUrlSecure)
                redirect = normalize2(row["redirect_location"], cfg.base_url)
                out.append(redirect)
            return out

        if errors.is_redirect(status) and not cfg.disable_redirects:
            # redirects followed inside the client: chase the chain; the
            # final page is processed under the ORIGINAL location
            # (ProcessPage ctor captures the requested URL)
            seen_chain = {location}
            cur = row
            while errors.is_redirect(cur["status"]):
                nxt_url = urljoin(cur["url"], cur["redirect_location"])
                if nxt_url in seen_chain or nxt_url not in self.web:
                    res.errors.append((location, 404))
                    res.pages.append(
                        {"url": location, "status": 404, "error_code": 404,
                         "spans": None}
                    )
                    return []
                seen_chain.add(nxt_url)
                cur = self.web[nxt_url]
            row = cur
            status = row["status"]
            if status >= 400:
                res.errors.append((location, status))
                res.pages.append(
                    {"url": location, "status": status, "error_code": status,
                     "spans": None}
                )
                return []

        # null/empty content dispatch (ProcessPage.java:160-185)
        if row["empty_body"]:
            res.errors.append((location, errors.HTTP_GONE))
            res.pages.append(
                {"url": location, "status": status,
                 "error_code": errors.HTTP_GONE, "spans": None}
            )
            return []

        if not row["content_type"].startswith("text/html"):
            # handleNonHtmlPage (ProcessPage.java:283-301): log only
            res.pages.append(
                {"url": location, "status": status, "error_code": None, "spans": None}
            )
            return []

        # processSucces (ProcessPage.java:203-267)
        spans = (
            parse_html_to_spans(row["html"]) if self.use_html else row["spans"]
        )
        hrefs = raw_hrefs_from_spans(spans)
        res.pages.append(
            {"url": location, "status": status, "error_code": None, "spans": spans}
        )

        page_to_visit: list[str] = []
        for href in hrefs:
            if href == "":  # isEmpty skip (:222-224)
                continue
            if cfg.base_url_secure is not None and location.startswith(
                cfg.base_url_secure
            ):
                href = normalize2(href, cfg.base_url_secure)
            else:
                href = normalize2(href, cfg.base_url)
                if cfg.make_relative_url_absolute:
                    if not href.startswith("http") and "://" not in href:
                        try:
                            href = urljoin(location, href)
                        except Exception:
                            pass
            if cfg.ignore_query_params:
                href = href.split("?")[0]
            if href in page_to_visit:  # per-page dedup (:252-255)
                continue
            res.links.append((location, href))  # urlFrom update (:257-263)
            page_to_visit.append(href)
        return page_to_visit

    # -- the crawl loop -----------------------------------------------------

    def crawl(self, seed_paths: list[str] | None = None) -> CrawlResult:
        cfg = self.cfg
        res = CrawlResult()
        to_visit: deque[str] = deque()
        visited: set[str] = res.visited

        def excl(u: str) -> bool:
            return is_excluded(
                u, visited, cfg.base_url, cfg.base_url_secure,
                cfg.allowed_suffixes, cfg.require_allowed_suffixes,
                list(cfg.blocked) + cfg.robots_blocked_patterns(), cfg.allowed,
                cfg.allowed_parameters, cfg.url_path_should_not_end_in_slash,
            )

        # setIncludePath (SiteCrawler.java:437-448)
        for path in seed_paths or []:
            full = prepend_base_if_needed(path, cfg.base_url, cfg.base_url_secure)
            if not excl(full) and path not in to_visit:
                to_visit.append(path)
        # navigate() default seed (SiteCrawler.java:621-628): baseUrl
        # preferred, baseUrlSecure only as fallback
        if not to_visit:
            if cfg.base_url is not None:
                to_visit.append(cfg.base_url)
            elif cfg.base_url_secure is not None:
                to_visit.append(cfg.base_url_secure)

        visited_counter = 0
        while to_visit:
            # shouldContinueCrawling (:1070-1100), checked before dequeue
            if cfg.short_circuit_after != 0 and visited_counter > cfg.short_circuit_after:
                break
            url = to_visit.popleft()
            url = prepend_base_if_needed(url, cfg.base_url, cfg.base_url_secure)
            if excl(url):  # recheck at dequeue (:1029)
                continue
            # visited insert BEFORE the fetch completes (:1042-1047)
            visited.add(url)
            clean = clean_url(
                url, cfg.allowed_parameters, cfg.url_path_should_not_end_in_slash
            )
            if clean is not None:
                visited.add(clean)
            visited_counter += 1
            res.visit_order.append(url)

            new_links = self._process(url, res)
            # page-consumer admission (:943-957)
            for href in new_links:
                if excl(href):
                    continue
                if href in to_visit:  # isScheduled (:1235-1240)
                    continue
                to_visit.append(href)
        return res

    # -- budgeted wave mode (target-only politeness semantics) --------------

    def crawl_budgeted(
        self,
        seed_paths: list[str] | None = None,
        budget: int = 0,
        host_budgets: dict[str, int] | None = None,
    ) -> CrawlResult:
        """Wave-scheduled crawl with a per-host politeness budget — the
        single-threaded oracle for the ENGINE's target-only budgeted
        semantics (the reference has no politeness layer; the contract
        is engine-defined and list/dict-implemented here independently):

          wave     = frontier rows passing dequeue checks, keep-first
                     per url then per clean form, in discovery order
          fetch    = per host, the first `budget` wave rows
          deferred = wave rows past the budget, order preserved
          admitted = outlinks after static filter + seen/clean/deferred
                     checks, keep-first per href, fresh orders appended
          frontier'= deferred ++ admitted

        budget=0 reduces to one-wave-per-frontier-slice BFS with the
        same admission rules."""
        from sitecrawler_spark.kernel.urls_py import url_host

        cfg = self.cfg
        res = CrawlResult()
        visited = res.visited

        def excl(u: str) -> bool:
            return is_excluded(
                u, visited, cfg.base_url, cfg.base_url_secure,
                cfg.allowed_suffixes, cfg.require_allowed_suffixes,
                list(cfg.blocked) + cfg.robots_blocked_patterns(), cfg.allowed,
                cfg.allowed_parameters, cfg.url_path_should_not_end_in_slash,
            )

        # seeding — identical to the sequential model / engine.seed
        frontier: list[tuple[str, int]] = []  # (raw_url, discovery_order)
        seen_raw: set[str] = set()
        for path in seed_paths or []:
            full = prepend_base_if_needed(path, cfg.base_url, cfg.base_url_secure)
            if not excl(full) and path not in seen_raw:
                frontier.append((path, len(frontier)))
                seen_raw.add(path)
        if not frontier:
            default = cfg.base_url if cfg.base_url is not None else cfg.base_url_secure
            frontier.append((default, 0))
        next_order = frontier[-1][1] + 1

        while frontier:
            # dequeue checks in discovery order
            wave_ok: list[tuple[str, str, int]] = []  # (full, clean, order)
            wave_urls: set[str] = set()
            wave_cleans: set[str] = set()
            for raw, order in sorted(frontier, key=lambda t: t[1]):
                full = prepend_base_if_needed(raw, cfg.base_url, cfg.base_url_secure)
                if excl(full):
                    continue
                clean = clean_url(
                    full, cfg.allowed_parameters,
                    cfg.url_path_should_not_end_in_slash,
                )
                if full in wave_urls:
                    continue
                if clean is not None and clean in wave_cleans:
                    continue
                wave_urls.add(full)
                if clean is not None:
                    wave_cleans.add(clean)
                wave_ok.append((full, clean, order))
            if not wave_ok:
                break

            # per-host politeness budget, keep-first in discovery order
            fetch: list[tuple[str, str, int]] = []
            deferred: list[tuple[str, int]] = []
            per_host: dict[str, int] = {}
            raw_by_order = {o: r for r, o in frontier}
            overrides = host_budgets or {}
            for full, clean, order in wave_ok:
                h = url_host(full)
                # per-host override (robots Crawl-delay analog) wins;
                # cap <= 0 means unlimited for that host
                cap = overrides.get(h, budget)
                if cap > 0 and per_host.get(h, 0) >= cap:
                    deferred.append((raw_by_order[order], order))
                    continue
                per_host[h] = per_host.get(h, 0) + 1
                fetch.append((full, clean, order))

            # visited insert BEFORE fetch, then fetch+process in order
            cand: list[tuple[str, int, int]] = []  # (href, parent_order, pos)
            for full, clean, _ in fetch:
                visited.add(full)
                if clean is not None:
                    visited.add(clean)
                res.visit_order.append(full)
            for full, _clean, order in fetch:
                links = self._process(full, res)
                for pos, href in enumerate(links):
                    cand.append((href, order, pos))

            # admission (engine wave semantics)
            deferred_raws = {r for r, _ in deferred}
            admitted: list[tuple[str, int]] = []
            seen_href: set[str] = set()
            for href, _po, _lp in sorted(cand, key=lambda t: (t[1], t[2])):
                if excl(href):  # includes visited(url) + visited(clean)
                    continue
                if href in deferred_raws or href in seen_href:
                    continue
                seen_href.add(href)
                admitted.append((href, next_order))
                next_order += 1
            frontier = deferred + admitted
        return res
