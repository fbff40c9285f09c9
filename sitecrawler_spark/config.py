"""Crawler configuration surface.

Parity with the reference's config knobs:
- ``beans/CrawlerConfiguration.java:12-30`` (baseUrl, baseUrlSecure,
  threadLimit, downloadVsProcessRatio, maxProcessWaitingRatio,
  maxProcessWaiting, shortCircuitAfter, disableRedirects,
  enabledJavascript)
- ``SiteCrawler.java`` setters: allowedSuffixes defaults
  (``SiteCrawler.java:830-835``), requireAllowedSuffixes
  (``:96,528-530``), blocked/allowed pattern sets (``:116,121``),
  ignoreQueryParams / makeRelativeUrlAbsolute
  (``navigation/ProcessPage.java:83,95``).

Target-only additions required by the north rule: per-host politeness
budget, robots.txt rules (compiled into the blocked predicate — the
reference explicitly does NOT honor robots, README.md:159-160, and
tells users to feed disallow rules to setBlocked), host-salting for
hot-domain skew, and wave-size caps (the micro-batch analog of
``maxProcessWaiting`` backpressure, ``SiteCrawler.java:1058-1063``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


DEFAULT_ALLOWED_SUFFIXES = ["/", ".jsp", ".htm", ".html"]  # SiteCrawler.java:830-835


@dataclass
class RobotsRule:
    """One robots.txt disallow rule, compiled into the blocked predicate."""

    host: str
    disallow: str  # path prefix


@dataclass
class CrawlerConfig:
    """All knobs for one crawl. Broadcast to executors as plain literals."""

    base_url: str | None = None          # e.g. "http://www.salesforce.com"
    base_url_secure: str | None = None   # e.g. "https://www.salesforce.com"

    # Admission control (SiteCrawler.java:1152-1227)
    allowed_suffixes: list[str] = field(
        default_factory=lambda: list(DEFAULT_ALLOWED_SUFFIXES)
    )
    require_allowed_suffixes: bool = True
    blocked: list[str] = field(default_factory=list)    # substring patterns
    allowed: list[str] = field(default_factory=list)    # substring whitelist

    # Link rewriting (ProcessPage.java:83,95,226-250)
    ignore_query_params: bool = False
    make_relative_url_absolute: bool = False

    # URL cleaning (URLCleaner.java:13-42)
    url_path_should_not_end_in_slash: bool = True
    allowed_parameters: list[str] = field(default_factory=list)

    # Crawl loop control
    # frontier dequeue policy (north rule "priority queue"): "fifo" =
    # strict reference parity (pure discovery order); "depth" = BFS-
    # strict (depth, discovery_order) — shallow pages first under wave
    # caps/budgets; "host_depth" = (host, depth, discovery_order) — the
    # north star's partitioned priority key, grouping a host's budgeted
    # slots before going deeper; "host_score" = (-host_scores[host],
    # discovery_order) — quality-driven scheduling from a score table
    # (e.g. PageRank of the previous crawl's host graph). Non-FIFO
    # modes are target-only additions; the reference-parity gates all
    # run in fifo.
    frontier_priority: str = "fifo"
    host_scores: dict[str, float] = field(default_factory=dict)
                                          # frontier_priority="host_score":
                                          # higher-scored hosts dequeue
                                          # first under wave caps (e.g.
                                          # host PageRank from a prior
                                          # crawl); unlisted hosts = 0
    short_circuit_after: int = 0          # 0 = unlimited (SiteCrawler.java:242,477-491)
    disable_redirects: bool = False       # SiteCrawler.java:252,503-512
    enable_javascript: bool = False       # kept for config parity; parser is static HTML

    # Retry policy (WebClientExtended.java:48,53,62)
    max_retries: int = 5
    backoff_base_ms: int = 10_000

    # Live-HTTP client config (WebClientFactory.java:47-105;
    # SiteCrawler.java:545-569). Applied pool-wide — every fetch task
    # builds its opener from these, the analog of the factory stamping
    # every pooled WebClient identically.
    user_agent: str = "Mozilla/5.0 (compatible; sitecrawler-spark/0.1)"
    cookies: list[tuple[str, str]] = field(default_factory=list)  # addCookie (SiteCrawler.java:260,545-569)
    proxy: str | None = None              # "host:port" ≙ PROXY_STRING (WebClientFactory.java:47-60)
    insecure_ssl: bool = False            # setUseInsecureSSL (WebClientFactory.java:74-80)
    throw_on_failing_status: bool = False # setThrowExceptionOnFailingStatusCode (WebClientFactory.java:81-90)
    fetch_timeout_s: float = 10.0         # setTimeout (WebClientFactory.java:91-105)
    fetch_salts: int = 1                  # host-salt groups in the live fetch stage
    max_redirect_hops: int = 20           # follow-mode chain bound (HtmlUnit default ballpark)
    http_cache_size: int = 10_240         # per-executor response LRU entries
                                          # (WebClientPool.java:55-69); 0 = off

    # Target-only scale knobs (north rule)
    politeness_budget: int = 0            # max fetches per host per wave; 0 = unlimited
    host_budgets: dict[str, int] = field(default_factory=dict)
                                          # per-host overrides of the wave
                                          # budget (robots Crawl-delay
                                          # analog: slower hosts get a
                                          # smaller per-wave cap); a host
                                          # mapped to 0 is unlimited
    max_wave_size: int = 0                # global wave cap (≙ maxProcessWaiting); 0 = unlimited
    host_salts: int = 1                   # salt buckets for hot-host skew
    # Wave-scoped AQE partition sizing (guide §2.2/§2.4): during a wave
    # the engine sets adaptive.coalescePartitions.parallelismFirst=false
    # with this advisory size, so the many tiny per-wave shuffles
    # (anti-joins, dedup windows, politeness windows) coalesce to
    # byte-sized partitions instead of fanning every KB-scale exchange
    # out to spark.sql.shuffle.partitions tasks. Scale-adaptive by
    # construction: AQE only coalesces DOWN — a 100-TB wave on a
    # cluster-tuned shuffle.partitions setting is untouched, while a
    # 44-row wave runs 1-partition stages. 0 disables the override.
    # 8 MiB (not the 64 MiB global default) keeps the vectorized
    # clean/normalize UDF stages parallel on mid-size waves.
    wave_shuffle_advisory_bytes: int = 8 * 1024 * 1024
    host_buckets: int = 8                 # bucket(host) partitioning of state tables
    order_partitions: int | None = None   # force assign_global_order's ranged
                                          # path with N partitions (None = auto:
                                          # ranged only above the ~1M fast-path
                                          # threshold)
    robots_rules: list[RobotsRule] = field(default_factory=list)

    # Seen-filter prefilter layer (north rule: bloom; cuckoo when
    # deletion is needed). The exact visited table is ALWAYS the
    # backstop — filters only cut the anti-join shuffle.
    seen_filter: str | None = None        # None | "bloom" | "cuckoo"
    seen_filter_expected_n: int = 1_000_000
    seen_filter_fpp: float = 0.01
    bloom_n_shards: int | None = None     # None = auto (~8 MiB/shard)
    bloom_max_hot_shards: int | None = None  # cap driver-resident shard
                                          # arrays; evicted shards spill as
                                          # .npy artifacts under the state
                                          # dir (Iceberg state-table analog)
    cuckoo_n_shards: int = 1              # independent sub-filters keyed by
                                          # xxhash64(key,9) % n (same routing
                                          # as the bloom shards)
    cuckoo_max_hot_shards: int | None = None  # LRU cap + .npy spill, mirror
                                          # of bloom_max_hot_shards

    # Config-bean parity with the reference's scaling knobs
    # (SiteCrawler.java:126,155,162; beans/CrawlerConfiguration.java).
    # They MAP onto Spark-native controls — the real slot count comes
    # from the cluster (local[N] / executor cores), not thread pools:
    #   thread_limit              ≙ I/O thread count → parallelism hint
    #   download_vs_process_ratio ≙ pageExecutor sizing
    #                               (ceil(threadLimit × ratio),
    #                                SiteCrawler.java:779)
    #   max_process_waiting_ratio ≙ heap-fraction cap on unprocessed
    #                               pages (SiteCrawler.java:784-789)
    # NOTE (not replicated): the reference's setDownloadVsProcessRatio
    # validator rejects values outside 0..1 even though the field's own
    # DEFAULT is 2.0, and its error message names the wrong field
    # (SiteCrawler.java:384-393) — we accept any ratio > 0.
    thread_limit: int | None = None
    download_vs_process_ratio: float = 2.0
    max_process_waiting_ratio: float = 0.4

    # Cross-wave retry re-admission of transient fetch errors (target-only;
    # the reference retries only inside one blocking fetch,
    # WebClientExtended.java:213-241). Requires deleting the failed URL
    # from the seen set — hence the cuckoo option above.
    retry_transient: bool = False

    def derived_page_slots(self) -> int | None:
        """pageExecutor size analog: ceil(threadLimit ×
        downloadVsProcessRatio) (SiteCrawler.java:779). None when
        thread_limit is unset (cluster decides)."""
        if self.thread_limit is None:
            return None
        return math.ceil(self.thread_limit * self.download_vs_process_ratio)

    def derived_max_process_waiting(self, heap_mb: float) -> int:
        """maxProcessWaiting from the heap fraction
        (SiteCrawler.java:784-789: maxHeap/1024² × ratio, rounded —
        the reference's variable is named gbMaxHeap but holds MB; the
        javadoc's own example '8 * 1024 * 0.4 = 3276' confirms the MB
        formula, which we follow)."""
        return int(heap_mb * self.max_process_waiting_ratio)

    def effective_max_wave_size(self) -> int:
        """Wave cap: explicit max_wave_size wins; else the derived page
        slots (unprocessed-pages bound per wave); else unlimited (0)."""
        if self.max_wave_size > 0:
            return self.max_wave_size
        slots = self.derived_page_slots()
        return slots if slots is not None else 0

    def effective_base(self) -> str:
        """Base used by prependBaseUrlIfNeeded (SiteCrawler.java:1133-1138):
        baseUrlSecure preferred, then baseUrl."""
        if self.base_url_secure is not None:
            return self.base_url_secure
        if self.base_url is not None:
            return self.base_url
        raise ValueError("Cannot have both base_url AND base_url_secure be None")

    def robots_blocked_patterns(self) -> list[str]:
        """Compile robots disallow rules to substring patterns of the same
        form as `blocked` — the integration path the reference README
        suggests (README.md:159-160): '<host><path-prefix>'."""
        return [f"{r.host}{r.disallow}" for r in self.robots_rules]
