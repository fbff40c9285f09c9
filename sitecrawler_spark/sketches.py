"""Deterministic distributed sketches as pure DataFrame ops.

Both sketches use the portable md5 hash, so the independent DuckDB
oracle reproduces them exactly: Count-Min counters are exact integers
and HLL registers are small ints whose 2^-reg terms are exact powers
of two (their sum is exact in IEEE double) — no cross-engine float
drift anywhere.

- Count-Min (Cormode & Muthukrishnan, J.Algorithms 2005): d hash rows
  × w counters; estimate = min over rows. One-sided error (never
  undercounts). Build = one groupBy((row, bucket)) — at 100 TB the
  sketch is d×w counters regardless of input size, the whole point.
- HyperLogLog (Flajolet et al., AOFA 2007): register j = max leading-
  zero rank of hashes landing in bucket j; estimate = bias-corrected
  harmonic mean, linear-counting fallback for the small range. Build
  = one groupBy(bucket).max — mergeable state, constant size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sitecrawler_spark.kernel.urls_spark import portable_hash64


def _cms_bucket(c: Column, row: int, w: int) -> Column:
    return F.pmod(
        portable_hash64(F.concat(F.lit(f"cms{row}:"), c)), F.lit(w)
    )


def _sketch_params(df: DataFrame, field: str) -> dict | None:
    """Build-parameter metadata stamped on ``field`` by the build
    functions below, or None for tables built elsewhere."""
    for f in df.schema.fields:
        if f.name == field and f.metadata:
            return dict(f.metadata)
    return None


def _require_compatible(tables, field: str, kind: str) -> dict | None:
    """Merging sketches built with different parameters (d/w, lo/hi/
    nbins, p/bits) silently yields garbage — bucket ids overlap, so the
    merge 'succeeds' numerically (ADVICE r04). The build functions
    stamp their params as schema-field metadata; this refuses a merge
    whose stamped params disagree. Unstamped tables (built externally)
    skip the check — the docstring contract still applies."""
    stamped = [m for m in (_sketch_params(t, field) for t in tables) if m]
    distinct = {tuple(sorted(m.items())) for m in stamped}
    if len(distinct) > 1:
        raise ValueError(
            f"{kind} merge of incompatible sketches: "
            f"{sorted(distinct)} — rebuild with matching parameters"
        )
    return stamped[0] if stamped else None


def cms_build(df: DataFrame, col: str, d: int = 3, w: int = 64) -> DataFrame:
    """Count-Min table: (row, bucket, cnt) — d×w cells max.

    ONE corpus scan: each token emits its d (row, bucket) cells as an
    inline array that explodes into the single groupBy — not d unioned
    passes over the token stream (VERDICT r03 #4). The aggregation
    keeps map-side partial combine, so the exchange carries at most
    d×w rows per input partition."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _cms_bucket(F.col(col), j, w).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt", metadata={"sketch": "cms", "d": d, "w": w}))
    )


def cms_estimate(
    cms: DataFrame, items: DataFrame, col: str, d: int = 3, w: int = 64
) -> DataFrame:
    """Point-query estimates for ``items[col]``: min over the d row
    counters (broadcast the d×w table — it is constant-size)."""
    est = items
    for j in range(d):
        t = cms.filter(F.col("row") == j).select(
            F.col("bucket").alias(f"_b{j}"), F.col("cnt").alias(f"_c{j}")
        )
        est = (
            est.withColumn(f"_b{j}", _cms_bucket(F.col(col), j, w))
            .join(F.broadcast(t), f"_b{j}", "left")
            .withColumn(f"_c{j}", F.coalesce(F.col(f"_c{j}"), F.lit(0)))
        )
    mins = F.least(*[F.col(f"_c{j}") for j in range(d)])
    return est.select(col, mins.alias("est"))


def _rho_chain(v: Column, bits: int):
    """Rank of the leftmost 1-bit in a ``bits``-wide value (1-based;
    bits+1 when v == 0) as an exact integer CASE chain — no float log,
    so DuckDB mirrors it bit-for-bit."""
    expr = F.lit(bits + 1)
    # build from the smallest threshold up so the largest matches win
    chain = F.when(v >= F.lit(1 << (bits - 1)), F.lit(1))
    for r in range(2, bits + 1):
        chain = chain.when(v >= F.lit(1 << (bits - r)), F.lit(r))
    return F.coalesce(chain, expr)


def hll_register_cols(
    col: Column, p: int = 6, bits: int = 16
) -> tuple[Column, Column]:
    """(bucket, rho) columns for one value: bucket = top p bits of the
    portable hash, rho = leftmost-1 rank of the next ``bits`` bits.
    Shared by the batch sketch below and the streaming register op
    (streaming/stream_ops.streaming_hll_registers)."""
    h = portable_hash64(col)
    bucket = F.shiftrightunsigned(h, 60 - p).cast("int")
    suffix = h.bitwiseAND(F.lit((1 << (60 - p)) - 1))
    window = F.shiftrightunsigned(suffix, 60 - p - bits)
    return bucket, _rho_chain(window, bits)


def hll_registers(
    df: DataFrame, col: str, p: int = 6, bits: int = 16
) -> DataFrame:
    """HLL register table: (bucket, reg) with 2^p buckets; bucket =
    top p bits of the portable hash, reg = max rho of the next
    ``bits`` bits. One groupBy — mergeable (max) state."""
    bucket, rho = hll_register_cols(F.col(col), p, bits)
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias(
            "reg", metadata={"sketch": "hll", "p": p, "bits": bits}))
    )


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """Bias-corrected estimate from the register table (single row:
    (est)). The 2^-reg terms are exact powers of two, so the harmonic
    sum is exact in double regardless of aggregation order; only the
    final multiply/divide and the linear-counting log are rounded."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s"),
        F.count("*").alias("nonzero"),
    )
    est = F.lit(alpha * m * m) / (F.col("s") + (F.lit(m) - F.col("nonzero")))
    zeros = F.lit(m) - F.col("nonzero")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    out = F.when(
        (est <= F.lit(2.5 * m)) & (zeros > 0), small
    ).otherwise(est)
    return agg.select(F.round(out, 4).alias("est"))


# --- fixed-boundary histogram quantile sketch ------------------------------


def hist_build(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Fixed-boundary histogram: (keys..., bin, cnt), ≤ nbins rows per
    key. The third mergeable sketch next to CMS (frequency) and HLL
    (cardinality): bins merge by SUM, so partial histograms combine
    map-side and across batches/streams, and quantile queries need a
    single tiny-table pass instead of the full sort an exact
    percentile costs at scale. Values outside [lo, hi) clamp into the
    edge bins (the sketch stays total)."""
    width = (hi - lo) / nbins
    b = (
        F.least(
            F.lit(nbins - 1),
            F.greatest(F.lit(0), F.floor((F.col(col) - lo) / width)),
        )
    ).cast("int")
    return df.groupBy(*keys, b.alias("bin")).agg(
        F.count("*").alias(
            "cnt",
            metadata={"sketch": "hist", "lo": lo, "hi": hi, "nbins": nbins},
        )
    )


def hist_quantiles(
    hist: DataFrame, quantiles: list[tuple[str, int, int]],
    lo: float, hi: float, nbins: int, keys: tuple[str, ...] = (),
) -> DataFrame:
    """Quantile estimates from a histogram sketch, one output row per
    key with a column per quantile. ``quantiles`` are exact rationals
    (name, num, den) — e.g. ("p50", 50, 100) — so the target rank
    r = ceil(q·N) is INTEGER arithmetic, reproducible bit-for-bit in
    any engine; only the final within-bin interpolation
    (bin + (r - cum_before)/cnt) · width touches floats, and it is
    rounded to 6dp. Estimate error is bounded by one bin width.
    The hist table is ≤ nbins·|keys| rows — this whole pass is a
    near-free window over a tiny frame."""
    width = (hi - lo) / nbins
    kcols = list(keys)
    w = (
        Window.partitionBy(*kcols).orderBy("bin")
        if kcols
        else Window.partitionBy(F.lit(1)).orderBy("bin")
    )
    h = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*kcols) if kcols
                               else Window.partitionBy(F.lit(1)))
    )
    aggs = []
    for name, num, den in quantiles:
        # r = ceil(n·num/den) in pure INTEGER arithmetic (no float ceil)
        r = F.expr(f"(n * {num} + {den} - 1) div {den}")
        hit = (F.col("cum") >= r) & (F.col("cum") - F.col("cnt") < r)
        frac = (r - (F.col("cum") - F.col("cnt"))).cast("double") / F.col(
            "cnt"
        ).cast("double")
        est = F.round((F.col("bin") + frac) * F.lit(width) + F.lit(lo), 6)
        aggs.append(F.max(F.when(hit, est)).alias(name))
    return h.groupBy(*kcols).agg(*aggs)


def hll_registers_by(
    df: DataFrame, col: str, keys: list[str], p: int = 6, bits: int = 16
) -> DataFrame:
    """Grouped HLL register tables: (keys..., bucket, reg) — one sketch
    per key group, built in a single map-side-combined groupBy over the
    base data."""
    bucket, rho = hll_register_cols(F.col(col), p, bits)
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias(
            "reg", metadata={"sketch": "hll", "p": p, "bits": bits}))
    )


def hll_merge(*regs: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge register tables to a coarser grouping (or global with no
    keys): max per bucket. This is the sketch algebra that matters at
    100 TB — a rollup re-aggregates the TINY register tables, never the
    base data, and max is associative/commutative/idempotent, so any
    merge tree (partitions, batches, stream epochs) yields the exact
    same registers a direct build would (test-pinned). Accepts several
    register tables (unioned before the rollup); refuses tables stamped
    with different (p, bits)."""
    meta = _require_compatible(regs, "reg", "HLL")
    keys = keys or []
    out = regs[0]
    for t in regs[1:]:
        out = out.unionByName(t)
    reg = F.max("reg").alias("reg", metadata=meta) if meta else F.max(
        "reg").alias("reg")
    return out.groupBy(*keys, "bucket").agg(reg)


def hll_estimate_by(
    registers: DataFrame, keys: list[str], p: int = 6
) -> DataFrame:
    """Grouped bias-corrected estimates: (keys..., est) — same exact
    powers-of-two harmonic sum as hll_estimate, one row per group."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s"),
        F.count("*").alias("nonzero"),
    )
    est = F.lit(alpha * m * m) / (F.col("s") + (F.lit(m) - F.col("nonzero")))
    zeros = F.lit(m) - F.col("nonzero")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    out = F.when((est <= F.lit(2.5 * m)) & (zeros > 0), small).otherwise(est)
    return agg.select(*keys, F.round(out, 4).alias("est"))


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Merge Count-Min tables built over disjoint (or overlapping —
    CMS counts multisets) inputs: elementwise SUM per (row, bucket).
    Exact algebra: a merge of partial tables equals the direct build
    over the concatenated input (sum is associative/commutative), so
    partition/batch/stream partials combine without rescans
    (test-pinned equality). Refuses tables stamped with different
    (d, w)."""
    meta = _require_compatible(tables, "cnt", "CMS")
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    cnt = F.sum("cnt").alias("cnt", metadata=meta) if meta else F.sum(
        "cnt").alias("cnt")
    return out.groupBy("row", "bucket").agg(cnt)


def hist_merge(
    *hists: DataFrame, keys: tuple[str, ...] = ()
) -> DataFrame:
    """Merge fixed-boundary histograms (same lo/hi/nbins): SUM per
    (keys..., bin). Same exact merge algebra as cms_merge — partial
    histograms over input splits sum to the direct build
    (test-pinned), keeping quantile queries a tiny-table pass at any
    scale. Refuses tables stamped with different (lo, hi, nbins)."""
    meta = _require_compatible(hists, "cnt", "histogram")
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    cnt = F.sum("cnt").alias("cnt", metadata=meta) if meta else F.sum(
        "cnt").alias("cnt")
    return out.groupBy(*keys, "bin").agg(cnt)
