"""Multi-dimensional data-layout clustering: Z-order (Morton) keys.

Sorting/range-partitioning a table by the bit-interleaved key of
several quantized columns co-locates rows that are close in EVERY
dimension, so per-file min/max statistics become selective for
predicates on ANY of the interleaved columns — the data-skipping
layout Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order z-ordering
use (Morton 1966; see also the Delta/Iceberg public docs). At 100 TB
the key is computed map-side (pure integer codegen expressions, no
shuffle) and the single range-partitioned write replaces per-query
full scans with min/max pruned reads on every z-ordered column.

Everything is exact integer arithmetic — quantization bounds are
passed explicitly (no data-dependent min/max scan), so the key is
deterministic and the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Map c (clamped to [lo, hi]) onto the integer grid [0, 2^bits):
    floor((c - lo) * 2^bits / (hi - lo)), exact in long arithmetic for
    integer inputs and spans."""
    n_cells = 1 << bits
    span = hi - lo
    clamped = F.least(F.greatest(c.cast("double"), F.lit(float(lo))),
                      F.lit(float(hi)))
    cell = F.floor((clamped - F.lit(float(lo))) * n_cells / F.lit(span))
    return F.least(cell.cast("long"), F.lit(n_cells - 1))


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit j of column i lands at position
    j * len(cols) + i. A static shiftleft/or expression tree — fully
    whole-stage-codegen'd, zero Python, O(bits × n_cols) ops/row."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * n + i))
    return out


def zorder_key(
    cols: list[Column], bounds: list[tuple[float, float]], bits: int = 16
) -> Column:
    """Z-order key over ``cols`` with explicit quantization ``bounds``
    [(lo, hi), ...]; interleaves ``bits`` bits per column (≤ 63 total
    to stay in a signed long)."""
    if len(cols) * bits > 63:
        raise ValueError("interleaved width exceeds 63 bits")
    q = [quantize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    return interleave_bits(q, bits)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bounds: list[tuple[float, float]],
    bits: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for multi-dim data skipping: range-partition +
    sort by the z-order key (one shuffle, then sorted parquet writes
    give tight per-file min/max on every interleaved column)."""
    key = zorder_key([F.col(c) for c in cols], bounds, bits)
    out = df.withColumn("_zkey", key)
    if n_partitions:
        out = out.repartitionByRange(n_partitions, "_zkey")
    else:
        out = out.repartitionByRange("_zkey")
    return out.sortWithinPartitions("_zkey")


def balanced_shards(
    df: DataFrame,
    weight_col: str,
    n_shards: int,
    tie_col: str,
    out_col: str = "shard",
) -> DataFrame:
    """Weight-balanced shard assignment for training-data output files:
    place each row in one of ``n_shards`` shards so per-shard weight
    totals (token counts) come out near-equal — the writer layout a
    trainer wants so every data-parallel reader finishes its shard at
    the same time (no straggler file).

    Algorithm: serpentine (boustrophedon) LPT. Rank rows by weight
    descending (ties by ``tie_col``), then walk shards 0..S-1, S-1..0,
    0..S-1, ... assigning one row per step: pos = rank mod 2S,
    shard = pos if pos < S else 2S-1-pos. Reversing direction each
    pass compensates the within-pass bias of plain round-robin (shard
    0 would otherwise get the heaviest row of EVERY pass); for weights
    that decay smoothly the max/min shard-total ratio approaches 1
    like classic Longest-Processing-Time scheduling (Graham 1969)
    while staying deterministic and oracle-expressible (plain
    row_number arithmetic, no greedy state).

    Domain caveat: the guarantee needs max(weight) ≪ total/S — true
    for corpus token counts, which sequence chunking bounds upstream.
    A heavy-head distribution where ONE row fills a shard's quota
    needs stateful greedy LPT, which is inherently sequential; there
    the right distributed move is chunking the giant row, not a
    cleverer dealer.

    Scale shape: ranking reuses assign_global_order's two-pass ranged
    path (range-partition on the sort key, local rank + per-partition
    offsets) — never a single-partition global window at scale; the
    serpentine map is pure integer arithmetic on the rank (map-side,
    codegen). One range shuffle total.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from sitecrawler_spark.operators.ordering import assign_global_order

    ranked = assign_global_order(
        df.withColumn("_negw", -F.col(weight_col).cast("long")),
        ["_negw", tie_col],
        out_col="_rank",
    )
    pos = F.col("_rank") % (2 * n_shards)
    shard = F.when(pos < n_shards, pos).otherwise(
        F.lit(2 * n_shards - 1) - pos
    )
    return ranked.withColumn(out_col, shard.cast("int")).drop(
        "_negw", "_rank"
    )
