"""Similarity search over embedding columns (array<float>).

- ``cosine_sim``: native expression (zip_with dot product) — JVM-side.
- ``brute_force_topk``: exact baseline — broadcast the (small) probe
  set against the corpus, per-probe top-k via window. The corpus-side
  scan is embarrassingly parallel; this is the correctness oracle.
- ``lsh_topk``: the scale path — deterministic sign-random-projection
  LSH (random-hyperplane rounding per Charikar, STOC 2002; hyperplanes
  derived from the portable hash so DuckDB/tests can reproduce bucket
  assignment), candidates = probe bucket ∪ neighbors, exact re-rank
  inside buckets only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_sim(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / F.greatest(na * nb, F.lit(1e-12))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every probe row (excluding
    self). Probe set is broadcast; one pass over the corpus."""
    p = probes.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    crossed = c.join(F.broadcast(p), F.col("query_id") != F.col("neighbor_id"))
    scored = crossed.select(
        "query_id", "neighbor_id",
        F.round(cosine_sim(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 — reproducible anywhere."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane}dim{d}".encode()).hexdigest()
        out.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
    return out


def srp_bucket(vec: Column, dim: int, n_planes: int = 8, table: int = 0) -> Column:
    """Sign-random-projection bucket id: bit p = sign(vec · plane_p).
    ``table`` offsets the plane family — each LSH table uses an
    independent set of hyperplanes (multi-table probing)."""
    out = F.lit(0)
    for p in range(n_planes):
        plane = _hyperplane(dim, table * 1000 + p)
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 1,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: exact re-rank restricted to same-SRP-bucket
    candidates. Shuffle is on the (table, bucket) key; per-bucket work
    bounded. ``n_tables`` independent plane families trade one more
    corpus pass each for recall (the banding trick applied to SRP);
    ``multiprobe`` additionally probes every Hamming-1 neighbor bucket
    on the PROBE side only — the corpus is never re-hashed, the probe
    fan-out is (1 + n_planes)×. Per Lv et al., "Multi-Probe LSH" (VLDB
    2007). Recall vs brute force is pinned by tests/test_textops_dedup."""
    c_tables = []
    p_tables = []
    for t in range(n_tables):
        bkt = srp_bucket(F.col(vec_col), dim, n_planes, table=t)
        c_tables.append(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"),
                F.lit(t).alias("table"), bkt.alias("bucket"),
            )
        )
        if multiprobe:
            probe_bkts = F.explode(
                F.array(bkt, *[
                    bkt.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
                ])
            )
        else:
            probe_bkts = bkt
        p_tables.append(
            probes.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                F.lit(t).alias("table"), probe_bkts.alias("bucket"),
            )
        )
    c = c_tables[0]
    p = p_tables[0]
    for t in range(1, n_tables):
        c = c.unionByName(c_tables[t])
        p = p.unionByName(p_tables[t])
    cand = (
        c.join(F.broadcast(p), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair found by several tables is scored once
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine_sim(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
