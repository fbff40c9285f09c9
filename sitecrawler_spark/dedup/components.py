"""Connected components over near-duplicate pair graphs.

Dedup pipelines need clusters, not pairs: every document in a
connected component of the near-dup graph is the "same" document, and
exactly one canonical representative per component is kept. This is
the cluster step that sits after ``minhash_lsh_pairs`` /
``embedding_neardup_pairs``.

Algorithm: iterative min-label propagation — every node starts with
label = own id; each round every node takes the min label over itself
and its neighbors; fixpoint when no label changes. Labels only ever
decrease, so SUM(label) is a monotone convergence witness (one scalar
aggregate per round — no row data ever collected to the driver).
Rounds needed = graph diameter; near-dup components are dense blobs
with tiny diameters, so this converges in a handful of rounds in
practice. For adversarial long-chain graphs at 100 TB the
O(log n)-round alternating large-star/small-star algorithm (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC 2014)
drops in behind the same signature; the propagation round below is the
small-star primitive of that algorithm.

Each round is: one shuffle join (labels onto edge endpoints) + one
groupBy(id).min with map-side combine. ``localCheckpoint`` after every
round cuts the lineage so round k's plan does not re-execute rounds
1..k-1 (Spark re-runs un-checkpointed iterative lineage from scratch —
the classic iterative-DataFrame trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component_id) for every node; component_id = min node id
    reachable in the undirected graph. Isolated nodes keep their own
    id. Deterministic — safe for the hash-compare gate."""
    # undirected: propagate across both orientations
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    und = fwd.unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    # the convergence witness (SUM(label)) rides each round's
    # checkpoint as an Observation — previously a separate 1-row agg
    # job per round, doubling the job count of the iteration
    obs0 = Observation()
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).cast("long").alias("label")
    ).observe(obs0, F.sum("label").alias("s")).localCheckpoint(eager=True)
    prev_sum = obs0.get["s"]

    for _ in range(max_rounds):
        msgs = (
            und.join(labels, und.src == labels.id)
            .select(F.col("dst").alias("id"), "label")
        )
        obs = Observation()
        labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .observe(obs, F.sum("label").alias("s"))
            .localCheckpoint(eager=True)
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("label").alias("component_id"))


def _large_star(und: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. 2014): every node connects its
    strictly-larger neighbors to the minimum of its closed
    neighborhood. und = (u, v) with both orientations present."""
    mins = und.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("u"))
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), m.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(pairs: DataFrame) -> DataFrame:
    """Small-star round: canonicalize edges to point at the smaller
    endpoint, then every node connects its smaller-or-equal neighbors
    (and itself) to the minimum of that set."""
    down = pairs.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = down.groupBy("u").agg(F.min("v").alias("_mn"))
    withm = down.join(mins, "u")
    to_min = withm.select(F.col("v").alias("a"), F.col("_mn").alias("b"))
    self_to_min = withm.select(
        F.col("u").alias("a"), F.col("_mn").alias("b")
    ).distinct()
    return (
        to_min.unionByName(self_to_min)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components_alternating(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — O(log n) rounds on ANY graph, vs O(diameter) for
    min-label propagation. Use this for long-chain/adversarial graphs;
    propagation wins on the dense small-diameter blobs near-dup
    pipelines produce. Same output contract as connected_components
    (equality property-tested on random graphs + a 64-chain)."""
    pairs = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_rounds):
        und = pairs.select("a", "b").unionByName(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).select(F.col("a").alias("u"), F.col("b").alias("v"))
        pairs = _small_star(_large_star(und)).localCheckpoint(eager=True)
        # fixpoint witness: count + xor of endpoint hashes (one 1-row
        # agg; xor is order-independent and cannot overflow under ANSI)
        sig = tuple(
            pairs.agg(
                F.count(F.lit(1)),
                F.expr("bit_xor(xxhash64(a, b))"),
            ).first()
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    # at the fixpoint, pairs is a star forest (leaf → min root)
    labels = nodes.select(F.col(id_col).alias("id")).join(
        pairs.select(F.col("a").alias("id"), F.col("b").alias("_root")),
        "id", "left",
    )
    return labels.select(
        "id",
        F.coalesce(F.col("_root"), F.col("id")).cast("long").alias(
            "component_id"
        ),
    )


def dedup_clusters(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Canonical-document selection: components + per-cluster size and
    an is_canonical flag (the minimum id of each component is kept —
    deterministic, matches exact_dedup's keep-lowest-id rule)."""
    comp = connected_components(nodes, edges, id_col, src_col, dst_col)
    sizes = comp.groupBy("component_id").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component_id")
        .select(
            "id", "component_id", "cluster_size",
            (F.col("id") == F.col("component_id")).alias("is_canonical"),
        )
    )
