"""Snapshot-versioned parquet state tables (Iceberg-shaped).

The engine's crawl state (frontier / visited / pages / links / metrics)
commits once per wave as an atomic snapshot: data files are written
first, then a manifest JSON is atomically renamed into place
(os.replace). Resume = read the latest manifest and continue the wave
loop — the micro-batch analog of the reference's hardPause/reset
lifecycle (SiteCrawler.java:412-430,798-801), with per-partition
lineage carried in the metrics table.

On a cluster this layer swaps for real Iceberg (`writeTo(...).append()`
+ snapshot ids) without touching engine logic — the interface is
"commit(wave, {table: DataFrame})" / "latest()". Parquet + manifest
gives the same atomic-visibility property locally: a torn write leaves
a stale manifest, never a half-visible snapshot.

Overwrite-tables (frontier) rewrite per wave; append-tables (visited,
pages, links, metrics) add a part per wave — visited commits only its
per-wave insert DELTA (rewriting the whole set per wave would be
O(history) per wave) and falls back to a replace commit on the rare
retry-deletion wave — and the manifest lists all live parts.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

OVERWRITE = "overwrite"
APPEND = "append"


class SnapshotStore:
    def __init__(self, root: str, tables: dict[str, str]):
        """tables: name -> OVERWRITE | APPEND"""
        self.root = root
        self.tables = tables
        os.makedirs(os.path.join(root, "_snapshots"), exist_ok=True)

    # -- manifest handling ---------------------------------------------------

    def _manifest_path(self, snap_id: int) -> str:
        return os.path.join(self.root, "_snapshots", f"{snap_id:08d}.json")

    # a .tmp manifest younger than this is assumed to belong to an
    # in-flight writer; only stale ones are torn writes safe to reap
    _TMP_GRACE_SEC = 60.0

    def _snapshot_files(self, reap_tmp: bool = False) -> list[str]:
        """Published manifests only: a crash between writing '<id>.json.tmp'
        and os.replace leaves a .tmp that sorts AFTER the real manifest —
        reading it would defeat the atomic-publish guarantee. Reads merely
        IGNORE .tmp files; reaping them is opt-in (gc/commit paths) and
        age-gated so a concurrent mid-publish writer's tmp is never
        deleted out from under its os.replace."""
        snap_dir = os.path.join(self.root, "_snapshots")
        out = []
        for name in os.listdir(snap_dir):
            if name.endswith(".json"):
                out.append(name)
            elif name.endswith(".tmp") and reap_tmp:
                path = os.path.join(snap_dir, name)
                try:
                    if time.time() - os.path.getmtime(path) > self._TMP_GRACE_SEC:
                        os.remove(path)  # stale torn write
                except OSError:
                    pass  # already replaced/removed by its writer
        return sorted(out)

    def latest(self) -> dict | None:
        snaps = self._snapshot_files()
        if not snaps:
            return None
        with open(os.path.join(self.root, "_snapshots", snaps[-1])) as f:
            return json.load(f)

    def snapshot_ids(self) -> list[int]:
        """Published snapshot ids, ascending."""
        return [int(name[:-5]) for name in self._snapshot_files()]

    def manifest(self, snap_id: int) -> dict:
        """The manifest published as snapshot ``snap_id`` (time-travel
        lookup — Iceberg's snapshot-id read)."""
        path = self._manifest_path(snap_id)
        if not os.path.exists(path):
            raise ValueError(
                f"no snapshot {snap_id}; have {self.snapshot_ids()}"
            )
        with open(path) as f:
            return json.load(f)

    def next_snapshot_id(self) -> int:
        """Monotonic allocation: 1 + the newest PUBLISHED id. Commit ids
        must never be derived from external counters like the engine's
        wave number — after a compaction (which publishes at latest+1..)
        a wave-numbered commit would land BELOW the compaction manifest,
        invisible to latest() and silently dropped by the next resume
        (ADVICE r03, high)."""
        m = self.latest()
        return (m["snapshot"] + 1) if m else 0

    def commit(
        self,
        snap_id: int,
        dfs: dict[str, DataFrame],
        meta: dict | None = None,
        repartition: dict[str, list] | None = None,
        replace: set[str] | None = None,
        base_snapshot_id: int | None = None,
    ) -> dict:
        """Write data files for this snapshot, then atomically publish
        the manifest. ``repartition[name]`` optionally names columns to
        hash-partition the written files by (bucket(host) analog).
        ``replace``: APPEND-mode tables whose part list is RESET to this
        commit's files (Iceberg's overwrite operation on an otherwise
        append table — e.g. the retry path rewrites the visited set
        after deletions, one wave in ten thousand).
        ``base_snapshot_id``: the snapshot this commit's APPEND deltas
        build on (defaults to latest). A caller that time-traveled to an
        older snapshot MUST pass it, or its deltas would append onto the
        newer state it rolled away from (Iceberg rollback semantics)."""
        prev = (
            self.manifest(base_snapshot_id)
            if base_snapshot_id is not None
            else self.latest()
        )
        manifest: dict = {
            "snapshot": snap_id,
            "ts": time.time(),
            "tables": dict(prev["tables"]) if prev else {n: [] for n in self.tables},
            "meta": meta or {},
        }
        for name, df in dfs.items():
            mode = self.tables[name]
            part_dir = os.path.join(self.root, name, f"s{snap_id:08d}")
            writer = df
            if repartition and name in repartition:
                writer = df.repartition(*repartition[name])
            writer.write.mode("overwrite").parquet(part_dir)
            if mode == OVERWRITE or (replace and name in replace):
                manifest["tables"][name] = [part_dir]
            else:
                manifest["tables"][name] = manifest["tables"].get(name, []) + [part_dir]
        tmp = self._manifest_path(snap_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(snap_id))
        return manifest

    def read(
        self, spark: SparkSession, name: str, snapshot_id: int | None = None
    ) -> DataFrame | None:
        """Read a state table — at the latest snapshot, or AS OF a prior
        ``snapshot_id`` (Iceberg time travel: the part list exactly as
        that manifest published it; later appends/compactions are
        invisible, and the parts stay on disk until expire_snapshots)."""
        m = self.manifest(snapshot_id) if snapshot_id is not None else self.latest()
        if not m or not m["tables"].get(name):
            return None
        return spark.read.parquet(*m["tables"][name])

    def compact(
        self,
        spark: SparkSession,
        name: str,
        snap_id: int,
        max_parts: int = 1,
        repartition_cols: list | None = None,
    ) -> dict | None:
        """Rewrite an APPEND table's accumulated per-wave part dirs into
        ``max_parts`` consolidated parts and publish a new snapshot
        whose manifest references only the rewritten files — the
        ``rewrite_data_files`` (bin-packing compaction) analog. At one
        part dir per wave, a 10^4-wave crawl otherwise leaves 10^4
        directories of small files: the classic many-small-files
        problem that degrades scan planning at 100 TB.

        Readers are never torn: the rewrite lands in a NEW directory
        and becomes visible only through the atomic manifest publish;
        old parts stay until ``expire_snapshots`` reaps them (time
        travel to pre-compaction snapshots keeps working)."""
        m = self.latest()
        if not m or not m["tables"].get(name):
            return None
        parts = m["tables"][name]
        if len(parts) <= max_parts:
            return None
        df = spark.read.parquet(*parts)
        out_dir = os.path.join(self.root, name, f"c{snap_id:08d}")
        writer = (
            df.repartition(*repartition_cols)
            if repartition_cols
            else df.coalesce(max_parts)
        )
        writer.write.mode("overwrite").parquet(out_dir)
        manifest = {
            "snapshot": snap_id,
            "ts": time.time(),
            "tables": {**m["tables"], name: [out_dir]},
            "meta": {**m.get("meta", {}), "compacted": name},
        }
        tmp = self._manifest_path(snap_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(snap_id))
        return manifest

    def diff_snapshots(
        self,
        spark: SparkSession,
        name: str,
        old_snapshot_id: int,
        new_snapshot_id: int,
        key_cols: list[str],
        fp_col: str,
    ) -> DataFrame:
        """Iceberg changelog-scan analog (CDC between two snapshots):
        classify rows of state table ``name`` as added / removed /
        changed / unchanged between ``old_snapshot_id`` and
        ``new_snapshot_id``, keyed by ``key_cols`` and compared by the
        pre-derived fingerprint column ``fp_col`` (an 8-byte hash, so
        the join carries keys + one long — never the payload). Plan:
        ONE full-outer sort-merge join on the keys, the honest shape at
        10^10 rows; real Iceberg derives the same result from
        data/delete manifests without reading unchanged files
        (ICEBERG.md maps the op)."""
        from pyspark.sql import functions as F

        old = self.read(spark, name, snapshot_id=old_snapshot_id)
        new = self.read(spark, name, snapshot_id=new_snapshot_id)
        if old is None or new is None:
            raise ValueError(
                f"diff_snapshots: table {name!r} missing in a snapshot"
            )
        o = old.select(*key_cols, F.col(fp_col).alias("_fp_old"))
        n = new.select(*key_cols, F.col(fp_col).alias("_fp_new"))
        j = o.join(n, key_cols, "full_outer")
        status = (
            F.when(F.col("_fp_old").isNull(), F.lit("added"))
            .when(F.col("_fp_new").isNull(), F.lit("removed"))
            .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
        )
        return j.select(*key_cols, status.alias("status"))

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)

    def expire_snapshots(self, keep: int = 2) -> None:
        """Drop manifests and data parts not referenced by the newest
        ``keep`` snapshots (Iceberg expire_snapshots analog)."""
        snap_dir = os.path.join(self.root, "_snapshots")
        snaps = self._snapshot_files(reap_tmp=True)
        if len(snaps) <= keep:
            return
        live: set[str] = set()
        for s in snaps[-keep:]:
            with open(os.path.join(snap_dir, s)) as f:
                m = json.load(f)
            for parts in m["tables"].values():
                live.update(parts)
        for s in snaps[:-keep]:
            os.remove(os.path.join(snap_dir, s))
        for name in self.tables:
            tdir = os.path.join(self.root, name)
            if not os.path.isdir(tdir):
                continue
            for part in os.listdir(tdir):
                p = os.path.join(tdir, part)
                if p not in live:
                    shutil.rmtree(p, ignore_errors=True)
