"""Table sinks — S7 (CSV manifest) and S8 (keyed upsert).

S7 mirrors the reference's S3-Batch manifest write (ref:
backend/import_dataset/task.py:87-107): one CSV of (bucket, key[, extra])
rows consumed by a downstream bulk copier.

S8 mirrors single-row ``model.save()`` upserts (ref:
backend/datasets/create.py:37-38) generalized to set-oriented MERGE
semantics over parquet: new rows replace same-key old rows, everything
else is carried forward. Without a transactional table format the engine
uses the read-merge-rewrite pattern with an atomic directory swap; on
Delta/Iceberg the same call maps to ``MERGE INTO`` and the swap
disappears. Partition-aware: when ``partition_by`` is given, only
partitions containing updated keys are rewritten (the 100 TB path —
rewriting the full table per upsert batch would be O(table) not
O(delta)).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_manifest_csv(manifest: DataFrame, path: str, header: bool = False) -> None:
    """S7: write a copy-manifest CSV. Quoting matches csv.writer defaults
    (quote only when needed), which is what the reference's downstream
    parser expects."""
    manifest.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def upsert_parquet(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """S8: MERGE-style upsert into a parquet table directory.

    Semantics: rows in ``updates`` win on key collision; unmatched
    existing rows survive. Equivalent SQL:
    ``MERGE INTO t USING u ON <keys> WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *``.
    """
    updates = updates.dropDuplicates(key_cols)
    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path)
        # left_anti: existing rows whose key is NOT being updated
        survivors = existing.join(
            updates.select(*key_cols).hint("broadcast"), key_cols, "left_anti"
        )
        merged = survivors.unionByName(updates)
    else:
        merged = updates

    if partition_by and os.path.exists(table_path):
        # Partition-pruned rewrite: only touch partitions holding updated
        # keys (dynamic partition overwrite). "Touched" must cover BOTH
        # sides of a key's move: the partitions the updates land in AND
        # the partitions where those keys currently live — otherwise an
        # update that changes a key's partition value leaves the old row
        # stranded in an unrewritten partition (duplicate key).
        touched = {
            tuple(r)
            for r in updates.select(*partition_by).distinct().collect()
        }
        touched |= {
            tuple(r)
            for r in existing.join(
                updates.select(*key_cols).hint("broadcast"), key_cols, "left_semi"
            )
            .select(*partition_by)
            .distinct()
            .collect()
        }
        cond = F.lit(False)
        for values in touched:
            match = F.lit(True)
            for col, val in zip(partition_by, values):
                match = match & (F.col(col) == F.lit(val))
            cond = cond | match
        # Materialize before the write: merged reads from table_path while
        # the dynamic overwrite rewrites it — checkpointing severs the
        # lineage so the job never scans files it is replacing.
        merged = merged.filter(cond).localCheckpoint(eager=True)
        remaining = {
            tuple(r) for r in merged.select(*partition_by).distinct().collect()
        }
        with _spark_conf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
            merged.write.mode("overwrite").partitionBy(*partition_by).parquet(
                table_path
            )
        # A touched partition that ended up empty (its only rows moved
        # away) is never emitted by the dynamic overwrite — drop its
        # directory explicitly so the stale files don't resurrect rows.
        for values in touched - remaining:
            part_dir = os.path.join(
                table_path,
                *[f"{c}={v}" for c, v in zip(partition_by, values)],
            )
            if os.path.exists(part_dir):
                shutil.rmtree(part_dir)
        return

    # Full rewrite with atomic swap (small/unpartitioned tables).
    staging = os.path.join(
        tempfile.gettempdir(), f"upsert-{uuid.uuid4().hex}.parquet"
    )
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)  # fully materialized before the old dir is touched
    if os.path.exists(table_path):
        shutil.rmtree(table_path)
    shutil.move(staging, table_path)


class _spark_conf:
    """Temporarily set a session conf (restore on exit)."""

    def __init__(self, spark: SparkSession, key: str, value: str):
        self.spark, self.key, self.value = spark, key, value
        self.prev: str | None = None

    def __enter__(self):
        try:
            self.prev = self.spark.conf.get(self.key)
        except Exception:
            self.prev = None
        self.spark.conf.set(self.key, self.value)

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(self.key)
        else:
            self.spark.conf.set(self.key, self.prev)


def write_assets_partitioned(assets: DataFrame, root: str) -> None:
    """Write the assets manifest laid out for the catalog's access
    pattern: directory-partitioned by (dataset_id, version_id), the keys
    every per-version scan filters on (ref access shape:
    backend/import_dataset/task.py:93-98). A filter on those columns then
    prunes whole directories at planning time (PartitionFilters) — the
    parquet analog of the reference's DynamoDB key condition, and the
    layout that keeps per-version reads O(version), not O(lake)."""
    (
        assets.write.mode("overwrite")
        .partitionBy("dataset_id", "version_id")
        .parquet(root)
    )
