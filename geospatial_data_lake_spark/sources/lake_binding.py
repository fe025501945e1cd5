"""Lake-format binding layer — one call surface, two runtimes.

``ManifestTable`` implements the versioned-lake contract (MERGE, blind
append, snapshot reads, ``VERSION AS OF`` time travel, history) on plain
parquet with a generation commit log — the sanctioned substitute in this
environment, where Delta Lake cannot be installed (COVERAGE.md Known
gaps).  This module makes the migration story concrete instead of
documentary: ``open_lake_table`` resolves to a real Delta Lake binding
whenever ``delta-spark`` is importable, and to ``ManifestTable``
otherwise, behind the same five-method contract:

    append(df) -> version          upsert(df) -> version   (keyed MERGE)
    read(version=None, where=None) -> DataFrame
    current_version() -> int       history() -> [{version, committed_at}]

The contract test (tests/test_lake_binding.py) is written against the
CONTRACT, parametrized over whichever bindings import in the running
environment — in this container it proves the ManifestTable path; on a
Delta-enabled cluster the identical test body proves the Delta path with
zero changes.  The Delta binding is deliberately thin and literal
(DeltaTable.merge / .history / VERSION AS OF — the documented public
API), because every behavior it must provide is pinned by the shared
contract test, not by this file.

Predicate spec: ``where`` uses the ManifestTable dict form
({col: value} equality, {col: (lo, hi)} inclusive range, None bound =
unbounded); the Delta binding compiles it to a Column filter and lets
Delta's own stats-based data skipping do the pruning ManifestTable does
with its manifest min/max stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark.sources.manifest_table import ManifestTable

try:  # pragma: no cover - not importable in this container
    from delta.tables import DeltaTable  # type: ignore

    HAVE_DELTA = True
except ImportError:
    DeltaTable = None  # type: ignore[assignment]
    HAVE_DELTA = False


def where_condition(where: dict | None) -> Column:
    """Compile the shared dict predicate spec to a Column (TRUE when
    ``where`` is None/empty — the same semantics ManifestTable's reader
    applies after its file pruning)."""
    cond = F.lit(True)
    if not where:
        return cond
    for col, spec in where.items():
        if isinstance(spec, tuple):
            lo, hi = spec
            if lo is not None:
                cond = cond & (F.col(col) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(col) <= F.lit(hi))
        else:
            cond = cond & (F.col(col) == F.lit(spec))
    return cond


class DeltaLakeTable:
    """Delta Lake realization of the lake contract (requires
    ``delta-spark`` on the session; construction raises otherwise).

    Version mapping: Delta's own commit versions ARE the contract's
    versions — ``current_version`` reads the latest history entry,
    ``read(version=...)`` uses ``versionAsOf``.  MERGE keys come from
    ``key_cols`` exactly like ManifestTable; partitioning is declared
    at first write.  Hidden-partition transforms are intentionally NOT
    reimplemented here — Delta generated columns serve that role and
    are declared at table creation by the deployment, not per-write."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: list[str],
        partition_by: list[str],
    ):
        if not HAVE_DELTA:
            raise ImportError("delta-spark is not importable in this session")
        self._spark = spark
        self.root = root
        self.key_cols = list(key_cols)
        self.partition_by = list(partition_by)

    # -- helpers -------------------------------------------------------------
    def _exists(self) -> bool:
        return DeltaTable.isDeltaTable(self._spark, self.root)

    def _table(self):
        return DeltaTable.forPath(self._spark, self.root)

    # -- contract ------------------------------------------------------------
    def append(self, batch: DataFrame) -> int:
        (
            batch.write.format("delta")
            .mode("append")
            .partitionBy(*self.partition_by)
            .save(self.root)
        )
        return self.current_version()

    def upsert(self, updates: DataFrame) -> int:
        if not self._exists():
            return self.append(updates)
        on = " AND ".join(
            f"t.`{k}` <=> s.`{k}`" for k in self.key_cols  # null-safe, as ManifestTable
        )
        (
            self._table()
            .alias("t")
            .merge(updates.alias("s"), on)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self.current_version()

    def read(self, version: int | None = None, where: dict | None = None) -> DataFrame:
        reader = self._spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        df = reader.load(self.root)
        return df.filter(where_condition(where)) if where else df

    def current_version(self) -> int:
        return int(self._table().history(1).collect()[0]["version"])

    def history(self) -> list[dict]:
        return [
            {"version": int(r["version"]), "committed_at": r["timestamp"]}
            for r in self._table().history().collect()
        ]


def open_lake_table(
    spark: SparkSession,
    root: str,
    key_cols: list[str],
    partition_by: list[str],
    prefer: str = "auto",
    **manifest_kwargs,
):
    """Resolve the lake binding for this environment.

    ``prefer='auto'`` picks Delta when importable, else ManifestTable;
    ``'delta'`` / ``'manifest'`` force a binding (delta raises without
    the runtime).  Extra kwargs (bloom_cols, partition_transforms,
    keep_versions) are ManifestTable-only and rejected under Delta —
    their Delta analogs (BLOOMFILTER INDEX, generated columns,
    retention) are table properties the deployment declares, not
    per-open arguments."""
    if prefer not in ("auto", "delta", "manifest"):
        raise ValueError(f"unknown binding preference {prefer!r}")
    use_delta = prefer == "delta" or (prefer == "auto" and HAVE_DELTA)
    if use_delta:
        if manifest_kwargs:
            raise ValueError(
                f"ManifestTable-only options under Delta: {sorted(manifest_kwargs)}"
            )
        return DeltaLakeTable(spark, root, key_cols, partition_by)
    return ManifestTable(spark, root, key_cols, partition_by, **manifest_kwargs)
