"""Fixture-table loader.

The synthetic star schema (TESTDATA.md): region, nation, customer, supplier,
part, orders, lineitem, events, documents, embeddings — one parquet each
under an sf directory.

Scale design: each table is read with an explicit ``spark.read.parquet``
scan so Catalyst predicate pushdown / column pruning reach the parquet
reader.  At 100 TB the same loader points at partitioned table roots; no
query in this engine assumes single-file inputs.

Session hygiene:

- ``Tables`` handles are memoized per (session, sf_dir): repeated queries
  in one driver sweep reuse the analyzed scan relations instead of
  re-listing files and re-reading footers per query.
- The ``events`` loader is schema-adaptive: fixtures have shipped ``ts``
  as both TIMESTAMP(MICROS) and TIMESTAMP(NANOS); the nanos branch scopes
  the ``nanosAsLong`` conf to the read (set -> read -> restore) — the
  analyzed DataFrame keeps working after the restore (the scan snapshots
  the conf at analysis time), and later parquet reads in the same session
  see the session's own setting again.
- An untouched ``spark.sql.shuffle.partitions`` default (200) is replaced
  once per session with the session's core count: at local/test scale 200
  post-shuffle tasks are pure scheduling overhead (AQE coalesces them, but
  planning 200 still costs), and a production deployment that tuned the
  conf is left alone.
"""

from __future__ import annotations

import os
import weakref
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@contextmanager
def _scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a session conf for the duration of the block, then restore the
    previous value (or unset if it was unset)."""
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            try:
                spark.conf.unset(key)
            except Exception:
                pass
        else:
            spark.conf.set(key, prev)


class Tables:
    """Lazy accessor: ``Tables(spark, sf_dir).lineitem`` returns the
    DataFrame for that table, loading (and caching the handle) on first
    access."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in TABLE_NAMES:
            raise AttributeError(f"unknown fixture table: {name}")
        if name not in self._cache:
            path = os.path.join(self._sf_dir, f"{name}.parquet")
            if name == "events":
                df = self._load_events(path)
            else:
                df = self._spark.read.parquet(path)
            self._cache[name] = df
        return self._cache[name]

    def _load_events(self, path: str) -> DataFrame:
        """Schema-adaptive ``events`` loader.

        The fixture's ``ts`` column has shipped with two physical parquet
        encodings across driver rounds: TIMESTAMP(MICROS) (reads cleanly
        as a Spark timestamp) and int64 TIMESTAMP(NANOS) (rejected by the
        parquet reader unless ``nanosAsLong=true``, which then surfaces
        it as raw int64 nanos).  Branch on what the footer actually
        contains instead of assuming either encoding.
        """
        try:
            df = self._spark.read.parquet(path)
        except Exception:
            # TIMESTAMP(NANOS) footer with nanosAsLong unset: the reader
            # refuses the type at schema-inference time.
            df = None
        if df is not None and dict(df.dtypes).get("ts") not in ("bigint", "long"):
            return df  # ts already landed on a timestamp type
        # Legacy nanos fixture (or a session that globally set
        # nanosAsLong): re-read with the conf scoped to this read and
        # floor-truncate nanos -> micros (identical to DuckDB semantics).
        with _scoped_conf(self._spark, _NANOS_CONF, "true"):
            df = self._spark.read.parquet(path)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            ).select(
                "event_id", "ts", "user_id", "event_type", "value", "props"
            )
            # force analysis inside the scoped conf so the scan snapshots
            # nanosAsLong=true
            df.schema
        return df

    def register_views(self, *names: str) -> None:
        """Create temp views (for queries expressed in Spark SQL)."""
        for name in names or TABLE_NAMES:
            getattr(self, name).createOrReplaceTempView(name)


# per-session memo: {SparkSession -> {sf_dir -> Tables}}; weak keys so a
# stopped session's handles don't pin the JVM gateway.
_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict[str, Tables]]" = (
    weakref.WeakKeyDictionary()
)
_TUNED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def _tune_session(spark: SparkSession) -> None:
    if spark in _TUNED:
        return
    _TUNED.add(spark)
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 16)))
    except Exception:
        pass


# Session-scoped temp roots: the lake/index fixture builders materialize
# ManifestTables and parquet stores under mkdtemp dirs cached per
# session (WeakKeyDictionary keyed by the SparkSession).  The cache
# entry dies with the session, but the DIRECTORY would survive the
# process without this lifecycle: a weakref finalizer reclaims each
# root when its session is collected, and an atexit sweep catches roots
# whose session is still referenced at interpreter exit.
_TMP_ROOTS: set[str] = set()


def _reclaim_tmp_root(d: str) -> None:
    import shutil

    _TMP_ROOTS.discard(d)
    shutil.rmtree(d, ignore_errors=True)


def _sweep_tmp_roots() -> None:
    for d in list(_TMP_ROOTS):
        _reclaim_tmp_root(d)


def session_tmpdir(spark: SparkSession, prefix: str) -> str:
    """A mkdtemp root whose LIFETIME is tied to ``spark``: reclaimed
    when the session object is garbage-collected (weakref finalizer)
    and swept at interpreter exit regardless — session-cached fixture
    builders must allocate through this, never bare mkdtemp."""
    import atexit
    import tempfile

    if not _TMP_ROOTS:
        atexit.register(_sweep_tmp_roots)
    d = tempfile.mkdtemp(prefix=prefix)
    _TMP_ROOTS.add(d)
    weakref.finalize(spark, _reclaim_tmp_root, d)
    return d


def tables(spark: SparkSession, sf_dir: str) -> Tables:
    _tune_session(spark)
    per_session = _MEMO.setdefault(spark, {})
    if sf_dir not in per_session:
        per_session[sf_dir] = Tables(spark, sf_dir)
    return per_session[sf_dir]


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Ensure a scan feeding *heavy per-row compute* (shingle hashing,
    minhash, feature kernels) uses all cores.

    A parquet file parallelizes at row-group granularity; the synthetic
    fixtures are written as a single row group, so a compute-bound stage
    over them would otherwise run on one thread no matter the cluster
    size.  When the scan already has >= one split per core — the normal
    case for any production-size table — this is a no-op, so no shuffle
    is ever added at scale.  Filters/pruning still push past the
    round-robin exchange to the scan."""
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores)
