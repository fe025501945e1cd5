"""applyInPandasWithState: the running import-status view must fold
validation results across micro-batches AND across query restarts (state
is rebuilt from the checkpoint), emitting update-mode rows."""

from __future__ import annotations

from pyspark.sql import types as T

from geospatial_data_lake_spark.streaming.stateful import running_import_status

VALIDATION_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType()),
        T.StructField("version_id", T.StringType()),
        T.StructField("check", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("result", T.StringType()),
    ]
)


def _write_batch(path, spark, rows):
    spark.createDataFrame(rows, VALIDATION_SCHEMA).coalesce(1).write.mode(
        "append"
    ).json(str(path))


def _drain(spark, src, chk, name):
    """One AvailableNow run over the source; returns the latest status per
    key (update mode: last emitted row per key wins). foreachBatch is used
    because it supports checkpoint recovery (memory sink does not)."""
    latest: dict = {}

    def on_batch(df, epoch_id):
        for r in df.collect():
            latest[(r.dataset_id, r.version_id)] = (
                r.n_passed,
                r.n_failed,
                r.outcome,
            )

    stream = spark.readStream.schema(VALIDATION_SCHEMA).json(str(src))
    query = (
        running_import_status(stream)
        .writeStream.outputMode("update")
        .foreachBatch(on_batch)
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(300), "stream did not drain in time"
    return latest


def should_fold_state_across_batches_and_restarts(spark, tmp_path):
    src = tmp_path / "validation_stream"
    src.mkdir()
    chk = tmp_path / "chk"

    # State-partition count is locked into the checkpoint at query start;
    # size it to the key cardinality (2 versions here), not the session's
    # analytics-tuned shuffle width — each state partition costs a Python
    # worker + state-store commit per micro-batch.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        _write_batch(src, spark, [
            ("d1", "v1", "json", "u1", "Passed"),
            ("d1", "v1", "checksum", "u2", "Passed"),
        ])
        first = _drain(spark, src, chk, "status_run1")
        assert first == {("d1", "v1"): (2, 0, "Passed")}

        # new rows arrive; a NEW query over the same checkpoint must
        # restore v1's state (2 passed) before folding the failure in
        _write_batch(src, spark, [
            ("d1", "v1", "checksum", "u3", "Failed"),
            ("d1", "v2", "json", "u1", "Passed"),
        ])
        second = _drain(spark, src, chk, "status_run2")
        assert second[("d1", "v1")] == (2, 1, "Failed")
        assert second[("d1", "v2")] == (1, 0, "Passed")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
