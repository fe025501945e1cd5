#!/usr/bin/env python
"""A/B harness for the r16 optimizations: OLD and NEW plans built in ONE
session, timed noop-sink runs interleaved A/B/A/B (guide §1.4) so a host
throttle window hits both variants alike; per-variant MIN reported.

Variants:
  dd14      64-bit window digests (r15) vs 128-bit two-seed (r16)
  dd10      same, on the span derivation end-to-end
  dd01      64-bit census digest vs two-seed count-distinct pair
  pl01      64-bit dedup group key vs two-seed pair
  tx10      two model passes (r15) vs one GROUPING SETS pass (r16)
  sd02      census without vs with the assignment localCheckpoint
            (timed END-TO-END per round: construction + noop, because
            the checkpoint moves work to construction time)

Equivalence is asserted with exceptAll in both directions before any
timing (skippable with AB_SKIP_EQ=1 for re-runs).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geospatial_data_lake_spark.session import get_spark  # noqa: E402
from geospatial_data_lake_spark.tables import spread, tables  # noqa: E402
from geospatial_data_lake_spark.operators.clustering import (  # noqa: E402
    _SD_TARGET_CELL,
    _embedding_broadcast_bytes,
    kmeans_fit,
    semdedup_auto_k,
)
from geospatial_data_lake_spark.operators.dedup import (  # noqa: E402
    _SPAN_W,
    _broadcast_budget,
    _dd10_hits,
    _dd10_windows,
)
from geospatial_data_lake_spark.operators.similarity import (  # noqa: E402
    _dot as _cg_dot,
)
from geospatial_data_lake_spark.operators.textops import (  # noqa: E402
    _pair_starts,
    gram_starts as _gram_starts,
)


def _windows_old(documents: DataFrame) -> DataFrame:
    """r15's 64-bit window derivation, verbatim."""
    tkh_docs = documents.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda tok: F.xxhash64(tok)).alias(
            "tkh"
        ),
    )
    return tkh_docs.select(
        "doc_id",
        F.explode(
            F.transform(
                _gram_starts(F.col("tkh"), _SPAN_W),
                lambda p: F.struct(
                    p.alias("p"),
                    F.xxhash64(F.slice("tkh", p, _SPAN_W)).alias("h"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.p").alias("p"), F.col("w.h").alias("h"))


def dd14_shape(t, windows) -> DataFrame:
    docs = t.documents
    bench_h = (
        windows(docs.filter(F.col("doc_id") % 17 == 0)).select("h").distinct()
    )
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    hits = (
        windows(corpus)
        .join(F.broadcast(bench_h), "h", "leftsemi")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n"))
    )
    return (
        corpus.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_shared_ngrams"),
            (F.coalesce("n", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def dd10_shape(t, windows) -> DataFrame:
    hits = _dd10_hits(windows(t.documents))
    by_doc = Window.partitionBy("doc_id").orderBy("p")
    run = by_doc.rowsBetween(Window.unboundedPreceding, 0)
    isl = hits.withColumn("pp", F.lag("p").over(by_doc)).withColumn(
        "g",
        F.sum(
            F.when(
                F.col("pp").isNull() | (F.col("p") - F.col("pp") > _SPAN_W),
                1,
            ).otherwise(0)
        ).over(run),
    )
    return (
        isl.groupBy("doc_id", "g")
        .agg(
            F.min("p").cast("bigint").alias("span_start"),
            (F.max("p") + _SPAN_W - 1).cast("bigint").alias("span_end"),
            (F.max("p") + _SPAN_W - F.min("p"))
            .cast("bigint")
            .alias("span_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        )
        .select(
            "doc_id", "span_start", "span_end", "span_tokens", "n_windows"
        )
        .orderBy("doc_id", "span_start")
    )


def dd01_shape(t, new: bool) -> DataFrame:
    if new:
        digest = (F.xxhash64("text"), F.xxhash64(F.lit(1), "text"))
    else:
        digest = (F.xxhash64("text"),)
    return t.documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(*digest).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(*digest)).alias("n_dups"),
    )


def pl01_winners_shape(t, new: bool) -> DataFrame:
    """pl01's dedup stage in isolation (the touched piece): winner ids
    over the quality-gated corpus."""
    tk = F.split(F.col("text"), " ")
    base = t.documents.select(
        "doc_id", "text", F.size(tk).alias("n_tok")
    )
    q = base.filter(
        (F.col("n_tok") >= 25) & (F.length("text") < 12 * F.col("n_tok"))
    ).filter(F.col("doc_id") % 97 != 0)
    keys = (
        [F.xxhash64("text"), F.xxhash64(F.lit(1), "text")]
        if new
        else [F.xxhash64("text")]
    )
    return (
        q.groupBy(*keys)
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .orderBy("doc_id")
    )


def tx10_shape(t, new: bool) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    b = t.documents.select(
        "doc_id",
        F.explode(
            F.transform(
                _pair_starts(toks),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    if new:
        g = b.groupingSets(
            [[F.col("w1"), F.col("w2")], [F.col("w1")]], "w1", "w2"
        ).agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        c12 = g.filter(F.col("gid") == 0).select(
            "w1", "w2", F.col("n").alias("n12")
        )
        c1 = g.filter(F.col("gid") == 1).select("w1", F.col("n").alias("n1"))
    else:
        c12 = b.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
        c1 = b.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    m = c12.join(c1, "w1").select(
        "w1", "w2", (F.col("n12").cast("double") / F.col("n1")).alias("p")
    )
    return (
        b.join(F.broadcast(m), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("p").cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_bigram_prob"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            "mean_bigram_prob",
        )
        .orderBy("doc_id")
    )


def census_shape(spark, fin, bound: int) -> DataFrame:
    """The census downstream of the (possibly checkpointed) assignment —
    identical in both arms; the arm difference is what ``fin`` is."""
    m = fin.select("vec_id", "v", "cid").withColumn(
        "n", F.sqrt(_cg_dot(F.col("v"), F.col("v")))
    )
    mem = fin.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    nsub = mem.select(
        "cid",
        F.ceil(F.col("n_members") / F.lit(bound)).cast("int").alias("__nsub"),
    )
    m = (
        m.join(F.broadcast(nsub), "cid")
        .withColumn(
            "__salt",
            F.pmod(F.xxhash64("vec_id"), F.col("__nsub")).cast("int"),
        )
        .drop("__nsub")
    )
    a = spread(spark, m).alias("a")
    b = m.alias("b")
    build = (
        F.broadcast(b)
        if _embedding_broadcast_bytes(m) <= _broadcast_budget(spark)
        else b
    )
    pair_cond = F.col("a.vec_id") < F.col("b.vec_id")
    for kcol in ("cid", "__salt"):
        pair_cond = (F.col(f"a.{kcol}") == F.col(f"b.{kcol}")) & pair_cond
    removed = (
        a.join(build, pair_cond)
        .filter(
            _cg_dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.n") * F.col("b.n"))
            >= 0.4
        )
        .select(F.col("a.cid").alias("cid"), F.col("b.vec_id").alias("dup"))
        .distinct()
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_removed"))
    )
    return (
        mem.join(F.broadcast(removed), "cid", "left")
        .select(
            F.col("cid").cast("bigint").alias("cluster"),
            "n_members",
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias(
                "n_removed"
            ),
            (
                F.col("n_members") - F.coalesce("n_removed", F.lit(0))
            ).cast("bigint").alias("n_kept"),
        )
        .orderBy("cluster")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    skip_eq = os.environ.get("AB_SKIP_EQ") == "1"
    only = set(sys.argv[1:])
    spark = get_spark(app_name="gdl-ab-r16")
    t = tables(spark, sf_dir)

    variants: dict[str, DataFrame] = {}
    eq_pairs: list[tuple[str, str]] = []

    def add(base: str, old_df: DataFrame, new_df: DataFrame) -> None:
        variants[f"{base}_old"] = old_df
        variants[f"{base}_new"] = new_df
        eq_pairs.append((f"{base}_old", f"{base}_new"))

    if not only or "dd14" in only:
        add(
            "dd14",
            dd14_shape(t, _windows_old),
            dd14_shape(t, _dd10_windows),
        )
    if not only or "dd10" in only:
        add(
            "dd10",
            dd10_shape(t, _windows_old),
            dd10_shape(t, _dd10_windows),
        )
    if not only or "dd01" in only:
        add("dd01", dd01_shape(t, False), dd01_shape(t, True))
    if not only or "pl01" in only:
        add("pl01", pl01_winners_shape(t, False), pl01_winners_shape(t, True))
    if not only or "tx10" in only:
        add("tx10", tx10_shape(t, False), tx10_shape(t, True))

    if not skip_eq:
        for old_name, new_name in eq_pairs:
            o, n = variants[old_name], variants[new_name]
            diff = o.exceptAll(n).count() + n.exceptAll(o).count()
            print(f"# eq {old_name} vs {new_name}: diff={diff}", flush=True)
            assert diff == 0, f"{old_name} != {new_name}: {diff} rows"

    out: dict[str, list[float]] = {name: [] for name in variants}
    for name, df in variants.items():
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        df.write.format("noop").mode("overwrite").save()
    for r in range(rounds):
        for name, df in variants.items():
            spark.sparkContext.setJobDescription(f"{name}: round {r}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name].append(round(time.perf_counter() - t0, 3))

    # sd02 census: end-to-end per round (construction + execution),
    # because the checkpoint arm does its heavy work at construction.
    if not only or "sd02" in only:
        e = t.embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        k = semdedup_auto_k(e.count())
        fin, _ = kmeans_fit(e, k=k)  # one training, shared by both arms
        bound = 32 * _SD_TARGET_CELL
        if not skip_eq:
            o = census_shape(spark, fin, bound)
            n = census_shape(spark, fin.localCheckpoint(), bound)
            diff = o.exceptAll(n).count() + n.exceptAll(o).count()
            print(f"# eq sd02census old vs new: diff={diff}", flush=True)
            assert diff == 0
        out["sd02census_old"] = []
        out["sd02census_new"] = []
        for r in range(rounds):
            for name, ckpt in (
                ("sd02census_old", False),
                ("sd02census_new", True),
            ):
                spark.sparkContext.setJobDescription(f"{name}: round {r}")
                t0 = time.perf_counter()
                src = fin.localCheckpoint() if ckpt else fin
                census_shape(spark, src, bound).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[name].append(round(time.perf_counter() - t0, 3))

    print(
        json.dumps(
            {
                name: {"runs": runs, "min": min(runs)}
                for name, runs in out.items()
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
