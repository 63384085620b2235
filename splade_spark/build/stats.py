"""Corpus stats + dictionary (BM25 fit — SURVEY.md §2.3 B3).

Semantics of ``BM25SparseEmbedding(corpus)`` fit (instantiated at
/root/reference/main.py:64, eval.py:105, ingest.py:124; pinned milvus-model
0.2.5 / rank-bm25 semantics):

    N      = number of docs
    avgdl  = mean token count per doc
    df(t)  = number of docs containing t
    raw_idf(t) = ln((N - df + 0.5) / (df + 0.5))
    idf(t) = raw_idf if raw_idf >= 0 else epsilon * avg(raw_idf over all terms)
    term_id: dense ints ordered by (df desc, term asc) — deterministic,
             replacing the reference dictionary's insertion order (§1.4)

Everything here is plain Catalyst column math — whole-stage codegen, no UDFs.

Skew note (SURVEY.md §4): ``groupBy(term)`` on a Zipfian corpus has head-term
skew. ``salted=True`` (default) computes df in two phases —
``groupBy(term, salt)`` partial counts then ``groupBy(term)`` final sum — so
no single reducer sees a whole head term. Spark's partial aggregation already
combines map-side; the explicit salt additionally bounds the final-stage key
width and is the pattern that holds at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from splade_spark.config import EngineConfig, DEFAULT


def compute_corpus_stats(docs: DataFrame) -> DataFrame:
    """docs(doc_id, …, doclen) → single row (n_docs long, avgdl double).

    avgdl is an exact integer sum divided once — order-independent, so two
    builds over the same corpus in different partition layouts produce
    bit-identical impacts (the streaming re-fit equivalence gate relies on
    this; a float running avg would drift in the last ulp with task order).
    """
    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )


def build_dictionary(
    tf: DataFrame,
    corpus_stats: DataFrame,
    cfg: EngineConfig = DEFAULT,
    salted: bool = True,
) -> DataFrame:
    """tf(doc_id, term, tf) → dictionary(term, term_id int, df long, idf double).

    ``tf`` already has one row per (doc, term), so df = row count per term.
    """
    if salted:
        partial = (
            tf.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.salt_buckets)))
            .groupBy("term", "_salt")
            .agg(F.count(F.lit(1)).alias("_pdf"))
        )
        df = partial.groupBy("term").agg(F.sum("_pdf").cast("long").alias("df"))
    else:
        df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    # Probe the vocabulary size once (bounded by the threshold) to pick the
    # term-id strategy; cache the vocab-sized df relation so the probe and
    # the dictionary job share one tf pass.
    df = df.cache()
    scalable = df.limit(_SCALABLE_VOCAB_THRESHOLD + 1).count() > _SCALABLE_VOCAB_THRESHOLD

    with_n = df.crossJoin(F.broadcast(corpus_stats.select("n_docs")))
    raw = with_n.withColumn(
        "raw_idf",
        F.log((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))),
    )
    avg_idf = raw.agg(F.avg("raw_idf").alias("avg_raw_idf"))
    floored = raw.crossJoin(F.broadcast(avg_idf)).withColumn(
        "idf",
        F.when(F.col("raw_idf") < 0, F.lit(cfg.epsilon) * F.col("avg_raw_idf")).otherwise(
            F.col("raw_idf")
        ),
    )
    return assign_term_ids(floored, scalable=scalable)


# Vocabularies above this row count take the range-partitioned id path
# automatically: a single-task row_number window over ~1M+ rows is the first
# stage to die at 100× scale (VERDICT.md round-1 Wrong #2). Below it, the
# one-task window is cheaper (no sampling pass, no extra jobs).
_SCALABLE_VOCAB_THRESHOLD = 1_000_000


def assign_term_ids(
    floored: DataFrame,
    scalable: bool | None = None,
    threshold: int = _SCALABLE_VOCAB_THRESHOLD,
) -> DataFrame:
    """Dense deterministic term ids ordered by (df desc, term asc).

    Two physical strategies, identical output (tests/test_bm25_stats.py):

    * window (below ``threshold``): one row_number window — fine while the
      vocabulary fits one task.
    * scalable: range-partitioned sort + per-partition local ranks + a tiny
      driver-side prefix-sum of partition counts (the zipWithIndex pattern,
      expressed in DataFrame ops). No single task ever sees the whole
      vocabulary — the 100M+-term path.

    ``scalable=None`` (the default, used by ``build_dictionary``) probes the
    vocabulary size with a limit-bounded count — at most ``threshold + 1``
    rows ever move — and picks the path automatically.
    """
    if scalable is None:
        scalable = floored.limit(threshold + 1).count() > threshold
    if not scalable:
        w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
        return floored.select(
            "term",
            (F.row_number().over(w) - 1).cast("int").alias("term_id"),
            "df",
            "idf",
        )

    ranked = floored.repartitionByRange(
        max(floored.sparkSession.sparkContext.defaultParallelism, 8),
        F.col("df").desc(), F.col("term").asc(),
    ).select(
        "term", "df", "idf", F.spark_partition_id().alias("_pid")
    )
    # local rank within each sorted range partition
    w_local = Window.partitionBy("_pid").orderBy(F.col("df").desc(), F.col("term").asc())
    local = ranked.withColumn("_lrank", F.row_number().over(w_local) - 1)
    # partition sizes → driver-side prefix sums (one tiny collect)
    sizes = {
        r["_pid"]: r["cnt"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    spark = floored.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], ["_pid", "_off"]
        )
    )
    return (
        local.join(off_df, "_pid")
        .select(
            "term",
            (F.col("_off") + F.col("_lrank")).cast("int").alias("term_id"),
            "df",
            "idf",
        )
    )
