"""Long-form postings: (term_id, doc_id, impact) rows.

Implements the doc-side BM25 encoding (SURVEY.md §2.3 B4; semantics of
``BM25SparseEmbedding.embed_documents`` used at /root/reference/ingest.py:120-129):

    impact(t, d) = tf · (k1 + 1) / (tf + k1 · (1 − b + b · doclen / avgdl))

IDF deliberately lives on the QUERY side (B9) so dot(query, doc) equals the
BM25 score — matching the reference's inner-product metric
(/root/reference/ingest.py:159-161).

All column math → whole-stage codegen; the only shuffle is the tf groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from splade_spark.config import EngineConfig, DEFAULT


def term_freqs(docs: DataFrame) -> DataFrame:
    """docs → tf(doc_id, term, tf int, doclen int).

    When the docs frame carries the pre-aggregated ``term_counts`` map
    (chunker analyze_counts_udf), tf is a shuffle-FREE map explode — one row
    per distinct (doc, term), already counted inside the analyzer's Arrow
    batch. Fallback for token-only frames: groupBy keyed by (doc_id, term) —
    doc-dominated keyspace, no term skew either way.
    """
    if "term_counts" in docs.columns:
        return docs.select(
            "doc_id",
            "doclen",
            F.explode("term_counts").alias("term", "tf"),
        ).select("doc_id", "term", F.col("tf").cast("int").alias("tf"), "doclen")
    return (
        docs.select("doc_id", "doclen", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"), F.first("doclen").alias("doclen"))
    )


def doc_impacts(tf: DataFrame, corpus_stats: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Attach BM25 impact weight — pure column expression (float64)."""
    k1, b = float(cfg.k1), float(cfg.b)
    with_stats = tf.crossJoin(F.broadcast(corpus_stats.select("avgdl")))
    tf_d = F.col("tf").cast("double")
    norm = tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.col("avgdl"))
    return with_stats.withColumn("impact", tf_d * F.lit(k1 + 1.0) / norm).drop("avgdl")


def postings_long(
    impacts: DataFrame,
    dictionary: DataFrame,
    broadcast_dictionary: bool = True,
) -> DataFrame:
    """(doc_id, term, impact) ⋈ dictionary → (term_id, doc_id, impact, tf).

    The dictionary is broadcast when small (vocab ≪ corpus — the common case);
    set ``broadcast_dictionary=False`` to fall back to a shuffle join for
    very large vocabularies.
    """
    dic = dictionary.select("term", "term_id")
    if broadcast_dictionary:
        dic = F.broadcast(dic)
    return impacts.join(dic, "term").select("term_id", "doc_id", "impact", "tf")
