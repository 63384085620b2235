"""Query-side BM25 encoding (SURVEY.md §2.3 B9).

Semantics of ``BM25SparseEmbedding.embed_query`` (call site
/root/reference/retrievers.py:121): analyze the query text; each occurrence of
a term contributes its idf (repeated terms sum ⇒ weight = qtf · idf); OOV
terms drop out (inner join against the dictionary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from splade_spark.config import EngineConfig, DEFAULT
from splade_spark.text.udfs import analyze_udf


def encode_queries(
    queries: DataFrame, dictionary: DataFrame, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """queries(query_id, text) → (query_id, term_id, qweight double).

    The query set is tiny relative to the index — downstream joins broadcast
    this result (J1/J2, SURVEY.md §2.4).
    """
    qterms = (
        queries.select("query_id", F.explode(analyze_udf(cfg.analyzer)(F.col("text"))).alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    return qterms.join(dictionary.select("term", "term_id", "idf"), "term").select(
        "query_id",
        "term_id",
        (F.col("qtf") * F.col("idf")).alias("qweight"),
    )
