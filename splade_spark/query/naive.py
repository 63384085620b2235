"""Naive (pure-DataFrame) BM25 top-k — the semantic baseline path.

Mirrors the reference's sparse search executed inside Milvus'
SPARSE_INVERTED_INDEX with IP metric at drop_ratio=0 ⇒ exact scoring
(request built at /root/reference/retrievers.py:120-128, executed via
hybrid_search retrievers.py:136-141):

    score(q, d) = Σ_t qweight(q,t) · impact(t,d)      (A3)
    top-k per query, ties (score desc, doc_id asc)    (T2/T3)

Physical shape (SURVEY.md §3.2): the encoded query set is broadcast (J2), so
only postings rows whose term_id matches a query term are touched — the
DataFrame analog of an inverted-index seek; with the postings table stored
sorted/partitioned by term_id, parquet row-group pruning makes the scan
sub-linear. One shuffle: the (query_id, doc_id) score aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from splade_spark.config import EngineConfig, DEFAULT
from splade_spark.query.encode import encode_queries
from splade_spark.query.topk import per_query_topk


def score_naive(encoded_queries: DataFrame, postings: DataFrame) -> DataFrame:
    """(query_id, term_id, qweight) ⋈ postings(term_id, doc_id, impact) → scores."""
    return (
        postings.join(F.broadcast(encoded_queries), "term_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qweight") * F.col("impact")).alias("score"))
    )


def topk_naive(
    queries: DataFrame,
    postings: DataFrame,
    dictionary: DataFrame,
    k: int | None = None,
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """queries(query_id, text) → (query_id, doc_id, score, rank), k rows per query."""
    encoded = encode_queries(queries, dictionary, cfg)
    scored = score_naive(encoded, postings)
    return per_query_topk(scored, k if k is not None else cfg.top_k)
