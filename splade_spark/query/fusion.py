"""Reciprocal-Rank-Fusion hybrid top-k (SURVEY.md §2.4 J4, §2.5 A4, §2.6 T3).

Semantics of the reference's hybrid retrieval
(/root/reference/retrievers.py:130-150): two channels are searched
independently (dense + sparse AnnSearchRequest, retrievers.py:112-128), then
``collection.hybrid_search(..., rerank=RRFRanker(k=60), limit=top_k)``
(retrievers.py:135-141) fuses them:

    rrf(d) = Σ_channels 1 / (k_rrf + rank_channel(d))     (k_rrf = 60)

A doc absent from a channel contributes 0 for that channel — the full outer
join. Final order: (rrf desc, doc_id asc) — the frozen tie-break; rank input
is 1-based (T4, row_number semantics).

Physical shape: each channel's ranked list is ≤ n_queries·k rows, so the
fusion join is a tiny broadcast-scale operation regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def rrf_fuse(channels: list[DataFrame], k_rrf: int = 60, top_k: int = 5) -> DataFrame:
    """Fuse ranked lists [(query_id, doc_id, rank), ...] → RRF top-k.

    Returns (query_id, doc_id, rrf_score, rank).
    """
    if not channels:
        raise ValueError("need at least one channel")
    contribs = [
        ch.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))).alias("c"),
        )
        for ch in channels
    ]
    unioned = contribs[0]
    for ch in contribs[1:]:
        unioned = unioned.unionByName(ch)
    fused = unioned.groupBy("query_id", "doc_id").agg(F.sum("c").alias("rrf_score"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("rrf_score"), 9).desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
