"""RRF fusion tests (SURVEY.md §2.4 J4, §2.5 A4, §2.6 T3) — semantics of
RRFRanker(k=60) at /root/reference/retrievers.py:135-141."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from splade_spark.build.indexer import build_index_from_docs
from splade_spark.config import DEFAULT
from splade_spark.dense import cosine_topk_sparse, hash_embed_docs, hash_embed_queries
from splade_spark.fixtures import queries_df
from splade_spark.query.fusion import rrf_fuse
from splade_spark.query.naive import topk_naive

SF = "/root/testdata/sf0.001"


def test_rrf_hand_computed(spark):
    # doc 10 is rank 1 dense + rank 3 sparse; doc 20 rank 2 dense only;
    # doc 30 rank 1 sparse only.
    dense = spark.createDataFrame(
        [(0, 10, 1), (0, 20, 2)], ["query_id", "doc_id", "rank"]
    )
    sparse = spark.createDataFrame(
        [(0, 30, 1), (0, 10, 3)], ["query_id", "doc_id", "rank"]
    )
    out = {
        r.doc_id: (round(r.rrf_score, 9), r.rank)
        for r in rrf_fuse([dense, sparse], k_rrf=60, top_k=5).collect()
    }
    assert out[10] == (round(1 / 61 + 1 / 63, 9), 1)
    assert out[30] == (round(1 / 61, 9), 2)
    assert out[20] == (round(1 / 62, 9), 3)  # 1/62 < 1/61: dense-only rank 2 loses


def test_rrf_tie_breaks_by_doc_id(spark):
    a = spark.createDataFrame([(0, 7, 1), (0, 3, 2)], ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame([(0, 3, 1), (0, 7, 2)], ["query_id", "doc_id", "rank"])
    rows = rrf_fuse([a, b], top_k=2).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [3, 7]  # equal scores → doc_id asc


def test_hybrid_end_to_end_matches_python_fusion(spark):
    """Sparse BM25 channel + dense hash channel → RRF, vs python recompute."""
    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{SF}/documents.parquet') order by doc_id"
    ).fetchall()
    frames = build_index_from_docs(spark.createDataFrame(rows, ["doc_id", "text"]), DEFAULT)
    frames.postings.cache().count()
    queries = queries_df(spark).filter(F.col("query_id") < 10)

    sparse = topk_naive(queries, frames.postings, frames.dictionary, k=5)
    from splade_spark.text.udfs import analyze_udf

    docs_tok = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id", analyze_udf(DEFAULT.analyzer)(F.col("text")).alias("tokens")
    )
    dense = cosine_topk_sparse(
        hash_embed_docs(docs_tok), hash_embed_queries(queries, DEFAULT), k=5
    )
    fused = rrf_fuse(
        [sparse.select("query_id", "doc_id", "rank"), dense.select("query_id", "doc_id", "rank")],
        k_rrf=DEFAULT.rrf_k,
        top_k=5,
    )

    s_ranks = defaultdict(dict)
    for r in sparse.collect():
        s_ranks[r.query_id][r.doc_id] = r.rank
    d_ranks = defaultdict(dict)
    for r in dense.collect():
        d_ranks[r.query_id][r.doc_id] = r.rank

    got = defaultdict(list)
    for r in fused.orderBy("query_id", "rank").collect():
        got[r.query_id].append((r.doc_id, round(r.rrf_score, 9)))

    for qid in set(s_ranks) | set(d_ranks):
        scores = defaultdict(float)
        for d, rk in s_ranks[qid].items():
            scores[d] += 1.0 / (60 + rk)
        for d, rk in d_ranks[qid].items():
            scores[d] += 1.0 / (60 + rk)
        want = sorted(scores.items(), key=lambda x: (-round(x[1], 9), x[0]))[:5]
        assert got[qid] == [(d, round(s, 9)) for d, s in want], qid
