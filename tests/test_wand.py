"""Three-way rank-identity: naive DataFrame path == block-max WAND path ==
pandas oracle (SURVEY.md §5 test 2), over 1-segment and multi-segment indexes."""

from __future__ import annotations

import duckdb
import pytest

from splade_spark.build.indexer import build_index_from_docs
from splade_spark.build.segments import pack_segment, with_segment_id
from splade_spark.config import DEFAULT, EngineConfig
from splade_spark.fixtures import FROZEN_QUERIES, queries_df
from splade_spark.oracle import PandasOracle
from splade_spark.query.naive import topk_naive
from splade_spark.query.wand import topk_wand, topk_wand_batch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def setup(spark):
    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{SF}/documents.parquet') order by doc_id"
    ).fetchall()
    frames = build_index_from_docs(
        spark.createDataFrame(rows, ["doc_id", "text"]), DEFAULT
    )
    frames.postings.cache().count()
    oracle = PandasOracle(DEFAULT)
    for d, t in rows:
        oracle.add_doc(d, t)
    oracle.fit()
    return frames, oracle


def _collect(df):
    out = {}
    for r in df.orderBy("query_id", "rank").collect():
        out.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 6)))
    return out


@pytest.mark.parametrize("n_segments", [1, 4])
@pytest.mark.parametrize("block_size", [128, 7])
def test_three_way_rank_identity(spark, setup, n_segments, block_size):
    frames, oracle = setup
    cfg = EngineConfig(block_size=block_size)
    blocks = pack_segment(
        with_segment_id(frames.postings, n_segments), cfg
    ).cache()
    blocks.count()

    for k in (5, 3):
        naive = _collect(topk_naive(queries_df(spark), frames.postings, frames.dictionary, k=k))
        wand = _collect(topk_wand(queries_df(spark), blocks, frames.dictionary, k=k, cfg=cfg))
        batch = _collect(
            topk_wand_batch(queries_df(spark), blocks, frames.dictionary, k=k, cfg=cfg)
        )
        for qid, text in FROZEN_QUERIES:
            want = [(d, round(s, 6)) for d, s in oracle.topk(text, k)]
            assert naive.get(qid, []) == want, f"naive q{qid}"
            assert wand.get(qid, []) == want, (
                f"wand q{qid} segs={n_segments} bs={block_size}: "
                f"{wand.get(qid, [])} != {want}"
            )
            assert batch.get(qid, []) == want, f"wand_batch q{qid}"
    blocks.unpersist()


def test_wand_negative_weight_terms_exact(spark, setup):
    """Queries made of head terms (df > N/2 → negative idf) must still be
    exact — exercises the degenerate fallback path in query/wand.py."""
    frames, oracle = setup
    head_terms = [
        r.term
        for r in frames.dictionary.orderBy("term_id").limit(3).collect()
    ]
    qtext = " ".join(head_terms)
    q = spark.createDataFrame([(100, qtext)], ["query_id", "text"])
    blocks = pack_segment(frames.postings, DEFAULT)
    naive = _collect(topk_naive(q, frames.postings, frames.dictionary, k=5))
    wand = _collect(topk_wand(q, blocks, frames.dictionary, k=5))
    want = [(d, round(s, 6)) for d, s in oracle.topk(qtext, 5)]
    assert naive.get(100, []) == want
    assert wand.get(100, []) == want


def test_wand_auto_rank_identity_and_selection(spark, setup):
    """topk_wand_auto matches the manual paths exactly, and its path choice
    follows the documented geometry rule (VERDICT.md round-1 Wrong #3)."""
    from splade_spark.query.wand import topk_wand_auto

    frames, oracle = setup
    blocks = pack_segment(with_segment_id(frames.postings, 4), DEFAULT).cache()
    blocks.count()
    auto = _collect(topk_wand_auto(queries_df(spark), blocks, frames.dictionary, k=5))
    for qid, text in FROZEN_QUERIES:
        want = [(d, round(s, 6)) for d, s in oracle.topk(text, 5)]
        assert auto.get(qid, []) == want, f"auto q{qid}"
    # selection rule: few segments (< parallelism) → per-query path; many
    # segments + big batch → batch path. Verified via the physical plan:
    # the batch path is a mapInPandas over segment-partitioned blocks (one
    # FlatMapGroupsInPandas for per-query, MapInPandas for batch).
    par = spark.sparkContext.defaultParallelism
    few = topk_wand_auto(
        queries_df(spark), blocks, frames.dictionary, k=5,
        n_queries=50, n_segments=1,
    )
    many = topk_wand_auto(
        queries_df(spark), blocks, frames.dictionary, k=5,
        n_queries=50, n_segments=max(par, 1),
    )
    assert "FlatMapGroupsInPandas" in few._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" in many._jdf.queryExecution().analyzed().toString()
    blocks.unpersist()
