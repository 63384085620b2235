"""End-to-end rank-identity: naive DataFrame path vs pandas oracle on sf0.001
(SURVEY.md §5 test 2; WAND joins the comparison in test_wand.py)."""

from __future__ import annotations

import duckdb
import pytest

from splade_spark.build.indexer import build_index_frames, build_index_from_docs
from splade_spark.config import DEFAULT, NOSTEM
from splade_spark.fixtures import FROZEN_QUERIES, queries_df
from splade_spark.oracle import PandasOracle
from splade_spark.query.naive import topk_naive
from splade_spark.sources.web_pages import read_documents, web_pages_from_documents

SF = "/root/testdata/sf0.001"


def _load_rows():
    return duckdb.sql(
        f"select doc_id, text, source from read_parquet('{SF}/documents.parquet') order by doc_id"
    ).fetchall()


def _assert_rank_identical(engine_rows, oracle_hits, qid):
    got = [(r["doc_id"], round(r["score"], 6)) for r in engine_rows]
    want = [(d, round(s, 6)) for d, s in oracle_hits]
    assert got == want, f"query {qid}: engine={got} oracle={want}"


@pytest.mark.parametrize("cfg_name", ["default", "nostem"])
def test_rank_identity_from_docs(spark, cfg_name):
    """Index over documents.parquet rows directly (chunk = doc)."""
    cfg = DEFAULT if cfg_name == "default" else NOSTEM
    rows = _load_rows()

    frames = build_index_from_docs(
        spark.createDataFrame([(d, t) for d, t, _ in rows], ["doc_id", "text"]), cfg
    )
    frames.postings.cache().count()

    oracle = PandasOracle(cfg)
    for d, t, _ in rows:
        oracle.add_doc(d, t)
    oracle.fit()

    for k in (5, 3):  # main.py:26 and eval.py:34
        result = (
            topk_naive(queries_df(spark), frames.postings, frames.dictionary, k=k, cfg=cfg)
            .orderBy("query_id", "rank")
            .collect()
        )
        by_q: dict[int, list] = {}
        for r in result:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, text in FROZEN_QUERIES:
            _assert_rank_identical(by_q.get(qid, []), oracle.topk(text, k), qid)


def test_fully_oov_queries_empty(spark):
    rows = _load_rows()
    frames = build_index_from_docs(
        spark.createDataFrame([(d, t) for d, t, _ in rows], ["doc_id", "text"]), DEFAULT
    )
    res = topk_naive(queries_df(spark), frames.postings, frames.dictionary, k=5)
    hits = {r["query_id"] for r in res.select("query_id").distinct().collect()}
    assert 48 not in hits and 49 not in hits  # fully-OOV queries return nothing


def test_rank_identity_full_pipeline(spark):
    """Full path: web_pages → extract → chunk → index; oracle ingests pages."""
    rows = _load_rows()
    pages = web_pages_from_documents(read_documents(spark, SF))
    frames = build_index_frames(pages, DEFAULT, use_html=True)
    frames.postings.cache().count()

    oracle = PandasOracle(DEFAULT)
    for d, t, src in rows:
        oracle.add_page(f"https://{src}.example.com/doc/{d}", text=t)
    oracle.fit()

    result = (
        topk_naive(queries_df(spark), frames.postings, frames.dictionary, k=5)
        .orderBy("query_id", "rank")
        .collect()
    )
    by_q: dict[int, list] = {}
    for r in result:
        by_q.setdefault(r["query_id"], []).append(r)
    n_checked = 0
    for qid, text in FROZEN_QUERIES:
        hits = oracle.topk(text, 5)
        _assert_rank_identical(by_q.get(qid, []), hits, qid)
        n_checked += bool(hits)
    assert n_checked >= 40  # vast majority of queries actually hit


def test_frozen_topk_golden_file(spark):
    """Engine must match the COMMITTED golden file (tests/golden/topk_sf001.json)
    — catches simultaneous drift of engine and live oracle (FIXTURES.md §5)."""
    import json
    import os

    with open(os.path.join(os.path.dirname(__file__), "golden", "topk_sf001.json")) as f:
        golden = json.load(f)
    rows = _load_rows()
    frames = build_index_from_docs(
        spark.createDataFrame([(d, t) for d, t, _ in rows], ["doc_id", "text"]), DEFAULT
    )
    frames.postings.cache().count()
    for k in (5, 3):
        got = {}
        for r in topk_naive(queries_df(spark), frames.postings, frames.dictionary, k=k).collect():
            got.setdefault(str(r.query_id), []).append((r.rank, r.doc_id, round(r.score, 6)))
        for qid, hits in golden[str(k)].items():
            want = [(i + 1, d, s) for i, (d, s) in enumerate(hits)]
            assert sorted(got.get(qid, [])) == want, f"golden drift q{qid} k={k}"
        # engine produces rows only for queries the golden says have hits
        assert set(got) == {q for q, h in golden[str(k)].items() if h}
