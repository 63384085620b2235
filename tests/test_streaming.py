"""Streaming incremental build: micro-batch segments equal batch-built ones
and are queryable alongside them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splade_spark.build.segments import (
    SegmentedIndex, build_segmented_index, unpack_blocks,
)
from splade_spark.config import DEFAULT
from splade_spark.fixtures import queries_df
from splade_spark.query.wand import topk_wand
from splade_spark.sources.web_pages import read_documents, web_pages_from_documents

from tests.conftest import SF_SMALL


def test_stream_segments_match_batch(spark, tmp_path):
    from splade_spark.streaming import stream_build_segments

    pages = web_pages_from_documents(read_documents(spark, SF_SMALL)).cache()
    first = pages.filter(F.col("url").endswith("0") | F.col("url").endswith("1"))
    rest = pages.subtract(first)

    # batch fit + first segment over the initial corpus slice... the fit must
    # cover the FULL corpus for score stability, mirroring a fit prefix:
    # fit on everything, build batch segments over `first` only.
    idx_dir = str(tmp_path / "idx")
    build_segmented_index(pages, idx_dir, DEFAULT, n_segments=1)
    # wipe the batch segment, keep the fit → streamed segments re-add postings
    import shutil, os

    shutil.rmtree(os.path.join(idx_dir, "blocks"))
    os.remove(os.path.join(idx_dir, "_manifest", "0.json"))
    idx = SegmentedIndex(idx_dir)
    assert idx.committed_segments() == {}

    # stream the whole corpus through a file source in two micro-batches
    stream_src = str(tmp_path / "stream_src")
    first.coalesce(1).write.mode("overwrite").parquet(stream_src)
    schema = pages.schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_src)
    q = stream_build_segments(
        stream, idx_dir, DEFAULT, use_html=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    rest.coalesce(1).write.mode("append").parquet(stream_src)
    q2 = stream_build_segments(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_src),
        idx_dir, DEFAULT, use_html=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)

    segs = idx.committed_segments()
    assert len(segs) >= 1
    assert all(s >= 1000 for s in segs)
    for m in segs.values():
        assert '"mode": "streaming-foreachBatch"' in m["lineage"]

    # streamed postings == batch postings (same fit, same docs)
    from splade_spark.build.indexer import build_index_frames

    frames = build_index_frames(pages, DEFAULT, use_html=True)
    streamed = unpack_blocks(idx.blocks(spark)).select("term_id", "doc_id", "impact")
    batch = frames.postings.select("term_id", "doc_id", "impact")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # and the streamed index answers queries identically to the batch frames
    from splade_spark.query.naive import topk_naive

    want = topk_naive(queries_df(spark), frames.postings, frames.dictionary, k=5)
    got = topk_wand(queries_df(spark), idx.blocks(spark), idx.dictionary(spark), k=5)
    w = {(r.query_id, r.rank): (r.doc_id, round(r.score, 6)) for r in want.collect()}
    g = {(r.query_id, r.rank): (r.doc_id, round(r.score, 6)) for r in got.collect()}
    assert w == g


def test_refit_compact_equals_fresh_batch_build(spark, tmp_path):
    """VERDICT.md #7: initial batch build over corpus A, stream corpus B in,
    refit_compact → the re-fit index must equal a from-scratch batch build
    over A∪B: identical corpus stats, dictionary ids/dfs, and byte-identical
    posting block blobs (deterministic codec + order-independent avgdl)."""
    import os

    from splade_spark.streaming import refit_compact, stream_build_segments

    pages = web_pages_from_documents(read_documents(spark, SF_SMALL)).cache()
    part_a = pages.filter(F.col("url").endswith("0") | F.col("url").endswith("1"))
    part_b = pages.subtract(part_a).cache()

    dir_live = str(tmp_path / "live")
    build_segmented_index(part_a, dir_live, DEFAULT)

    stream_src = str(tmp_path / "src")
    part_b.coalesce(2).write.mode("overwrite").parquet(stream_src)
    q = stream_build_segments(
        spark.readStream.schema(pages.schema).option("maxFilesPerTrigger", 1)
        .parquet(stream_src),
        dir_live, DEFAULT, use_html=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert os.path.isdir(os.path.join(dir_live, "docs_stream"))

    dir_refit = str(tmp_path / "refit")
    refit_compact(spark, dir_live, dir_refit, DEFAULT)

    dir_fresh = str(tmp_path / "fresh")
    build_segmented_index(pages, dir_fresh, DEFAULT)

    a, b = SegmentedIndex(dir_refit), SegmentedIndex(dir_fresh)
    assert a.corpus_stats(spark).collect() == b.corpus_stats(spark).collect()
    da = {r.term: (r.term_id, r.df, round(r.idf, 9)) for r in a.dictionary(spark).collect()}
    db = {r.term: (r.term_id, r.df, round(r.idf, 9)) for r in b.dictionary(spark).collect()}
    assert da == db
    cols = ["segment_id", "term_id", "block_id", "n_docs", "first_doc_id",
            "last_doc_id", "docs_bin", "impacts_bin"]
    ba = sorted(map(tuple, a.blocks(spark).select(*cols).collect()))
    bb = sorted(map(tuple, b.blocks(spark).select(*cols).collect()))
    assert ba == bb  # byte-identical blobs
    assert sorted(a.committed_segments()) == sorted(b.committed_segments())


def test_curation_stats_run_unchanged_on_streams(spark, tmp_path):
    """The per-doc curation analytics (token_stats, quality_scores,
    repetition_stats, langid) are stateless Catalyst projections, so the
    SAME functions compose onto readStream with no state store, watermark,
    or code change — streaming output equals batch output row-for-row.
    (This is the design intent of keeping them pure column math: a crawl
    pipeline can score quality in-flight, not just in nightly batches.)"""
    from splade_spark.curation import (
        langid_heuristic, quality_scores, repetition_stats, token_stats,
    )

    docs = read_documents(spark, SF_SMALL).select("doc_id", "text").limit(50)
    src = str(tmp_path / "stats_src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    for i, op in enumerate(
        [token_stats, quality_scores, repetition_stats, langid_heuristic]
    ):
        name = f"stats_stream_sink_{i}"
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.sql(f"select * from {name}").collect()}
        want = {tuple(r) for r in op(docs).collect()}
        assert got == want, op.__name__
