"""Structured-Streaming incremental index build (SURVEY.md §2.9 stretch).

The reference has zero streaming — ingest is a batch script
(/root/reference/ingest.py:177-195). The streaming analog our north rule
implies is *incremental segment builds*: new web_pages arrive continuously;
each micro-batch becomes one immutable segment (B7), and the background
merge stage (B8, build/segments.py merge_segments) compacts.

Design decisions:

* ``foreachBatch`` drives the SAME batch packing code path used by
  build_segmented_index — one implementation of the physical format, two
  drivers (batch + streaming). Segment ids for streamed segments are
  ``base + batch_id``; manifests are identical, so resume/merge/query treat
  streamed segments exactly like batch-built ones.
* Global BM25 stats (dictionary/corpus_stats) come from a FIT PREFIX: the
  dictionary is fit once on the initial corpus (or a prior batch build) and
  streamed segments encode against that frozen fit. That matches the
  reference's snapshot-fit semantics (BM25 re-fit per process at
  /root/reference/main.py:57-64) while keeping scores stable across
  segments; a periodic re-fit + re-encode is a compaction policy decision.
* Checkpointing: Spark's streaming checkpoint gives exactly-once foreachBatch
  delivery; our per-segment manifests add engine-level idempotence on top
  (a replayed batch overwrites its own segment directory, then re-commits
  the same manifest — idempotent).

Watermarks/event-time windows are not needed for index building (append-only
corpus, no aggregations over event time); late pages simply land in a later
segment — document identity stays (url, chunk_idx) so the merge stage dedups
re-crawled pages by doc_id if a dedup policy is configured.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from splade_spark.config import EngineConfig, DEFAULT


def stream_build_segments(
    pages_stream: DataFrame,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    use_html: bool = True,
    base_segment_id: int = 1000,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """readStream(web_pages) → one committed segment per micro-batch.

    Requires a fitted index at ``index_dir`` (dictionary + corpus_stats from
    a prior batch build). Returns the StreamingQuery; with
    ``trigger_once=True`` (default) processes all available input then stops
    — the batch-incremental mode that needs no long-running driver.
    """
    from splade_spark.build.chunker import chunk_pages, docs_from_chunks
    from splade_spark.build.postings import doc_impacts, postings_long, term_freqs
    from splade_spark.build.segments import (
        SegmentedIndex, _commit_manifest, _dir_bytes, pack_segment,
    )

    index = SegmentedIndex(index_dir)

    def _process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        seg_id = base_segment_id + int(batch_id)
        stats = index.corpus_stats(spark)
        dictionary = index.dictionary(spark)

        docs = docs_from_chunks(chunk_pages(batch_df, cfg, use_html=use_html), cfg)
        tf = term_freqs(docs, cfg)
        impacts = doc_impacts(tf, stats, cfg)
        long = postings_long(impacts, dictionary).withColumn(
            "segment_id", F.lit(seg_id).cast("int")
        )
        blocks_root = os.path.join(index_dir, "blocks")
        seg_path = os.path.join(blocks_root, f"segment_id={seg_id}")
        t0 = time.monotonic()
        # same partitioned layout as batch builds; dynamic overwrite makes a
        # replayed micro-batch idempotent (rewrites only its own segment dir)
        pack_segment(long, cfg).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("segment_id").parquet(blocks_root)
        elapsed = max(time.monotonic() - t0, 1e-9)
        agg = long.agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.countDistinct("doc_id").alias("n_docs"),
        ).head()
        _commit_manifest(
            index,
            {
                "segment_id": seg_id,
                "status": "committed",
                "n_docs": int(agg.n_docs),
                "n_postings": int(agg.n_postings),
                "bytes": _dir_bytes(seg_path),
                "built_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "lineage": json.dumps(
                    {"stream_batch_id": int(batch_id), "mode": "streaming-foreachBatch"}
                ),
            },
        )

    writer = pages_stream.writeStream.foreachBatch(_process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
