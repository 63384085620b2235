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
  segments. Each micro-batch ALSO persists its chunk docs (``docs_stream/
  batch=K``), which makes the drift bounded-and-repairable: ``refit_compact``
  periodically re-fits the dictionary over the FULL doc store and re-encodes
  everything into a fresh index that is bit-identical to a from-scratch
  batch build over the same corpus (tests/test_streaming.py). The new index
  lands in its own directory — at production scale you flip a catalog
  pointer (Iceberg-snapshot style), not rewrite a live petabyte tree.
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
    from splade_spark.build.postings import stem_map_from_terms, surface_term_counts
    from splade_spark.build.segments import (
        SegmentedIndex, _commit_manifest, _dir_bytes, pack_segment_from_tf,
    )

    index = SegmentedIndex(index_dir)

    def _process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        seg_id = base_segment_id + int(batch_id)
        stats = index.corpus_stats(spark)
        dictionary = index.dictionary(spark)

        docs = docs_from_chunks(chunk_pages(batch_df, cfg, use_html=use_html), cfg)
        # Persist this batch's chunk docs so a later refit_compact can re-fit
        # over the FULL corpus. Tokens and doclen are dropped (derived
        # projections, same convention as the batch chunk store — schemas
        # must match for the refit union). Partitioned by batch id + dynamic
        # overwrite → a replayed micro-batch rewrites only its own partition
        # (idempotent, same guarantee as the blocks write below). The batch
        # doc count rides the write as an observed aggregate — it feeds the
        # manifest's n_docs with the SAME definition the batch builder uses
        # (all docs stored for the segment, zero-token docs included;
        # ADVICE r2 unified the two paths).
        from pyspark.sql import Observation

        obs = Observation()
        docs.drop("tokens", "doclen").observe(
            obs, F.count(F.lit(1)).alias("n_docs")
        ).withColumn("batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy("batch").parquet(
            os.path.join(index_dir, "docs_stream")
        )
        n_docs_batch = int(obs.get["n_docs"])
        # Same one-exchange shape as batch phase 1: surface tf (no shuffle) →
        # batch-local stem map + frozen-dictionary broadcast joins → the pack
        # repartition; stemmed partial duplicates merge inside the pack
        # stream. The stem map is derived from THIS batch's surface terms so
        # unseen surface forms still stem onto in-dictionary terms (frozen-
        # fit OOV semantics unchanged).
        surface = surface_term_counts(docs)
        rows = surface
        if cfg.analyzer.stem:
            smap = stem_map_from_terms(rows.select("term").distinct())
            rows = rows.join(F.broadcast(smap), "term").select(
                F.col("term_stemmed").alias("term"), "doc_id", "tf", "doclen"
            )
        long = (
            rows.join(F.broadcast(dictionary.select("term", "term_id")), "term")
            .select("term_id", "doc_id", "tf", "doclen")
            .withColumn("segment_id", F.lit(seg_id).cast("int"))
        )
        avgdl = float(stats.head().avgdl)
        blocks_root = os.path.join(index_dir, "blocks")
        seg_path = os.path.join(blocks_root, f"segment_id={seg_id}")
        t0 = time.monotonic()
        # same partitioned layout as batch builds; dynamic overwrite makes a
        # replayed micro-batch idempotent (rewrites only its own segment dir)
        pack_segment_from_tf(long, avgdl, cfg).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("segment_id").parquet(blocks_root)
        elapsed = max(time.monotonic() - t0, 1e-9)
        # n_postings from the just-written block metadata (Σ n_docs per
        # block = distinct (term, doc) pairs after the in-pack merge) — same
        # definition and same zero-extra-pass trick as the batch builder;
        # the countDistinct over `long` it replaces re-ran the whole
        # chunk→surface pipeline once more per micro-batch.
        n_postings = (
            int(
                spark.read.parquet(seg_path)
                .agg(F.coalesce(F.sum("n_docs"), F.lit(0)).alias("s"))
                .head()["s"]
            )
            if os.path.isdir(seg_path)
            else 0  # batch had no in-dictionary postings → no partition dir
        )
        _commit_manifest(
            index,
            {
                "segment_id": seg_id,
                "status": "committed",
                "n_docs": n_docs_batch,
                "n_postings": n_postings,
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


def refit_compact(
    spark: SparkSession,
    index_dir: str,
    new_index_dir: str,
    cfg: EngineConfig = DEFAULT,
    n_segments: int | None = None,
):
    """Periodic re-fit + re-encode compaction for a streamed index.

    Reads the batch doc store (``docs/``) plus every streamed batch's docs
    (``docs_stream/batch=K``), re-fits corpus_stats + dictionary over the
    union, and rebuilds ALL segments against the fresh fit into
    ``new_index_dir`` — a complete, self-contained index that is
    bit-identical (block blobs included) to a from-scratch batch build over
    the same corpus, because every stage downstream of the doc store is
    deterministic and order-independent (exact-integer avgdl, per-(segment,
    term) sorted packing, frozen codec). The caller flips its catalog
    pointer to the new directory and can then delete the old tree — the
    blue/green pattern that scales to petabyte indexes, rather than an
    in-place rewrite.

    Returns the new SegmentedIndex.
    """
    from splade_spark.build.segments import SegmentedIndex, build_segmented_index

    old = SegmentedIndex(index_dir)
    docs_parts = []
    batch_docs_path = os.path.join(index_dir, "docs")
    stream_docs_path = os.path.join(index_dir, "docs_stream")
    if os.path.exists(os.path.join(batch_docs_path, "_SUCCESS")):
        docs_parts.append(spark.read.parquet(batch_docs_path))
    if os.path.isdir(stream_docs_path):
        docs_parts.append(spark.read.parquet(stream_docs_path).drop("batch"))
    if not docs_parts:
        raise ValueError(f"no doc stores under {index_dir} to re-fit from")
    docs = docs_parts[0]
    for part in docs_parts[1:]:
        docs = docs.unionByName(part)

    os.makedirs(new_index_dir, exist_ok=True)
    new_docs_path = os.path.join(new_index_dir, "docs")
    docs.write.mode("overwrite").parquet(new_docs_path)
    # the builder short-circuits its chunk phase on a committed docs store
    return build_segmented_index(None, new_index_dir, cfg, n_segments=n_segments)
