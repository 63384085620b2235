"""Streaming dedup: canonical labeling matches batch exact-dedup semantics,
watermark path keeps first-seen only."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("warc_ts", TimestampType()),
    ]
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _rows_batch1():
    return [
        (1, "alpha page", T0),
        (2, "beta page", T0 + dt.timedelta(minutes=1)),
        (3, "alpha page", T0 + dt.timedelta(minutes=2)),  # dup of 1, same batch
    ]


def _rows_batch2():
    return [
        (4, "alpha page", T0 + dt.timedelta(minutes=3)),  # dup of 1, later batch
        (5, "gamma page", T0 + dt.timedelta(minutes=4)),
    ]


def _stream_two_batches(spark, tmp_path, name):
    src = str(tmp_path / f"src_{name}")
    spark.createDataFrame(_rows_batch1(), SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(_rows_batch2(), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    return (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )


def test_stream_canonicalize(spark, tmp_path):
    from splade_spark.streaming import stream_canonicalize

    out = stream_canonicalize(_stream_two_batches(spark, tmp_path, "canon"))
    q = (
        out.writeStream.format("memory")
        .queryName("canon_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_canon"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_first"])
        for r in spark.sql("select * from canon_sink").collect()
    }
    assert got == {
        1: (1, True),
        2: (2, True),
        3: (1, False),
        4: (1, False),  # cross-micro-batch duplicate: state carried canonical
        5: (5, True),
    }

    # group membership equals batch exact_dups over the same rows
    from splade_spark.curation.dedup import exact_dups

    all_rows = spark.createDataFrame(_rows_batch1() + _rows_batch2(), SCHEMA)
    batch = {
        r["doc_id"]: r["canonical_id"] for r in exact_dups(all_rows).collect()
    }
    groups_stream = {}
    for d, (c, _) in got.items():
        groups_stream.setdefault(c, set()).add(d)
    groups_batch = {}
    for d, c in batch.items():
        groups_batch.setdefault(c, set()).add(d)
    assert sorted(groups_stream.values(), key=min) == sorted(
        groups_batch.values(), key=min
    )


def test_stream_exact_dedup(spark, tmp_path):
    from splade_spark.streaming import stream_exact_dedup

    out = stream_exact_dedup(_stream_two_batches(spark, tmp_path, "drop"))
    q = (
        out.writeStream.format("memory")
        .queryName("drop_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_drop"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(
        r["doc_id"] for r in spark.sql("select * from drop_sink").collect()
    )
    assert kept == [1, 2, 5]
