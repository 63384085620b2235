#!/usr/bin/env python
"""Catalog introspection / teardown for a segmented index — the engine's
analog of the reference's check_milvus.py (list collections, schema,
num_entities; /root/reference/check_milvus.py:10-31) and clear_milvus.py
(drop-all; /root/reference/clear_milvus.py:9-21).

    spark-submit [--py-files …] scripts/check_index.py --index /tmp/idx
    spark-submit [--py-files …] scripts/check_index.py --index /tmp/idx --drop
"""

from __future__ import annotations

import argparse
import shutil
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--drop", action="store_true", help="delete the index (S11)")
    args = ap.parse_args(argv)

    if args.drop:
        shutil.rmtree(args.index)
        print(f"dropped {args.index}")
        return

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("splade-check-index").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from splade_spark.build.segments import SegmentedIndex

    idx = SegmentedIndex(args.index)
    print(f"index: {args.index}")
    for name, df in [
        ("corpus_stats", idx.corpus_stats(spark)),
        ("dictionary", idx.dictionary(spark)),
        ("docs", idx.docs(spark)),
        ("blocks", idx.blocks(spark)),
    ]:
        print(f"\n== {name} ==")
        df.printSchema()
        print(f"num_entities: {df.count()}")
    print("\n== segments (lineage) ==")
    idx.segments_table(spark).orderBy("segment_id").show(truncate=60)
    total = idx.blocks(spark).agg(
        F.sum("n_docs").alias("postings"), F.count(F.lit(1)).alias("blocks")
    ).head()
    print(f"total postings: {total.postings}  blocks: {total.blocks}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
