#!/usr/bin/env python
"""spark-submit entrypoint: BM25 top-k over a built index.

    spark-submit --py-files splade_spark.zip scripts/query_index.py \\
        --index /tmp/idx [--mode wand|naive] [--k 5] \\
        [--queries path.csv] [--output hits.parquet]

--queries: headered CSV (query_id, text); defaults to the frozen query set.
--mode wand (default) reads the compressed blocks; naive decodes them to
long-form postings first (the semantic cross-check path).
Prints one JSON line with timing + hit count; writes hits if --output given.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--mode", choices=["wand", "naive", "local"], default="wand",
                    help="local = collect the index once and answer driver-side "
                         "(millisecond latency; the reference-REPL analog)")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--format", choices=["parquet", "csv"], default="parquet",
                    help="sink format (csv mirrors the reference's eval CSV sink)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("splade-query-index").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from splade_spark.build.segments import SegmentedIndex, unpack_blocks
    from splade_spark.config import DEFAULT
    from splade_spark.query.naive import topk_naive
    from splade_spark.query.wand import topk_wand

    idx = SegmentedIndex(args.index)
    dictionary = idx.dictionary(spark).cache()
    blocks = idx.blocks(spark)

    if args.queries:
        queries = spark.read.option("header", True).csv(args.queries).select(
            "query_id", "text"
        )
    else:
        from splade_spark.fixtures import queries_df

        queries = queries_df(spark)

    if args.mode == "local":
        from splade_spark.query.local import LocalSearcher

        searcher = LocalSearcher.load(spark, args.index, DEFAULT)
        qrows = [(int(r["query_id"]), r["text"]) for r in queries.collect()]
        t0 = time.monotonic()
        results = searcher.search_batch(qrows, k=args.k)
        elapsed = time.monotonic() - t0
        n = sum(len(v) for v in results.values())
        out = [
            (qid, d, s, i + 1)
            for qid, hits_ in results.items()
            for i, (d, s) in enumerate(hits_)
        ]
        # explicit schema: a no-hit batch yields an empty list, which plain
        # createDataFrame cannot infer a schema from (ADVICE r1)
        from pyspark.sql.types import (
            DoubleType, LongType, StructField, StructType,
        )

        hits_schema = StructType(
            [
                StructField("query_id", LongType()),
                StructField("doc_id", LongType()),
                StructField("score", DoubleType()),
                StructField("rank", LongType()),
            ]
        )
        hits = spark.createDataFrame(
            [(int(q), int(d), float(s), int(r)) for q, d, s, r in out], hits_schema
        )
        if args.output:
            if args.format == "csv":
                hits.write.mode("overwrite").option("header", True).csv(args.output)
            else:
                hits.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"mode": "local", "k": args.k, "hits": n,
                          "query_sec": round(elapsed, 4),
                          "per_query_ms": round(1000 * elapsed / max(len(qrows), 1), 2)}),
              flush=True)
        spark.stop()
        return

    t0 = time.monotonic()
    if args.mode == "wand":
        hits = topk_wand(queries, blocks, dictionary, k=args.k, cfg=DEFAULT)
    else:
        hits = topk_naive(queries, unpack_blocks(blocks), dictionary, k=args.k, cfg=DEFAULT)
    if args.output:
        if args.format == "csv":
            hits.write.mode("overwrite").option("header", True).csv(args.output)
            n = spark.read.option("header", True).csv(args.output).count()
        else:
            hits.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
    else:
        n = hits.count()
    elapsed = time.monotonic() - t0
    print(json.dumps({"mode": args.mode, "k": args.k, "hits": n,
                      "query_sec": round(elapsed, 3)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
