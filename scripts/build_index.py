#!/usr/bin/env python
"""spark-submit entrypoint: build (or resume) a segmented index.

    spark-submit --py-files splade_spark.zip scripts/build_index.py \\
        --input /root/testdata/sf0.01 --output /tmp/idx [--segments 4] \\
        [--replicate 1] [--from-docs]

Reads ``documents.parquet`` under --input, derives the web_pages table
(FIXTURES.md §1), and runs the resumable segmented build
(splade_spark.build.segments). Rerunning with the same --output resumes from
committed segment manifests. Prints one JSON line of build metrics.

The session comes from spark-submit's conf (no master override here) so the
same script runs on local[N] or a real cluster unchanged — the N-vs-4N
scaling evidence uses exactly this path.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing documents.parquet")
    ap.add_argument("--output", required=True, help="index directory (resume target)")
    ap.add_argument("--segments", type=int, default=None)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--expand-text", type=int, default=1,
                    help="repeat each text k times (realistic KB-scale pages)")
    ap.add_argument("--vocab-buckets", type=int, default=0,
                    help="salt words with per-(word,url) hash tails so the "
                         "vocabulary grows with corpus size (Zipf/Heaps "
                         "fixture — VERDICT r2 #4)")
    ap.add_argument("--from-docs", action="store_true",
                    help="index documents.parquet rows directly (skip html wrap)")
    ap.add_argument("--stage-pages", default=None,
                    help="write the derived web_pages table here first and build "
                         "from the parquet (fixture derivation excluded from timing)")
    ap.add_argument("--dedup", choices=["exact"], default=None,
                    help="drop exact-duplicate chunk texts before the fit")
    ap.add_argument("--warm-workers", action="store_true",
                    help="pre-fork Python UDF workers before the timed build "
                         "(steady-state throughput measurement)")
    ap.add_argument("--warm-build", type=int, default=0, metavar="N_PAGES",
                    help="before the timed build, run the full pipeline over "
                         "the first N staged pages into a throwaway index and "
                         "discard it — first execution of each generated plan "
                         "is 1.5-2x slower than warm (codegen + JVM JIT, "
                         "measured: 13.4s cold vs 6.2s warm at sf0.1 "
                         "local[32]), a per-process cost a long-lived "
                         "executor fleet pays once, not per job; the timed "
                         "number is then the steady-state throughput a real "
                         "cluster sustains")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("splade-build-index").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from splade_spark.build.segments import build_segmented_index
    from splade_spark.config import DEFAULT
    from splade_spark.sources.web_pages import read_documents, web_pages_from_documents

    pages = web_pages_from_documents(
        read_documents(spark, args.input),
        replicate=args.replicate,
        expand_text=args.expand_text,
        vocab_hash_buckets=args.vocab_buckets,
    )
    if args.stage_pages:
        cores = spark.sparkContext.defaultParallelism
        pages.repartition(cores * 2).write.mode("overwrite").parquet(args.stage_pages)
        # re-spread the scan (small staged table → 1-2 byte-based partitions)
        pages = spark.read.parquet(args.stage_pages).repartition(cores * 2)
    n_pages = pages.count()
    if args.warm_workers:
        from pyspark.sql import functions as F
        from pyspark.sql.types import IntegerType

        cores = spark.sparkContext.defaultParallelism

        @F.pandas_udf(IntegerType())
        def _warm(s):
            import splade_spark.text.analyzer  # noqa: F401
            return s * 0

        spark.range(0, cores * 4, 1, cores * 2).select(
            _warm(F.col("id").cast("int"))
        ).count()
    if args.warm_build > 0:
        import shutil

        warm_dir = args.output.rstrip("/") + "_warm"
        shutil.rmtree(warm_dir, ignore_errors=True)
        build_segmented_index(
            pages.limit(args.warm_build), warm_dir, DEFAULT,
            use_html=not args.from_docs, n_segments=1, dedup=args.dedup,
        )
        shutil.rmtree(warm_dir, ignore_errors=True)
    t0 = time.monotonic()
    idx = build_segmented_index(
        pages, args.output, DEFAULT, use_html=not args.from_docs,
        n_segments=args.segments, dedup=args.dedup,
    )
    elapsed = time.monotonic() - t0
    manifests = idx.committed_segments()
    out = {
        "n_pages": n_pages,
        "n_segments": len(manifests),
        "n_docs": sum(m["n_docs"] for m in manifests.values()),
        "n_postings": sum(m["n_postings"] for m in manifests.values()),
        "bytes": sum(m["bytes"] for m in manifests.values()),
        "build_sec": round(elapsed, 3),
        "docs_per_sec": round(n_pages / elapsed, 2),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
