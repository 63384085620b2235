"""Deterministic corpus sampling for training-data pipelines.

Two ops a crawl-curation pipeline runs after dedup/quality filtering:

* ``capped_per_key_sample`` — keep at most ``cap`` docs per key (domain /
  source / language): the standard guard against a single site dominating
  the training mix. Selection order is the portable md5 hash of the doc id
  (+ doc_id tie-break), so the choice is a pure function of the data —
  reshuffling, re-running, or replaying in SQL picks the same docs.

* ``token_budget_sample`` — take the deterministic hash-ordered PREFIX of
  the corpus whose cumulative token count fits a budget ("give me ~1B
  tokens of this corpus, reproducibly"). The global running sum is computed
  as a DISTRIBUTED PREFIX SCAN, not a single-partition window: a global
  ``Window.orderBy`` without partition keys pulls every row into ONE task —
  the canonical Spark scale trap — so instead the relation is range-
  partitioned on the order key, pass 1 aggregates one total per partition
  (bounded collect: n_partitions rows), and pass 2 adds the broadcast
  exclusive-prefix offset to each partition's local cumulative sum. The
  result equals the single-window cumsum exactly (the order is a global
  total order; integer sums are associative), which is what the DuckDB
  oracle computes.

Prefix semantics: a doc is kept iff its INCLUSIVE cumulative count is
≤ budget — the first doc that crosses the budget is dropped and so is
everything after it, even if some later doc would individually fit. That
keeps "sample = ordered prefix", the property that makes two samples with
budgets B1 < B2 nested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from splade_spark.curation.textstats import _WORD_RE
from splade_spark.dense.hash_embed import portable_hash

SEED_SAMPLE = 7331


def _order_hash(id_col: str):
    return portable_hash(F.col(id_col).cast("string"), SEED_SAMPLE)


def capped_per_key_sample(
    docs: DataFrame,
    key_col: str = "source",
    cap: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """→ input rows + ``pick`` (1-based rank within key), ≤ cap rows per key.

    The per-key window shuffles on ``key_col`` — many small groups (domains),
    no single-reducer collapse; skew in a giant key is bounded by the window
    TopK push-down (rank ≤ cap prunes inside the sort).
    """
    w = Window.partitionBy(key_col).orderBy(_order_hash(id_col), F.col(id_col))
    return (
        docs.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= cap)
    )


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int = 32,
) -> DataFrame:
    """→ (doc_id, n_tokens, cum_tokens): hash-ordered prefix with
    Σ n_tokens ≤ budget_tokens. ``n_tokens`` is the analyzer word count
    (same regex as ``token_stats.word_tokens``).

    Distributed prefix scan (see module docstring): range-partition on the
    order key, per-partition totals (ONE bounded collect of ``n_partitions``
    longs), broadcast exclusive offsets, local cumsum windows. The
    partitioning layout is an execution detail — any boundaries give the
    same global cumsum — but the two passes must see ONE materialization,
    so the ranged relation is cached for the scan and unpersisted after.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
        ).cast("long").alias("n_tokens"),
        _order_hash(id_col).alias("_h"),
    )
    ranged = (
        base.repartitionByRange(n_partitions, "_h", "doc_id")
        .sortWithinPartitions("_h", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    try:
        totals = {
            r["_pid"]: r["_t"]
            for r in ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).collect()
        }
        offsets = {}
        acc = 0
        for pid in sorted(totals):
            offsets[pid] = acc
            acc += totals[pid]
        offset_expr = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in offsets.items() for x in kv]
                ),
                F.col("_pid"),
            ),
            F.lit(0),
        ) if offsets else F.lit(0)
        local = Window.partitionBy("_pid").orderBy("_h", "doc_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        out = (
            ranged.withColumn(
                "cum_tokens", F.sum("n_tokens").over(local) + offset_expr
            )
            .filter(F.col("cum_tokens") <= budget_tokens)
            .select("doc_id", "n_tokens", "cum_tokens")
        )
        # materialize before unpersisting the scan input
        out = out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return out
