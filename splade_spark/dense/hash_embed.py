"""Deterministic dense channel: feature-hashing ("hashing trick") embeddings.

The reference's dense channel is OpenAI ada-002 (1536-dim, network call at
/root/reference/ingest.py:184-185, retrievers.py:62,106) — unavailable and
non-deterministic. The engine keeps the dense channel's INTERFACE (a vector
per doc/query + cosine top-k feeding RRF, retrievers.py:111-118) but swaps
the encoder for the classic feature-hashing projection:

    bucket(t) = xxhash64(term, SEED)   mod dim
    sign(t)   = ±1 from xxhash64(term, SEED+1)
    vec[b]    = Σ_{t: bucket(t)=b} sign(t) · tf(t)

Everything is Catalyst column math over LONG-FORM vectors (doc_id, bucket,
val) — no UDFs, no dense arrays: the dot product is a join on bucket + a
sum, which Spark executes as a shuffle join that scales with the number of
NON-ZERO entries (≪ dim · docs). SQL-expressible, so the DuckDB oracle can
replay it exactly (xxhash64 is replaced by a portable mix both sides share —
see portable_hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from splade_spark.config import EngineConfig, DEFAULT
from splade_spark.text.udfs import analyze_udf

SEED_BUCKET = 1
SEED_SIGN = 2
DEFAULT_DIM = 256


def portable_hash(col, seed: int):
    """Portable 32-bit hash: first 8 hex chars of ``md5(term || '#seed')``.

    Engine-internal hashing elsewhere uses xxhash64 (JVM-native, faster), but
    the dense-channel hash must be REPLAYABLE BY THE ORACLE: DuckDB computes
    the identical value as ``('0x'||substr(md5(term||'#seed'),1,8))::UBIGINT``
    (tested bit-equal). md5 is a built-in JVM expression — stays in codegen.
    """
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 8), 16, 10
    ).cast("long")


def _long_form(tokens_exploded: DataFrame, id_col: str, dim: int) -> DataFrame:
    """(id, term, tf) → (id, bucket, val) with feature-hash bucket/sign."""
    bucket = F.pmod(portable_hash(F.col("term"), SEED_BUCKET), F.lit(dim)).cast("int")
    sign = (F.pmod(portable_hash(F.col("term"), SEED_SIGN), F.lit(2)) * 2 - 1).cast("double")
    return (
        tokens_exploded.withColumn("bucket", bucket)
        .withColumn("signed", sign * F.col("tf"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("signed").alias("val"))
        .filter(F.col("val") != 0)
    )


def hash_embed_docs(docs: DataFrame, dim: int = DEFAULT_DIM) -> DataFrame:
    """docs(doc_id, tokens) → long-form (doc_id, bucket, val)."""
    tf = (
        docs.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    return _long_form(tf, "doc_id", dim)


def hash_embed_queries(
    queries: DataFrame, cfg: EngineConfig = DEFAULT, dim: int = DEFAULT_DIM
) -> DataFrame:
    """queries(query_id, text) → long-form (query_id, bucket, val)."""
    tf = (
        queries.select(
            "query_id", F.explode(analyze_udf(cfg.analyzer)(F.col("text"))).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    return _long_form(tf, "query_id", dim)


def cosine_topk_sparse(
    doc_vecs: DataFrame, query_vecs: DataFrame, k: int = 5
) -> DataFrame:
    """Cosine top-k between long-form vectors → (query_id, doc_id, score, rank).

    dot = join on bucket (query side broadcast — queries ≪ docs);
    norms = per-id aggregates. Ties: (round(score,6) desc, doc_id asc).
    """
    doc_norm = doc_vecs.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("dnorm")
    )
    q_norm = query_vecs.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("qnorm")
    )
    dots = (
        doc_vecs.join(
            F.broadcast(query_vecs.withColumnRenamed("val", "qval")), "bucket"
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("val") * F.col("qval")).alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(q_norm), "query_id")
        .join(doc_norm, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("dot") / (F.col("dnorm") * F.col("qnorm"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
