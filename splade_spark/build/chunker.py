"""web_pages → chunk docs.

Replaces the reference's driver-memory ``preprocess_documents``
(/root/reference/ingest.py:86-97) with a distributed stage: one Arrow-batched
pandas UDF does extract→split→doc-id in a single JVM↔Python crossing, then
``inline`` explodes chunks JVM-side. Chunk identity is the deterministic
``doc_id = xxh64(url, chunk_idx)`` (SURVEY.md §1.4 — replaces uuid4 at
/root/reference/ingest.py:139).

Tokenization does NOT happen in Python: the chunk UDF additionally emits a
nullable ``norm`` field (``NFC(chunk).lower()`` for non-ASCII chunks, NULL
for the ASCII majority), and ``docs_from_chunks`` derives ``tokens`` with
pure Catalyst expressions (text/catalyst.py) — the round-2 scaling fix.
Porter2 stemming, when configured, folds the term space downstream via the
distinct-term stem map (build/postings.py), which yields identical term
frequencies at a tiny fraction of the per-occurrence cost.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
)

from splade_spark.config import EngineConfig, DEFAULT
from splade_spark.text.catalyst import nostem_tokens
from splade_spark.text.extractor import extract_text_bytes
from splade_spark.text.hashing import chunk_doc_id
from splade_spark.text.splitter import split_text
from splade_spark.text.udfs import normalize_text

_CHUNK_STRUCT = ArrayType(
    StructType(
        [
            StructField("chunk_idx", IntegerType()),
            StructField("doc_id", LongType()),
            StructField("chunk", StringType()),
            # NFC+lower override for non-ASCII chunks; NULL when the chunk is
            # pure ASCII (then Catalyst lower() is exact) — text/catalyst.py
            StructField("norm", StringType()),
        ]
    )
)


def _chunk_rows_udf(chunk_size: int, chunk_overlap: int, from_html: bool):
    @F.pandas_udf(_CHUNK_STRUCT)
    def _chunk(url: pd.Series, payload: pd.Series) -> pd.Series:
        out = []
        for u, p in zip(url, payload):
            text = extract_text_bytes(p) if from_html else (p or "")
            chunks = split_text(text, chunk_size, chunk_overlap)
            out.append(
                [
                    (i, chunk_doc_id(u, i), c, normalize_text(c))
                    for i, c in enumerate(chunks)
                ]
            )
        return pd.Series(out)

    return _chunk


def chunk_pages(pages: DataFrame, cfg: EngineConfig = DEFAULT, use_html: bool = True) -> DataFrame:
    """web_pages(url, …, html, text, …) → (url, chunk_idx, doc_id, text, norm).

    ``use_html=True`` runs the extractor on the binary column (the production
    path); ``use_html=False`` chunks the ``text`` column directly.
    """
    payload = F.col("html") if use_html else F.col("text")
    udf = _chunk_rows_udf(cfg.chunk_size, cfg.chunk_overlap, use_html)
    return pages.select(
        F.col("url"),
        F.inline(udf(F.col("url"), payload)),
    ).withColumnRenamed("chunk", "text")


def docs_from_chunks(chunks: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Attach analysis → docs(doc_id, url, chunk_idx, text, tokens, doclen).

    ``tokens`` is the SURFACE token stream (NFC → lower → ``[a-z0-9]+`` →
    stopword filter) computed entirely in Catalyst — whole-stage codegen, no
    Python objects per token. Stemming (cfg.analyzer.stem) is applied by
    ``term_freqs(docs, cfg)`` through the distinct-term stem map, which
    produces identical stemmed term frequencies (tf of stemmed terms is the
    same multiset whether stemming precedes or follows counting) while
    running Porter2 once per distinct term instead of once per occurrence.
    """
    norm = F.col("norm") if "norm" in chunks.columns else F.lit(None).cast("string")
    return (
        chunks.withColumn("norm", norm)
        .withColumn("tokens", nostem_tokens(F.coalesce(F.col("norm"), F.col("text"))))
        .select("doc_id", "url", "chunk_idx", "text", "norm", "tokens")
        .withColumn("doclen", F.size("tokens"))
    )


def attach_tokens(docs: DataFrame, allow_missing_norm: bool = False) -> DataFrame:
    """Re-derive the token stream on a docs frame read back from storage.

    The persisted chunk store carries (text, norm) but NOT the token arrays
    or doclen — tokens are a deterministic Catalyst projection of text⊕norm
    (and doclen of tokens), so storing them would double the store for data
    one codegen stage re-derives at memory speed (the shared-disk regime is
    where builds bottleneck first; cf. BENCH/BASELINE.md).

    A frame carrying ``text`` but no ``norm`` column is REFUSED by default
    (ADVICE r2): silently substituting NULL would re-derive tokens from raw
    text and diverge from the frozen analyzer on non-ASCII rows — exactly
    the hazard CLAUDE.md's convention warns about. Pass
    ``allow_missing_norm=True`` only for frames known to be ASCII-only.
    """
    if "tokens" not in docs.columns:
        if "norm" in docs.columns:
            norm = F.col("norm")
        elif allow_missing_norm:
            norm = F.lit(None).cast("string")
        else:
            raise ValueError(
                "docs frame has text but no 'norm' column — re-deriving tokens "
                "would silently change tokenization for non-ASCII rows; keep "
                "the nullable norm column wherever text is persisted, or pass "
                "allow_missing_norm=True for ASCII-only frames"
            )
        docs = docs.withColumn("tokens", nostem_tokens(F.coalesce(norm, F.col("text"))))
    if "doclen" not in docs.columns:
        docs = docs.withColumn("doclen", F.size("tokens"))
    return docs
