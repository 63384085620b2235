"""Arrow-batched pandas UDF wrappers around the pure text functions.

All per-row compute in the engine goes through these (BASELINE.json
input_hint: "vectorized pandas/Arrow UDFs (no per-row Python) throughout").
Column math (tf/idf/impact) deliberately does NOT live here — it is plain
Catalyst Column expressions so whole-stage codegen keeps it JVM-side
(SURVEY.md §4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from splade_spark.config import AnalyzerConfig
from splade_spark.text.analyzer import analyze_series
from splade_spark.text.extractor import extract_text_bytes
from splade_spark.text.splitter import split_text


def extract_text_udf():
    """binary html → string text (scalar pandas UDF)."""

    @F.pandas_udf(StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(extract_text_bytes)

    return _extract


def split_chunks_udf(chunk_size: int = 1000, chunk_overlap: int = 100):
    """string text → array<string> chunks; use with posexplode for (chunk_idx, chunk)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _split(text: pd.Series) -> pd.Series:
        return text.map(lambda t: split_text(t, chunk_size, chunk_overlap))

    return _split


def analyze_udf(cfg: AnalyzerConfig = AnalyzerConfig()):
    """string text → array<string> analyzed tokens."""

    @F.pandas_udf(ArrayType(StringType()))
    def _analyze(text: pd.Series) -> pd.Series:
        return analyze_series(text, cfg)

    return _analyze


def analyze_counts_udf(cfg: AnalyzerConfig = AnalyzerConfig()):
    """string text → struct<tokens array<string>, term_counts map<string,int>>.

    One tokenize+stem pass yielding both the ordered token stream (needed by
    shingling/simhash/embeddings) and the per-doc term counts. Emitting the
    counts map from the SAME Arrow batch removes the engine's largest
    shuffle: tf no longer needs a (doc, term)-keyed groupBy over one row per
    token occurrence — the map explode IS the (doc, term, tf) relation.
    """
    from collections import Counter

    from pyspark.sql.types import IntegerType, MapType, StructField, StructType

    out_t = StructType(
        [
            StructField("tokens", ArrayType(StringType())),
            StructField("term_counts", MapType(StringType(), IntegerType())),
        ]
    )

    @F.pandas_udf(out_t)
    def _analyze(text: pd.Series) -> pd.DataFrame:
        tokens = analyze_series(text, cfg)
        counts = tokens.map(lambda ts: dict(Counter(ts)))
        return pd.DataFrame({"tokens": tokens, "term_counts": counts})

    return _analyze
