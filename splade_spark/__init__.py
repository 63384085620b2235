"""splade_spark — a PySpark-native inverted-index build + BM25 top-k query engine.

Re-expresses the dataflow of the reference (MadisonEvans94/splade: text →
chunk → sparse-encode → inverted index → top-k by dot product, see
/root/reference/ingest.py and /root/reference/retrievers.py) as an idiomatic
Spark DataFrame pipeline, replacing Milvus entirely.

Layout:
    text/     — extractor, splitter, analyzer, stemmer, hashing (pure fns + pandas UDFs)
    build/    — stats/dictionary, postings, block codec, segments, indexer
    query/    — naive DataFrame scoring, block-max WAND, RRF fusion
    sources/  — web_pages fixture builder, table catalog helpers
    oracle/   — single-process pandas oracle (three-way rank-identity checks)
    pipeline/ — training-data ops: dedup, similarity search, text analysis, multimodal
"""

__version__ = "0.1.0"

from splade_spark.config import EngineConfig  # noqa: F401
