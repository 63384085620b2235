from splade_spark.text.analyzer import analyze_text, analyze_series  # noqa: F401
from splade_spark.text.splitter import split_text  # noqa: F401
from splade_spark.text.extractor import extract_text_bytes  # noqa: F401
from splade_spark.text.hashing import xxh64, chunk_doc_id  # noqa: F401
