from splade_spark.build.chunker import chunk_pages, docs_from_chunks  # noqa: F401
from splade_spark.build.stats import compute_corpus_stats, build_dictionary  # noqa: F401
from splade_spark.build.postings import term_freqs, doc_impacts, postings_long  # noqa: F401
