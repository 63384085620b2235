"""Training-data curation operators over the documents/web_pages tables.

Not present in the reference (a 5-doc RAG demo) — these are the operations a
Common-Crawl-scale pipeline needs before indexing (task brief): exact and
near deduplication, similarity search, text statistics / quality scoring,
language ID, fingerprinting, and multimodal column plumbing.
"""

from splade_spark.curation.dedup import (
    exact_dups,
    minhash_lsh_candidates,
    minhash_near_dup_pairs,
    near_dup_clusters,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_tokens,
    simhash64,
    simhash_near_pairs,
)
from splade_spark.curation.sketches import (
    kmv_distinct_tokens,
    kmv_distinct_tokens_by_key,
)
from splade_spark.curation.textstats import (
    gopher_rules,
    langid_heuristic,
    quality_filter,
    quality_scores,
    repetition_stats,
    token_stats,
)
from splade_spark.curation.fingerprint import (
    decontamination_pairs,
    fingerprint_overlap_pairs,
    winnow,
    winnow_fingerprints,
)
from splade_spark.curation.sampling import (
    capped_per_key_sample,
    mixture_sample,
    pack_token_sequences,
    split_assign,
    token_budget_sample,
    uniform_sample,
)
from splade_spark.curation.multimodal import (
    byte_histogram_features,
    decode_image,
    encode_y4m,
    sample_frames,
)

__all__ = [
    "exact_dups",
    "shingle_tokens",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_near_dup_pairs",
    "near_dup_clusters",
    "simhash64",
    "simhash_near_pairs",
    "token_stats",
    "kmv_distinct_tokens",
    "kmv_distinct_tokens_by_key",
    "gopher_rules",
    "quality_filter",
    "quality_scores",
    "repetition_stats",
    "langid_heuristic",
    "winnow",
    "winnow_fingerprints",
    "decontamination_pairs",
    "fingerprint_overlap_pairs",
    "capped_per_key_sample",
    "mixture_sample",
    "pack_token_sequences",
    "split_assign",
    "token_budget_sample",
    "uniform_sample",
    "byte_histogram_features",
    "sample_frames",
    "encode_y4m",
    "decode_image",
]
