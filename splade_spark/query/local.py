"""Driver-side interactive searcher — the low-latency analog of the
reference's REPL (/root/reference/main.py:166-186).

A Spark job costs ~0.5 s of scheduling/planning regardless of input size, so
per-query p95 latency of the distributed paths is floored there. The
reference answers single queries in-process against a loaded Milvus
collection (`collection.load()`, ingest.py:172); ``LocalSearcher`` is the
same trade expressed Spark-natively: the (compact, compressed) posting
blocks and dictionary are **collected once** from the segmented index into
driver memory, and each query is then scored in pure numpy — identical
formulas, identical tie-break, rank-identical to the cluster paths
(tests/test_local_search.py), at sub-10 ms per query.

Scale position: this is explicitly the SMALL-index / interactive tool — the
collected index must fit the driver (fine for per-tenant or per-shard
indexes; the sf0.1 bench index is ~100 MB). Batch and large-scale retrieval
stay on the distributed naive/WAND paths.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from splade_spark.build.codec import decode_doc_ids, decode_impacts
from splade_spark.config import EngineConfig, DEFAULT
from splade_spark.text.analyzer import analyze_text

SCORE_DECIMALS = 6


class LocalSearcher:
    """In-memory BM25 top-k over a collected segmented index."""

    def __init__(self, dictionary_rows, block_rows, cfg: EngineConfig = DEFAULT):
        self.cfg = cfg
        self.term_id = {}
        self.idf = {}
        for r in dictionary_rows:
            self.term_id[r["term"]] = r["term_id"]
            self.idf[r["term_id"]] = r["idf"]
        # term_id -> list of (doc_ids np.int64[], impacts np.float64[])
        self.postings: dict[int, list] = {}
        for r in block_rows:
            d = decode_doc_ids(bytes(r["docs_bin"]), r["n_docs"])
            w = decode_impacts(bytes(r["impacts_bin"]), r["n_docs"])
            self.postings.setdefault(r["term_id"], []).append((d, w))

    @classmethod
    def load(cls, spark, index_dir: str, cfg: EngineConfig = DEFAULT) -> "LocalSearcher":
        """Collect dictionary + blocks from a SegmentedIndex (one Spark job each)."""
        from splade_spark.build.segments import SegmentedIndex

        idx = SegmentedIndex(index_dir)
        return cls(
            [r.asDict() for r in idx.dictionary(spark).collect()],
            [r.asDict() for r in idx.blocks(spark).collect()],
            cfg,
        )

    @classmethod
    def from_frames(cls, frames, cfg: EngineConfig = DEFAULT) -> "LocalSearcher":
        """Collect from in-memory IndexFrames via the block packer."""
        from splade_spark.build.segments import pack_segment

        return cls(
            [r.asDict() for r in frames.dictionary.collect()],
            [r.asDict() for r in pack_segment(frames.postings, cfg).collect()],
            cfg,
        )

    def encode(self, text: str) -> dict[int, float]:
        """B9: analyze → qtf·idf per known term (OOV drops out)."""
        out: dict[int, float] = {}
        for term, qtf in Counter(analyze_text(text, self.cfg.analyzer)).items():
            tid = self.term_id.get(term)
            if tid is not None:
                out[tid] = qtf * self.idf[tid]
        return out

    def search(self, text: str, k: int | None = None) -> list[tuple[int, float]]:
        """→ [(doc_id, score)] top-k, ties (round(score,6) desc, doc_id asc)."""
        k = k if k is not None else self.cfg.top_k
        weights = self.encode(text)
        if not weights:
            return []
        acc_docs = np.empty(0, dtype=np.int64)
        acc_scores = np.empty(0, dtype=np.float64)
        # summation order fixed by ascending term_id (SURVEY §4 float spec)
        for tid in sorted(weights):
            blocks = self.postings.get(tid)
            if not blocks:
                continue
            qw = weights[tid]
            d = np.concatenate([b[0] for b in blocks])
            s = qw * np.concatenate([b[1] for b in blocks])
            all_d = np.concatenate((acc_docs, d))
            all_s = np.concatenate((acc_scores, s))
            acc_docs, inv = np.unique(all_d, return_inverse=True)
            acc_scores = np.zeros(acc_docs.size, dtype=np.float64)
            np.add.at(acc_scores, inv, all_s)
        key = np.round(acc_scores, SCORE_DECIMALS)
        order = np.lexsort((acc_docs, -key))[:k]
        return [(int(acc_docs[i]), float(acc_scores[i])) for i in order]

    def search_batch(self, queries: list[tuple[int, str]], k: int | None = None):
        """[(query_id, text)] → {query_id: [(doc_id, score)]}."""
        return {qid: self.search(text, k) for qid, text in queries}
