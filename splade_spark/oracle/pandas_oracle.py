"""Single-process pandas oracle — independent implementation of the scoring
spec (FIXTURES.md §4, SURVEY.md §5 test 2).

Deliberately written as naive loops/dicts (NOT DataFrame ops) so that an
engine bug and an oracle bug are unlikely to coincide. Shares only the pure
text functions (analyzer/splitter/extractor/hash), which ARE the frozen spec.

Three-way rank-identity: naive DataFrame path == block-max WAND path ==
this oracle, on docIDs AND scores (rounded 1e-6), ties (score desc, doc_id asc).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from splade_spark.config import EngineConfig, DEFAULT
from splade_spark.text.analyzer import analyze_text
from splade_spark.text.extractor import extract_text_bytes
from splade_spark.text.hashing import chunk_doc_id
from splade_spark.text.splitter import split_text


@dataclass
class PandasOracle:
    cfg: EngineConfig = field(default_factory=lambda: DEFAULT)

    def __post_init__(self):
        self.docs: dict[int, list[str]] = {}  # doc_id -> tokens
        self.texts: dict[int, str] = {}
        self.n_docs = 0
        self.avgdl = 0.0
        self.df: Counter = Counter()
        self.idf: dict[str, float] = {}
        self.term_id: dict[str, int] = {}
        self.impacts: dict[str, dict[int, float]] = {}  # term -> {doc_id: impact}

    # --- ingest -----------------------------------------------------------
    def add_page(self, url: str, html: bytes | None = None, text: str | None = None) -> None:
        body = extract_text_bytes(html) if html is not None else (text or "")
        for idx, chunk in enumerate(split_text(body, self.cfg.chunk_size, self.cfg.chunk_overlap)):
            did = chunk_doc_id(url, idx)
            self.docs[did] = analyze_text(chunk, self.cfg.analyzer)
            self.texts[did] = chunk

    def add_doc(self, doc_id: int, text: str) -> None:
        """Pre-chunked ingestion (documents.parquet rows used verbatim)."""
        self.docs[doc_id] = analyze_text(text, self.cfg.analyzer)
        self.texts[doc_id] = text

    # --- fit (B3) ----------------------------------------------------------
    def fit(self) -> None:
        self.n_docs = len(self.docs)
        total = sum(len(t) for t in self.docs.values())
        self.avgdl = total / self.n_docs if self.n_docs else 0.0
        self.df = Counter()
        for toks in self.docs.values():
            for t in set(toks):
                self.df[t] += 1
        raw = {
            t: math.log((self.n_docs - d + 0.5) / (d + 0.5)) for t, d in self.df.items()
        }
        avg_raw = sum(raw.values()) / len(raw) if raw else 0.0
        self.idf = {
            t: (v if v >= 0 else self.cfg.epsilon * avg_raw) for t, v in raw.items()
        }
        # term ids: (df desc, term asc)
        ordered = sorted(self.df.items(), key=lambda kv: (-kv[1], kv[0]))
        self.term_id = {t: i for i, (t, _) in enumerate(ordered)}
        # doc impacts (B4)
        k1, b = self.cfg.k1, self.cfg.b
        self.impacts = {}
        for did, toks in self.docs.items():
            dl = len(toks)
            for t, tf in Counter(toks).items():
                w = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
                self.impacts.setdefault(t, {})[did] = w

    # --- query (B9 + A3 + T2) ----------------------------------------------
    def encode_query(self, text: str) -> dict[str, float]:
        toks = analyze_text(text, self.cfg.analyzer)
        weights: dict[str, float] = {}
        for t, qtf in Counter(toks).items():
            if t in self.idf:
                weights[t] = qtf * self.idf[t]
        return weights

    def topk(self, text: str, k: int | None = None) -> list[tuple[int, float]]:
        k = k if k is not None else self.cfg.top_k
        weights = self.encode_query(text)
        scores: dict[int, float] = {}
        # fixed summation order: ascending term_id (FIXTURES.md §4)
        for t in sorted(weights, key=lambda t: self.term_id[t]):
            qw = weights[t]
            for did, imp in self.impacts.get(t, {}).items():
                scores[did] = scores.get(did, 0.0) + qw * imp
        # rank on rounded score (frozen tie spec — see query/topk.py)
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
        return ranked[:k]
