"""Block-max pruned top-k over compressed posting blocks (SURVEY.md §2.6 T2).

The optimized counterpart of query/naive.py — same scores, same ranks
(three-way rank-identity is tested in tests/test_wand.py), but it reads the
compressed segment blocks (build/segments.py) and skips decode work using the
per-block ``max_impact`` / doc-range metadata.

Execution shape (SURVEY.md §3.2 Spark replacement):

    blocks ⋈ broadcast(encoded queries) on term_id     -- inverted-index seek:
                                                          only query-term rows
                                                          are ever read; parquet
                                                          min/max on term_id
                                                          prunes row groups
    groupBy(query_id, segment_id).applyInPandas(WAND)  -- per-segment top-k;
                                                          group memory bounded
                                                          by segment size
    per_query_topk over segment candidates             -- global merge (tiny)

Per-group traversal: an **exact two-phase MaxScore/block-max scheme**, fully
numpy-vectorized. BM25 idf can be NEGATIVE after the epsilon floor (rank-bm25
semantics, build/stats.py), so query weights split into:

* **positive terms** (qw > 0) — the rare, high-idf, short lists. Scored
  exactly by vectorized term-at-a-time accumulation over all their blocks:
  ``U(d) = Σ_{t∈P, t∋d} qw_t·impact(t,d)``. Since negative terms only lower
  scores, ``U(d)`` is an upper bound of the true score.
* **negative terms** (qw ≤ 0) — terms with df > N/2: the monster lists where
  skipping pays. A uniform pessimistic bound ``B = Σ_{t∈Ng} qw_t·max_impact``
  gives the threshold ``θ = kth(U) + B`` (a valid lower bound on the true
  k-th score, since ``true(d) ≥ U(d) + B`` per doc and order statistics are
  monotone). Only candidates with ``U(d) ≥ θ − ε`` survive; negative-term
  blocks are decoded ONLY when their [first_doc_id, last_doc_id] range
  intersects a survivor (binary-search probe on block metadata — the
  block-max skip).

Survivor scores are EXACT (every relevant increment applied in float64) —
required because rank-identity compares scores, not just docIDs. ε = 1e-6
matches the rank rounding (query/topk.py SCORE_DECIMALS) so boundary ties are
never pruned. Degenerate cases (fewer than k positive-term candidates — e.g.
a query of only stop-adjacent terms) fall back to exact full accumulation
over all terms: always correct, never fast-but-wrong.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from splade_spark.build.codec import decode_doc_ids, decode_impacts
from splade_spark.config import EngineConfig, DEFAULT
from splade_spark.query.encode import encode_queries
from splade_spark.query.topk import per_query_topk

_EPS = 1e-6

_HIT_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


def _accumulate(into_docs, into_scores, new_docs, new_scores):
    """Merge (doc, score-increment) arrays into a (sorted-unique) accumulator."""
    all_docs = np.concatenate((into_docs, new_docs))
    all_scores = np.concatenate((into_scores, new_scores))
    uniq, inv = np.unique(all_docs, return_inverse=True)
    merged = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(merged, inv, all_scores)
    return uniq, merged


def _decode_term(rows: pd.DataFrame, qw: float):
    """Decode every block of one term → (doc_ids, qw·impacts)."""
    docs, scores = [], []
    for r in rows.itertuples(index=False):
        docs.append(decode_doc_ids(r.docs_bin, r.n_docs))
        scores.append(qw * decode_impacts(r.impacts_bin, r.n_docs))
    return np.concatenate(docs), np.concatenate(scores)


def _wand_group(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    qid = int(pdf["query_id"].iloc[0])
    by_term = dict(tuple(pdf.groupby("term_id", sort=False)))
    qw_of = {tid: float(g["qweight"].iloc[0]) for tid, g in by_term.items()}
    pos = [t for t, w in qw_of.items() if w > 0]
    neg = [t for t, w in qw_of.items() if w <= 0]

    # ---- phase 1: exact accumulation over positive (short) lists ----------
    acc_docs = np.empty(0, dtype=np.int64)
    acc_scores = np.empty(0, dtype=np.float64)
    for tid in pos:
        d, s = _decode_term(by_term[tid], qw_of[tid])
        acc_docs, acc_scores = _accumulate(acc_docs, acc_scores, d, s)

    stats = {"pos_blocks": int(sum(len(by_term[t]) for t in pos))}

    if neg:
        B = sum(qw_of[t] * float(by_term[t]["max_impact"].max()) for t in neg)
        theta = (
            np.partition(acc_scores, acc_scores.size - k)[acc_scores.size - k] + B
            if acc_docs.size >= k
            else -np.inf
        )
        # Pruning is sound only when θ > 0: docs with no positive term have
        # true score ≤ 0 and were never accumulated, so they may only be
        # dropped when the k-th guaranteed score beats them.
        if theta > _EPS:
            # ---- phase 2: prune, then exact negative increments -----------
            keep = acc_scores >= (theta - 2 * _EPS)  # 2ε: immune to round-to-6 ties
            acc_docs, acc_scores = acc_docs[keep], acc_scores[keep]
            for tid in neg:
                g = by_term[tid]
                firsts = g["first_doc_id"].to_numpy()
                lasts = g["last_doc_id"].to_numpy()
                lo = np.searchsorted(acc_docs, firsts, side="left")
                hi = np.searchsorted(acc_docs, lasts, side="right")
                hit_blocks = np.nonzero(hi > lo)[0]
                rows = list(g.itertuples(index=False))
                for bi in hit_blocks:
                    r = rows[bi]
                    d = decode_doc_ids(r.docs_bin, r.n_docs)
                    s = qw_of[tid] * decode_impacts(r.impacts_bin, r.n_docs)
                    idx = np.searchsorted(acc_docs, d)
                    idx[idx == acc_docs.size] = 0
                    m = acc_docs[idx] == d
                    if m.any():
                        np.add.at(acc_scores, idx[m], s[m])
        else:
            # Degenerate: not enough positive-term candidates for a sound
            # threshold (e.g. all-negative query). Exact full accumulation.
            for tid in neg:
                d, s = _decode_term(by_term[tid], qw_of[tid])
                acc_docs, acc_scores = _accumulate(acc_docs, acc_scores, d, s)

    if acc_docs.size == 0:
        return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int64", "doc_id": "int64", "score": "float64"}
        )
    # per-segment top-k with the frozen tie-break (round 6, doc_id asc)
    key_score = np.round(acc_scores, 6)
    order = np.lexsort((acc_docs, -key_score))[:k]
    return pd.DataFrame(
        {"query_id": qid, "doc_id": acc_docs[order], "score": acc_scores[order]}
    )


def topk_wand(
    queries: DataFrame,
    blocks: DataFrame,
    dictionary: DataFrame,
    k: int | None = None,
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """queries(query_id, text) → (query_id, doc_id, score, rank) via blocks."""
    k = k if k is not None else cfg.top_k
    encoded = encode_queries(queries, dictionary, cfg)
    joined = blocks.join(F.broadcast(encoded), "term_id")
    hits = joined.groupBy("query_id", "segment_id").applyInPandas(
        lambda pdf: _wand_group(pdf, k), _HIT_SCHEMA
    )
    return per_query_topk(hits, k)
