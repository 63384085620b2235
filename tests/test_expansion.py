"""SPLADE-style expansion tests: npmi math, max pooling, end-to-end vs an
independent python recompute (SURVEY.md §2.3 B10)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from splade_spark.build.expansion import (
    cooccurrence_npmi, expansion_table, splade_doc_impacts, topk_splade,
)
from splade_spark.build.indexer import build_index_from_docs
from splade_spark.config import DEFAULT
from splade_spark.fixtures import queries_df
from splade_spark.text.analyzer import analyze_text

SF = "/root/testdata/sf0.001"


def test_npmi_hand_computed(spark):
    # 4 docs; (x,y) co-occur in 2; x in 3, y in 2.
    rows = [(1, "xx yy"), (2, "xx yy"), (3, "xx zz"), (4, "qq ww")]
    frames = build_index_from_docs(spark.createDataFrame(rows, ["doc_id", "text"]), DEFAULT)
    from splade_spark.build.postings import term_freqs

    tf = term_freqs(frames.docs)
    out = {
        (r.term_a, r.term_b): (r.n_ab, r.npmi)
        for r in cooccurrence_npmi(tf, frames.corpus_stats, min_pairs=2).collect()
    }
    p_ab, p_a, p_b = 2 / 4, 3 / 4, 2 / 4
    want = math.log(p_ab / (p_a * p_b)) / -math.log(p_ab)
    assert out[("xx", "yy")][0] == 2
    assert out[("xx", "yy")][1] == pytest.approx(want)
    assert out[("yy", "xx")][1] == pytest.approx(want)  # symmetric
    assert ("qq", "xx") not in out  # never co-occur


def test_max_pooling_never_sums(spark):
    impacts = spark.createDataFrame(
        [(1, "aa", 2.0), (1, "bb", 1.0)], ["doc_id", "term", "impact"]
    )
    # aa expands to bb with weight 0.9 → candidate 1.8 > own bb impact 1.0
    exp = spark.createDataFrame([("aa", "bb", 0.9)], ["term_a", "term_b", "weight"])
    out = {(r.doc_id, r.term): r.impact for r in splade_doc_impacts(impacts, exp).collect()}
    assert out[(1, "bb")] == pytest.approx(1.8)  # max(1.0, 1.8), NOT 2.8
    assert out[(1, "aa")] == pytest.approx(2.0)
    # weaker expansion loses to the genuine occurrence
    exp2 = spark.createDataFrame([("aa", "bb", 0.3)], ["term_a", "term_b", "weight"])
    out2 = {(r.doc_id, r.term): r.impact for r in splade_doc_impacts(impacts, exp2).collect()}
    assert out2[(1, "bb")] == pytest.approx(1.0)


def test_splade_topk_vs_python(spark):
    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{SF}/documents.parquet') order by doc_id limit 200"
    ).fetchall()
    frames = build_index_from_docs(spark.createDataFrame(rows, ["doc_id", "text"]), DEFAULT)
    frames.postings.cache().count()
    from splade_spark.build.postings import term_freqs

    tf = term_freqs(frames.docs)
    exp = expansion_table(tf, frames.corpus_stats, m=2, alpha=0.3).cache()
    exp_rows = {(r.term_a): [] for r in exp.collect()}
    for r in exp.collect():
        exp_rows.setdefault(r.term_a, []).append((r.term_b, r.weight))

    queries = queries_df(spark).filter(F.col("query_id") < 5)
    got = defaultdict(list)
    for r in (
        topk_splade(queries, frames, exp, k=5).orderBy("query_id", "rank").collect()
    ):
        got[r.query_id].append((r.doc_id, round(r.score, 6)))

    # ---- independent python recompute -------------------------------------
    N = len(rows)
    toks = {d: analyze_text(t, DEFAULT.analyzer) for d, t in rows}
    doclen = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(doclen.values()) / N
    df_ct = Counter()
    for ts in toks.values():
        df_ct.update(set(ts))
    raw_idf = {t: math.log((N - c + 0.5) / (c + 0.5)) for t, c in df_ct.items()}
    avg_raw = sum(raw_idf.values()) / len(raw_idf)
    idf = {t: (v if v >= 0 else 0.25 * avg_raw) for t, v in raw_idf.items()}

    k1, b = 1.5, 0.75
    base_imp = defaultdict(dict)  # term -> {doc: impact}
    for d, ts in toks.items():
        for t, tfv in Counter(ts).items():
            base_imp[t][d] = tfv * (k1 + 1) / (tfv + k1 * (1 - b + b * doclen[d] / avgdl))
    # expansions (max pooling)
    full_imp = defaultdict(dict)
    for t, docs_i in base_imp.items():
        for d, v in docs_i.items():
            full_imp[t][d] = max(full_imp[t].get(d, -1), v)
    for t_a, exps in exp_rows.items():
        for t_b, w in exps:
            for d, v in base_imp.get(t_a, {}).items():
                cand = w * v
                cur = full_imp[t_b].get(d)
                full_imp[t_b][d] = cand if cur is None else max(cur, cand)

    for qid, text in queries.collect():
        qts = Counter(analyze_text(text, DEFAULT.analyzer))
        qw = {}
        for t, c in qts.items():
            if t in idf:
                qw[t] = max(qw.get(t, -1e18), c * idf[t])
        for t, c in qts.items():
            for t_b, w in exp_rows.get(t, []):
                if t_b in idf:
                    qw[t_b] = max(qw.get(t_b, -1e18), w * idf[t_b])
        scores = defaultdict(float)
        for t, weight in qw.items():
            for d, v in full_imp.get(t, {}).items():
                scores[d] += weight * v
        ranked = sorted(scores.items(), key=lambda x: (-round(x[1], 6), x[0]))[:5]
        want = [(d, round(s, 6)) for d, s in ranked]
        assert got.get(qid, []) == want, f"q{qid}: {got.get(qid)} != {want}"
