"""Dense channel tests: feature-hash embeddings, cosine top-k, brute vs LSH
ANN over the embeddings fixture."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from splade_spark.config import DEFAULT
from splade_spark.dense import (
    brute_cosine_topk, cosine_topk_sparse, hash_embed_docs, hash_embed_queries,
    lsh_cosine_topk,
)
from splade_spark.dense.hash_embed import DEFAULT_DIM, SEED_BUCKET, SEED_SIGN
from splade_spark.text.analyzer import analyze_text

SF = "/root/testdata/sf0.001"


def _py_hash(term: str, seed: int) -> int:
    return int(hashlib.md5(f"{term}#{seed}".encode()).hexdigest()[:8], 16)


def _py_embed(tokens, dim=DEFAULT_DIM):
    vec = Counter()
    for t, tf in Counter(tokens).items():
        b = _py_hash(t, SEED_BUCKET) % dim
        s = 1.0 if _py_hash(t, SEED_SIGN) % 2 == 1 else -1.0
        vec[b] += s * tf
    return {b: v for b, v in vec.items() if v != 0}


@pytest.fixture(scope="module")
def docs(spark):
    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{SF}/documents.parquet') order by doc_id"
    ).fetchall()
    from splade_spark.text.udfs import analyze_udf

    df = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id", analyze_udf(DEFAULT.analyzer)(F.col("text")).alias("tokens")
    )
    return rows, df.cache()


def test_hash_embed_matches_independent_python(spark, docs):
    rows, df = docs
    got = defaultdict(dict)
    for r in hash_embed_docs(df).collect():
        got[r.doc_id][r.bucket] = r.val
    for doc_id, text in rows[:50]:
        want = _py_embed(analyze_text(text, DEFAULT.analyzer))
        assert got[doc_id] == pytest.approx(want), doc_id


def test_cosine_topk_sparse_matches_numpy(spark, docs):
    rows, df = docs
    dvecs = hash_embed_docs(df).cache()
    queries = spark.createDataFrame(
        [(0, "sort merge join"), (1, "stream window batch")], ["query_id", "text"]
    )
    qvecs = hash_embed_queries(queries, DEFAULT)
    engine = defaultdict(list)
    for r in cosine_topk_sparse(dvecs, qvecs, k=5).orderBy("query_id", "rank").collect():
        engine[r.query_id].append((r.doc_id, round(r.score, 6)))

    # independent numpy computation
    docvecs = {d: _py_embed(analyze_text(t, DEFAULT.analyzer)) for d, t in rows}
    for qid, qtext in [(0, "sort merge join"), (1, "stream window batch")]:
        qv = _py_embed(analyze_text(qtext, DEFAULT.analyzer))
        qn = math.sqrt(sum(v * v for v in qv.values()))
        scores = []
        for d, dv in docvecs.items():
            dot = sum(dv.get(b, 0.0) * v for b, v in qv.items())
            if dot == 0.0:
                continue
            dn = math.sqrt(sum(x * x for x in dv.values()))
            scores.append((d, dot / (dn * qn)))
        scores.sort(key=lambda x: (-round(x[1], 6), x[0]))
        want = [(d, round(s, 6)) for d, s in scores[:5]]
        assert engine[qid] == want, qid


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _queries_from_corpus(embeddings, n=5):
    qs = embeddings.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return qs


def test_brute_cosine_topk_matches_numpy(spark, embeddings):
    mat = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in embeddings.collect()}
    got = defaultdict(list)
    for r in (
        brute_cosine_topk(embeddings, _queries_from_corpus(embeddings), k=10)
        .orderBy("query_id", "rank")
        .collect()
    ):
        got[r.query_id].append((r.vec_id, round(r.score, 6)))
    for qid in range(5):
        qv = mat[qid]
        scores = [
            (vid, float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))))
            for vid, v in mat.items()
            if vid != qid
        ]
        scores.sort(key=lambda x: (-round(x[1], 6), x[0]))
        want = [(d, round(s, 6)) for d, s in scores[:10]]
        assert got[qid] == want, qid


def test_lsh_recall_vs_brute(spark, embeddings):
    queries = _queries_from_corpus(embeddings, n=10)
    brute = defaultdict(set)
    for r in brute_cosine_topk(embeddings, queries, k=10).collect():
        brute[r.query_id].add(r.vec_id)
    lsh = defaultdict(set)
    lsh_res = lsh_cosine_topk(embeddings, queries, k=10, n_planes=6, dim=64)
    for r in lsh_res.collect():
        lsh[r.query_id].add(r.vec_id)
    recalls = [
        len(brute[q] & lsh[q]) / max(1, len(brute[q])) for q in brute
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # LSH scores that ARE returned must equal the exact cosine (no approximation
    # in scoring, only in candidate generation)
    b = {(r.query_id, r.vec_id): round(r.score, 6)
         for r in brute_cosine_topk(embeddings, queries, k=2000).collect()}
    for r in lsh_res.collect():
        assert b[(r.query_id, r.vec_id)] == round(r.score, 6)


def test_embedding_near_dup_pairs(spark, embeddings):
    from splade_spark.dense import embedding_near_dup_pairs, lsh_near_dup_pairs

    exact = {(r.vec_a, r.vec_b): round(r.score, 6)
             for r in embedding_near_dup_pairs(embeddings, threshold=0.4).collect()}
    assert exact and all(a < b for a, b in exact)
    # numpy cross-check of a few pairs
    mat = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in embeddings.collect()}
    for (a, b), s in list(exact.items())[:10]:
        want = float(mat[a] @ mat[b] / (np.linalg.norm(mat[a]) * np.linalg.norm(mat[b])))
        assert round(want, 6) == s and want >= 0.4
    # LSH path: subset of exact (verified scores), reasonable recall
    lsh = {(r.vec_a, r.vec_b): round(r.score, 6)
           for r in lsh_near_dup_pairs(embeddings, threshold=0.4,
                                       n_planes=4, n_tables=8, dim=64).collect()}
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == v
    assert len(lsh) / len(exact) >= 0.5, (len(lsh), len(exact))


def test_ivf_recall_and_exact_scores(spark, embeddings):
    """IVF bucketed ANN: reasonable recall vs brute force at n_probe=4/16,
    exact cosine scores for every returned pair, full recall at
    n_probe=n_cells (probing every cell = exhaustive search)."""
    from splade_spark.dense import brute_cosine_topk, ivf_cosine_topk

    queries = _queries_from_corpus(embeddings, n=10)
    brute = defaultdict(set)
    b_scores = {}
    for r in brute_cosine_topk(embeddings, queries, k=2000).collect():
        b_scores[(r.query_id, r.vec_id)] = round(r.score, 6)
        if r.rank <= 10:
            brute[r.query_id].add(r.vec_id)

    ivf_res = ivf_cosine_topk(embeddings, queries, k=10, n_cells=16, n_probe=4, dim=64)
    got = defaultdict(set)
    for r in ivf_res.collect():
        got[r.query_id].add(r.vec_id)
        assert b_scores[(r.query_id, r.vec_id)] == round(r.score, 6)
    recalls = [len(brute[q] & got[q]) / max(1, len(brute[q])) for q in brute]
    assert sum(recalls) / len(recalls) >= 0.4, recalls

    # probing every cell ≡ brute force (modulo identical rank tie-break)
    full = ivf_cosine_topk(embeddings, queries, k=10, n_cells=16, n_probe=16, dim=64)
    full_hits = {(r.query_id, r.vec_id, r.rank) for r in full.collect()}
    brute_hits = {(r.query_id, r.vec_id, r.rank)
                  for r in brute_cosine_topk(embeddings, queries, k=10).collect()}
    assert full_hits == brute_hits


def test_ivf_assign_deterministic_partitioning(spark, embeddings):
    from splade_spark.dense.ann import ivf_assign

    a = {r.vec_id: r.cell for r in ivf_assign(embeddings, dim=64, n_cells=16).collect()}
    b = {r.vec_id: r.cell for r in ivf_assign(embeddings, dim=64, n_cells=16).collect()}
    assert a == b and len(a) == embeddings.count()
    assert all(0 <= c < 16 for c in a.values())
    assert len(set(a.values())) > 4  # corpus actually spreads over cells


def test_ivf_refine_deterministic_and_balancing(spark, embeddings):
    """Lloyd refinement: identical under re-partitioning (integer-exact
    accumulation), improves the worst-case cell balance, and probing every
    refined cell still equals brute force."""
    from pyspark.sql import functions as F

    from splade_spark.dense.ann import (
        brute_cosine_topk, ivf_assign, ivf_cosine_topk, ivf_refine_centroids,
    )

    c1 = ivf_refine_centroids(embeddings, dim=64, n_cells=16, iters=2)
    c2 = ivf_refine_centroids(embeddings.repartition(17), dim=64, n_cells=16, iters=2)
    assert c1 == c2  # bit-identical centroids under a different partitioning

    def min_cell(cents):
        sizes = [
            r["n"]
            for r in ivf_assign(embeddings, 64, centroids=cents)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        return min(sizes)

    assert min_cell(c1) > min_cell(None)  # refined layout is more balanced

    queries = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    full = ivf_cosine_topk(
        embeddings, queries, k=10, n_cells=16, n_probe=16, dim=64, centroids=c1
    )
    brute = brute_cosine_topk(embeddings, queries, k=10)
    assert {(r.query_id, r.vec_id, r.rank) for r in full.collect()} == {
        (r.query_id, r.vec_id, r.rank) for r in brute.collect()
    }


def test_ivf_refine_nonfinite_vectors_ignored(spark, embeddings):
    """A NaN/Inf embedding must not corrupt a centroid (ADVICE r4: cell -1
    negative indexing): refinement over the corpus + poisoned rows equals
    refinement over the clean corpus."""
    from pyspark.sql import functions as F

    from splade_spark.dense.ann import ivf_refine_centroids

    dim = 64
    poisoned = embeddings.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [
                (90001, [float("nan")] * dim),
                (90002, [float("inf")] + [0.0] * (dim - 1)),
                (90003, [None] + [0.0] * (dim - 1)),
            ],
            "vec_id long, embedding array<double>",
        )
    )
    clean = ivf_refine_centroids(embeddings, dim=dim, n_cells=16, iters=1)
    dirty = ivf_refine_centroids(poisoned, dim=dim, n_cells=16, iters=1)
    assert clean == dirty
