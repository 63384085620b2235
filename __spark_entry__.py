"""Driver contract for the spark-graft builder (PySpark target).

Engine entries run splade_spark in ``NOSTEM`` analyzer mode (tokenize +
stopword filter — exactly SQL-expressible; the sandboxed DuckDB cannot load a
stemmer extension) over ``documents.parquet`` with each row as one retrieval
unit (every fixture doc is < chunk_size, so chunking is identity — the full
extract→chunk pipeline and the Porter2 path are covered by pytest goldens and
rows-only entries instead).

Float outputs are shipped as ``*_e6`` BIGINT columns (round(x*1e6)) so the
driver's order-insensitive value-hash is immune to float formatting noise.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

_FRAMES_CACHE: dict = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _frames(spark: SparkSession, sf_dir: str):
    """Build (and cache) the nostem index over documents.parquet."""
    key = (id(spark), sf_dir)
    if key not in _FRAMES_CACHE:
        from splade_spark.build.indexer import build_index_from_docs
        from splade_spark.config import NOSTEM

        frames = build_index_from_docs(_docs(spark, sf_dir).select("doc_id", "text"), NOSTEM)
        frames.dictionary.cache().count()
        frames.postings.cache().count()
        _FRAMES_CACHE[key] = frames
    return _FRAMES_CACHE[key]


def _e6(col: str):
    return F.round(F.col(col) * 1e6).cast("long").alias(f"{col}_e6")


# ---------------------------------------------------------------------------
# entry: flagship — full pipeline (web_pages → extract → chunk → index → top-k)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-5 for the frozen
    query set over the full web_pages pipeline (stemmed analyzer)."""
    from splade_spark.build.indexer import build_index_frames
    from splade_spark.config import DEFAULT
    from splade_spark.fixtures import queries_df
    from splade_spark.query.naive import topk_naive
    from splade_spark.sources.web_pages import read_documents, web_pages_from_documents

    pages = web_pages_from_documents(read_documents(spark, "/root/testdata/sf0.001"))
    frames = build_index_frames(pages, DEFAULT, use_html=True)
    out = topk_naive(queries_df(spark), frames.postings, frames.dictionary, k=5, cfg=DEFAULT)
    return out.select(
        F.col("query_id").cast("long"),
        "doc_id",
        F.col("rank").cast("long").alias("rank"),
        _e6("score"),
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# queries(): engine results at (spark, sf_dir)
# ---------------------------------------------------------------------------

def _q_corpus_stats(spark, sf_dir):
    frames = _frames(spark, sf_dir)
    return frames.corpus_stats.select(F.col("n_docs").cast("long"), _e6("avgdl"))


def _q_dictionary(spark, sf_dir):
    frames = _frames(spark, sf_dir)
    return frames.dictionary.select(
        "term", F.col("term_id").cast("long"), F.col("df").cast("long"), _e6("idf")
    )


def _q_term_freqs(spark, sf_dir):
    from splade_spark.build.postings import term_freqs

    frames = _frames(spark, sf_dir)
    return term_freqs(frames.docs).select(
        "doc_id", "term", F.col("tf").cast("long"), F.col("doclen").cast("long")
    )


def _q_doc_impacts(spark, sf_dir):
    frames = _frames(spark, sf_dir)
    return frames.postings.join(
        frames.dictionary.select("term", "term_id"), "term_id"
    ).select("doc_id", "term", _e6("impact"))


def _q_query_encode(spark, sf_dir):
    from splade_spark.config import NOSTEM
    from splade_spark.fixtures import queries_df
    from splade_spark.query.encode import encode_queries

    frames = _frames(spark, sf_dir)
    enc = encode_queries(queries_df(spark), frames.dictionary, NOSTEM)
    return enc.select(F.col("query_id").cast("long"), F.col("term_id").cast("long"), _e6("qweight"))


def _topk(spark, sf_dir, k):
    from splade_spark.config import NOSTEM
    from splade_spark.fixtures import queries_df
    from splade_spark.query.naive import topk_naive

    frames = _frames(spark, sf_dir)
    out = topk_naive(queries_df(spark), frames.postings, frames.dictionary, k=k, cfg=NOSTEM)
    return out.select(
        F.col("query_id").cast("long"), "doc_id", F.col("rank").cast("long").alias("rank"), _e6("score")
    )


def _q_bm25_topk_k5(spark, sf_dir):
    return _topk(spark, sf_dir, 5)


def _q_bm25_topk_k3(spark, sf_dir):
    return _topk(spark, sf_dir, 3)


def _q_filtered_scan(spark, sf_dir):
    # P1: the reference's corpus rebuild scan — predicate + projection
    # (collection.query(expr="pk != ''", output_fields=["text"]), main.py:46-53)
    return (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id").isNotNull() & (F.col("n_chars") > 100))
        .select("doc_id", "text")
    )


def _q_catalog_count(spark, sf_dir):
    # A5: num_entities (check_milvus.py:25)
    return _docs(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "corpus_stats": _q_corpus_stats,
        "dictionary": _q_dictionary,
        "term_freqs": _q_term_freqs,
        "doc_impacts": _q_doc_impacts,
        "query_encode": _q_query_encode,
        "bm25_topk_k5": _q_bm25_topk_k5,
        "bm25_topk_k3": _q_bm25_topk_k3,
        "filtered_scan": _q_filtered_scan,
        "catalog_count": _q_catalog_count,
    }


# ---------------------------------------------------------------------------
# oracle_sql(): DuckDB equivalents over the same parquet views
# ---------------------------------------------------------------------------

def _stoplist_sql() -> str:
    from splade_spark.text.stopwords_en import STOPWORDS_EN

    # tokens match [a-z0-9]+ so apostrophe-bearing stopwords are unreachable
    return ", ".join(f"'{w}'" for w in sorted(STOPWORDS_EN) if "'" not in w)


def _queries_values_sql() -> str:
    from splade_spark.fixtures import FROZEN_QUERIES

    rows = ", ".join(
        "({0}, '{1}')".format(q, t.replace("'", "''")) for q, t in FROZEN_QUERIES
    )
    return f"(VALUES {rows})"


def _base_ctes() -> str:
    """Shared CTE pipeline: tokenize → doclen/stats → tf → dictionary → impacts."""
    stop = _stoplist_sql()
    return f"""
toks_raw AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
toks AS (
  SELECT doc_id, term FROM toks_raw WHERE term NOT IN ({stop})
),
doclen AS (
  SELECT d.doc_id, (SELECT count(*) FROM toks t WHERE t.doc_id = d.doc_id) AS doclen
  FROM documents d
),
stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(doclen) AS avgdl FROM doclen
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
idf0 AS (
  SELECT term, df, ln((s.n_docs - df + 0.5) / (df + 0.5)) AS raw_idf FROM dft, stats s
),
idfa AS (
  SELECT avg(raw_idf) AS avg_raw FROM idf0
),
dict AS (
  SELECT term, df,
         CASE WHEN raw_idf < 0 THEN 0.25 * a.avg_raw ELSE raw_idf END AS idf,
         (row_number() OVER (ORDER BY df DESC, term ASC) - 1)::BIGINT AS term_id
  FROM idf0, idfa a
),
impacts AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * 2.5 / (tf.tf + 1.5 * (0.25 + 0.75 * dl.doclen / s.avgdl)) AS impact
  FROM tf JOIN doclen dl USING (doc_id), stats s
)"""


def _query_ctes() -> str:
    stop = _stoplist_sql()
    return f""",
queries AS (
  SELECT * FROM {_queries_values_sql()} AS q(query_id, text)
),
qtoks AS (
  SELECT query_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM queries
),
qtf AS (
  SELECT query_id, term, count(*) AS qtf FROM qtoks
  WHERE term NOT IN ({stop}) GROUP BY query_id, term
),
qenc AS (
  SELECT query_id, d.term, d.term_id, qtf * d.idf AS qweight
  FROM qtf JOIN dict d USING (term)
),
scores AS (
  SELECT query_id, i.doc_id, sum(qweight * impact) AS score
  FROM qenc q JOIN impacts i USING (term)
  GROUP BY query_id, i.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scores
)"""


def _topk_sql(k: int) -> str:
    return f"""WITH {_base_ctes()}{_query_ctes()}
SELECT query_id::BIGINT AS query_id, doc_id, rank::BIGINT AS rank,
       CAST(round(score * 1e6) AS BIGINT) AS score_e6
FROM ranked WHERE rank <= {k}"""


def oracle_sql() -> dict[str, str]:
    base = _base_ctes()
    return {
        "corpus_stats": f"""WITH {base}
SELECT n_docs, CAST(round(avgdl * 1e6) AS BIGINT) AS avgdl_e6 FROM stats""",
        "dictionary": f"""WITH {base}
SELECT term, term_id, df, CAST(round(idf * 1e6) AS BIGINT) AS idf_e6 FROM dict""",
        "term_freqs": f"""WITH {base}
SELECT tf.doc_id, tf.term, tf.tf, dl.doclen::BIGINT AS doclen
FROM tf JOIN doclen dl USING (doc_id)""",
        "doc_impacts": f"""WITH {base}
SELECT doc_id, term, CAST(round(impact * 1e6) AS BIGINT) AS impact_e6 FROM impacts""",
        "query_encode": f"""WITH {base}{_query_ctes()}
SELECT query_id::BIGINT AS query_id, term_id,
       CAST(round(qweight * 1e6) AS BIGINT) AS qweight_e6 FROM qenc""",
        "bm25_topk_k5": _topk_sql(5),
        "bm25_topk_k3": _topk_sql(3),
        "filtered_scan": (
            "SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL AND n_chars > 100"
        ),
        "catalog_count": "SELECT count(*)::BIGINT AS n FROM documents",
    }
