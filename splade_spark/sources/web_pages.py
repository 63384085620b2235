"""web_pages input table — deterministic derivation from documents.parquet.

Schema per BASELINE.json input_hint:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Generation rules are FIXTURES.md §1 (seedless — a pure function of the driver
fixture), replacing the reference's irreproducible LLM corpus generator
(/root/reference/generate_documents.py:31-69, SURVEY.md §1.4):

    url     = f"https://{source}.example.com/doc/{doc_id}"
    warc_ts = 2024-10-22T00:00:00Z + doc_id seconds
    html    = wrap_html(text)  (extractor-invertible)
    text    = documents.text verbatim
    lang    = documents.lang

``replicate`` > 1 deterministically scales the corpus for bench runs: copy k
gets url suffix ``?copy={k}`` and shifted warc_ts — distinct pages, identical
text distribution (no external data; TESTDATA.md fixtures only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BinaryType

import pandas as pd

_EPOCH = "2024-10-22 00:00:00"


def expand_query_text(text: str, paragraph: int = 0) -> str:
    """Suffix a query's words to match an expand_text corpus's vocabulary."""
    import re

    return re.sub(r"([a-z0-9]+)", rf"\1v{paragraph}", text)


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _wrap_udf():
    from splade_spark.text.extractor import wrap_html

    @F.pandas_udf(BinaryType())
    def _wrap(text: pd.Series) -> pd.Series:
        return text.map(lambda t: wrap_html(t if t is not None else ""))

    return _wrap


def web_pages_from_documents(
    docs: DataFrame, replicate: int = 1, expand_text: int = 1,
    vocab_hash_buckets: int = 0,
) -> DataFrame:
    """documents(doc_id,text,lang,source,n_chars) → web_pages(url,warc_ts,html,text,lang).

    ``expand_text`` > 1 turns each text into k "\\n\\n"-joined paragraphs where
    paragraph i's words carry the deterministic suffix ``v{i}`` — fixture
    scaling toward realistic Common-Crawl pages (KB-sized, multi-chunk, a
    vocabulary hundreds of terms wide with a zipfian head) without external
    data; the driver corpus stays the only source. Query texts must be
    suffixed the same way to hit the expanded vocabulary (see
    expand_query_text).

    ``vocab_hash_buckets`` > 0 additionally salts every word with a
    deterministic per-(word, url) hash tail (``wordh<k>``), k ∈ [0, buckets):
    the vocabulary then GROWS with corpus size (Heaps-law-like, toward
    base_vocab × buckets) while keeping the zipfian head shape — the
    high-cardinality fixture VERDICT r2 #4 asked for, because a tiny frozen
    vocabulary flatters per-distinct-term work (stem map, dictionary) that
    real web text pays in full. Salted copies differ textually, so the html
    wrap runs per copy here.
    """
    if expand_text > 1:
        paras = F.transform(
            F.sequence(F.lit(0), F.lit(expand_text - 1)),
            lambda i: F.regexp_replace(
                F.col("text"), F.lit("([a-z0-9]+)"), F.concat(F.lit("$1v"), i.cast("string"))
            ),
        )
        docs = docs.withColumn("text", F.concat_ws("\n\n", paras))
    base = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit(_EPOCH)) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        _wrap_udf()(F.col("text")).alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    if replicate > 1:
        copies = base.sparkSession.range(replicate).withColumnRenamed("id", "copy")
        base = base.crossJoin(copies).select(
            F.concat(F.col("url"), F.lit("?copy="), F.col("copy")).alias("url"),
            (F.col("warc_ts") + F.make_interval(hours=F.col("copy").cast("double"))).alias("warc_ts"),
            "html",
            "text",
            "lang",
        )
    if vocab_hash_buckets > 0:
        salted_words = F.transform(
            F.split(F.col("text"), r"\s+"),
            # tail rides INSIDE each alnum run ('fast,' → 'fasth7,') so the
            # analyzer sees one salted token, not word + a shared 'h7' token
            lambda w: F.regexp_replace(
                w,
                F.lit("([a-z0-9]+)"),
                F.concat(
                    F.lit("$1h"),
                    F.pmod(
                        F.xxhash64(F.lower(w), F.col("url")),
                        F.lit(vocab_hash_buckets),
                    ).cast("string"),
                ),
            ),
        )
        base = base.withColumn("text", F.concat_ws(" ", salted_words)).withColumn(
            "html", _wrap_udf()(F.col("text"))
        )
    return base
