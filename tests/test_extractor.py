"""Extractor invariant (FIXTURES.md §1): extract(wrap(text)) == text byte-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from splade_spark.text.extractor import extract_text_bytes, wrap_html

SF = "/root/testdata/sf0.001"


def test_roundtrip_basic():
    for t in ["hello", "", "multi\n\nparagraph\ntext", "unicode π 中文 ü", "<b>nested</b> markup", "a" * 5000]:
        assert extract_text_bytes(wrap_html(t)) == t


def test_none_and_fallback():
    assert extract_text_bytes(None) == ""
    assert extract_text_bytes(b"<div>plain <span>html</span></div>") == "plain html"


def test_invariant_over_fixture_web_pages(spark):
    """Byte-identical per url over the whole sf0.001 web_pages table (SURVEY §5 test 3)."""
    from splade_spark.sources.web_pages import read_documents, web_pages_from_documents
    from splade_spark.text.udfs import extract_text_udf

    pages = web_pages_from_documents(read_documents(spark, SF))
    mismatches = (
        pages.withColumn("extracted", extract_text_udf()(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0
    assert pages.count() == 500


def test_web_pages_schema(spark):
    from splade_spark.sources.web_pages import read_documents, web_pages_from_documents

    pages = web_pages_from_documents(read_documents(spark, SF))
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert types == {
        "url": "string", "warc_ts": "timestamp", "html": "binary",
        "text": "string", "lang": "string",
    }


def test_web_pages_replicate(spark):
    from splade_spark.sources.web_pages import read_documents, web_pages_from_documents

    docs = read_documents(spark, SF).limit(10)
    pages = web_pages_from_documents(docs, replicate=3)
    assert pages.count() == 30
    assert pages.select("url").distinct().count() == 30
