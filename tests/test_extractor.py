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


class TestContentDispatch:
    """S2/S3 content-type dispatch (reference ingest.py:71-79: .txt identity
    read, .pdf via pdfminer; unsupported types skip)."""

    def test_detect(self):
        from splade_spark.text.extractor import detect_payload_type, wrap_html

        assert detect_payload_type(b"%PDF-1.7 ...") == "pdf"
        assert detect_payload_type(b"anything", url="https://x/a.PDF") == "pdf"
        assert detect_payload_type(wrap_html("hi")) == "html"
        assert detect_payload_type(b"<!DOCTYPE html><p>x</p>") == "html"
        assert detect_payload_type(b"plain prose, no markup") == "text"
        assert detect_payload_type(b"") == "empty"
        assert detect_payload_type(None) == "empty"

    def test_html_path_is_frozen_extractor(self):
        from splade_spark.text.extractor import extract_any, wrap_html

        text = "The quick brown fox; 42 tokens & <escapes>"
        assert extract_any(wrap_html(text)) == text  # byte-identical invariant

    def test_text_identity(self):
        from splade_spark.text.extractor import extract_any

        assert extract_any(b"plain prose, no markup") == "plain prose, no markup"
        assert extract_any(None) == ""

    def test_pdf_gate_without_pdfminer(self):
        import pytest

        from splade_spark.text.extractor import extract_any

        with pytest.raises(RuntimeError, match="pdfminer"):
            extract_any(b"%PDF-1.4 fake body")

    def test_pdf_branch_calls_pdfminer_when_present(self, monkeypatch):
        """Inject a fake pdfminer to prove the dispatch wiring is real."""
        import sys
        import types

        fake_hl = types.ModuleType("pdfminer.high_level")

        def extract_text(fh):
            return "PDF TEXT " + str(len(fh.read()))

        fake_hl.extract_text = extract_text
        fake_pkg = types.ModuleType("pdfminer")
        fake_pkg.high_level = fake_hl
        monkeypatch.setitem(sys.modules, "pdfminer", fake_pkg)
        monkeypatch.setitem(sys.modules, "pdfminer.high_level", fake_hl)

        from splade_spark.text.extractor import extract_any

        payload = b"%PDF-1.4 body bytes"
        assert extract_any(payload) == f"PDF TEXT {len(payload)}"


def test_plain_text_with_angle_brackets_stays_text():
    """ADVICE r2: 'a < b and c > d' must take the utf-8 identity path, not
    lose the bracketed span to the tag-strip fallback."""
    from splade_spark.text.extractor import detect_payload_type, extract_any

    payload = "for a < b and c > d the loop runs".encode()
    assert detect_payload_type(payload) == "text"
    assert extract_any(payload) == "for a < b and c > d the loop runs"
    # a real tag still routes to html
    assert detect_payload_type(b"plain <b>bold</b> fragment") == "html"
    assert extract_any(b"plain <b>bold</b> fragment") == "plain bold fragment"
    # closing-tag-only fragments too
    assert detect_payload_type(b"</div> trailing") == "html"
