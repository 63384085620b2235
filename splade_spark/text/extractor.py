"""HTML → text extraction (vectorized).

Generalizes the reference's source-text extraction (identity read of ``.txt``
at /root/reference/ingest.py:71-74; pdfminer PDF path at ingest.py:75-79) to
the ``html:binary`` column of the ``web_pages`` input table
(BASELINE.json input_hint).

Invariant (tested): ``extract_text_bytes(wrap_html(text)) == text``
byte-identical per url — FIXTURES.md §1. The wrap format is
``<html><head><title>…</title></head><body><p>TEXT</p></body></html>``;
the extractor pulls the body ``<p>`` payload verbatim (no normalization),
falling back to a generic tag-strip for non-conforming html.
"""

from __future__ import annotations

import re

_BODY_OPEN = b"<body><p>"
_BODY_CLOSE = b"</p></body>"
_TAG_RE = re.compile(r"<[^>]*>")


def wrap_html(text: str, title: str = "") -> bytes:
    """Deterministic inverse of the extractor (fixture generation)."""
    return (
        b"<html><head><title>" + title.encode("utf-8") + b"</title></head><body><p>"
        + text.encode("utf-8")
        + b"</p></body></html>"
    )


def extract_text_bytes(html: bytes | None) -> str:
    """Extract text payload from an html byte blob. Pure, deterministic."""
    if html is None:
        return ""
    start = html.find(_BODY_OPEN)
    if start != -1:
        end = html.rfind(_BODY_CLOSE)
        if end != -1 and end >= start + len(_BODY_OPEN):
            return html[start + len(_BODY_OPEN) : end].decode("utf-8", errors="replace")
    # fallback: generic tag strip (best effort for arbitrary html)
    return _TAG_RE.sub("", html.decode("utf-8", errors="replace"))


# ---------------------------------------------------------------------------
# content-type dispatch (S2/S3 — reference ingest.py:71-79 reads .txt
# identity and extracts .pdf via pdfminer; the web_pages payload column
# carries the raw bytes, so dispatch sniffs the payload)
# ---------------------------------------------------------------------------

_PDF_MAGIC = b"%PDF-"
# a REAL tag open: '<' immediately followed by a letter, '!' or '/', with a
# closing '>' somewhere after — bare comparison operators ('a < b and c > d')
# must NOT route plain text onto the tag-strip path (ADVICE r2)
_TAG_LIKE_RE = re.compile(rb"<[a-zA-Z!/][^>]*>")


def detect_payload_type(payload: bytes | None, url: str | None = None) -> str:
    """'pdf' | 'html' | 'text' | 'empty' — deterministic sniff.

    PDF by magic bytes (or .pdf url extension); html when markup is visible
    in the head of the payload or the url says so; plain text otherwise —
    mirroring the reference's extension dispatch (ingest.py:71-79) without
    requiring a content_type column.
    """
    if not payload:
        return "empty"
    if payload[:5] == _PDF_MAGIC or (url or "").lower().endswith(".pdf"):
        return "pdf"
    head = payload[:256].lower()
    if b"<html" in head or b"<!doctype html" in head or (url or "").lower().endswith(
        (".html", ".htm")
    ):
        return "html"
    if _TAG_LIKE_RE.search(head):
        return "html"  # tag-bearing fragment → tag-strip fallback path
    return "text"


def extract_pdf_bytes(payload: bytes) -> str:
    """PDF → text via pdfminer (reference ingest.py:75-79).

    Codec-gated exactly like curation/multimodal.decode_image: pdfminer is
    not installed in this sandbox, so the branch fails fast with a clear
    error instead of silently degrading; when pdfminer.high_level is
    importable the extraction runs for real.
    """
    try:
        from io import BytesIO

        from pdfminer.high_level import extract_text  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - env without pdfminer
        raise RuntimeError(
            "PDF extraction requires pdfminer.six (reference parity: "
            "/root/reference/ingest.py:75-79); install it or route PDFs "
            "around the extractor"
        ) from exc
    return extract_text(BytesIO(payload))


def extract_any(payload: bytes | None, url: str | None = None) -> str:
    """Content-type-dispatched extraction: html → extract_text_bytes (the
    frozen byte-identical path), pdf → pdfminer-gated branch, text →
    utf-8 decode identity (the reference's .txt read), empty → ''."""
    kind = detect_payload_type(payload, url)
    if kind == "empty":
        return ""
    if kind == "pdf":
        return extract_pdf_bytes(payload)
    if kind == "html":
        return extract_text_bytes(payload)
    return payload.decode("utf-8", errors="replace")
