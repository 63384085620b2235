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
