"""Recursive character text splitter — pure reimplementation.

Matches the observable semantics of langchain's
``RecursiveCharacterTextSplitter(chunk_size=1000, chunk_overlap=100)`` as
instantiated at /root/reference/ingest.py:90-91 (pinned
langchain-text-splitters==0.2.2, /root/reference/requirements.txt:80):

    * recursive split on separators ["\\n\\n", "\\n", " ", ""]
    * char-count length measure
    * greedy merge of splits up to ``chunk_size`` with ``chunk_overlap``
      carried between adjacent chunks
    * chunks are whitespace-stripped; empty chunks dropped

Written from the published algorithm semantics (not copied). This function IS
the frozen chunking spec; golden tests in tests/test_splitter.py.
"""

from __future__ import annotations

_SEPARATORS = ("\n\n", "\n", " ", "")


def _join(parts, sep: str) -> str | None:
    text = sep.join(parts).strip()
    return text if text else None


def _merge_splits(splits: list[str], sep: str, chunk_size: int, chunk_overlap: int) -> list[str]:
    # deque: the overlap slide pops from the FRONT once per consumed part —
    # list.pop(0) would make merging O(parts²) per chunk (measured ~0.5 ms
    # per 8 KB page, the largest Python cost in the build hot path)
    from collections import deque

    docs: list[str] = []
    current: deque[str] = deque()
    total = 0
    sep_len = len(sep)
    for part in splits:
        plen = len(part)
        if total + plen + (sep_len if current else 0) > chunk_size:
            if current:
                doc = _join(current, sep)
                if doc is not None:
                    docs.append(doc)
                # slide window: keep a tail within chunk_overlap
                while total > chunk_overlap or (
                    total + plen + (sep_len if current else 0) > chunk_size and total > 0
                ):
                    total -= len(current[0]) + (sep_len if len(current) > 1 else 0)
                    current.popleft()
        current.append(part)
        total += plen + (sep_len if len(current) > 1 else 0)
    doc = _join(current, sep)
    if doc is not None:
        docs.append(doc)
    return docs


def _split_recursive(text: str, separators: tuple[str, ...], chunk_size: int, chunk_overlap: int) -> list[str]:
    # pick the first separator present in text (last resort: "")
    sep = separators[-1]
    rest: tuple[str, ...] = ()
    for i, s in enumerate(separators):
        if s == "":
            sep = ""
            break
        if s in text:
            sep = s
            rest = separators[i + 1 :]
            break

    splits = list(text) if sep == "" else [s for s in text.split(sep) if s != ""]

    final: list[str] = []
    good: list[str] = []
    for s in splits:
        if len(s) < chunk_size:
            good.append(s)
        else:
            if good:
                final.extend(_merge_splits(good, sep, chunk_size, chunk_overlap))
                good = []
            if not rest:
                final.append(s)
            else:
                final.extend(_split_recursive(s, rest, chunk_size, chunk_overlap))
    if good:
        final.extend(_merge_splits(good, sep, chunk_size, chunk_overlap))
    return final


def split_text(text: str | None, chunk_size: int = 1000, chunk_overlap: int = 100) -> list[str]:
    """Split ``text`` into chunks ≤ chunk_size chars with chunk_overlap carry."""
    if not text:
        return []
    return _split_recursive(text, _SEPARATORS, chunk_size, chunk_overlap)
