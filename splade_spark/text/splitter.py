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


def _merge_splits_ref(splits: list[str], sep: str, chunk_size: int, chunk_overlap: int) -> list[str]:
    """Reference implementation of the greedy merge — the executable spec.

    Kept verbatim for the randomized equivalence test against the fast
    window-arithmetic version below (tests/test_splitter.py)."""
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


def _merge_splits(splits: list[str], sep: str, chunk_size: int, chunk_overlap: int) -> list[str]:
    """Greedy merge, window-arithmetic formulation — O(parts + chunks·log).

    Semantics identical to ``_merge_splits_ref`` (randomized + golden
    tested); the per-part interpreter loop there was the largest Python cost
    in the chunking hot path. With prefix sums P and A[i] = P[i] + sep_len·i,
    the window [i, k) total is (P[k] + s·(k−1)) − A[i], so each overflow
    event emits one chunk and advances i with two bisects instead of a
    pop-per-part slide.
    """
    from bisect import bisect_left, bisect_right
    from itertools import accumulate

    n = len(splits)
    if n == 0:
        return []
    s = len(sep)
    # A[j] = Σ len(splits[:j]) + s·j, strictly increasing (parts non-empty):
    # window total tot(i, k) = A[k] − A[i] − s for k > i. Overflow on arrival
    # k ⟺ tot(i, k+1) > chunk_size ⟺ A[k+1] > chunk_size + s + A[i], so the
    # scan JUMPS from overflow event to overflow event with bisects — no
    # per-part Python loop (events ≈ chunks ≪ parts).
    A = [0] + list(accumulate(ln + s for ln in map(len, splits)))
    docs: list[str] = []
    i = 0
    pos = 1
    while True:
        j = bisect_right(A, chunk_size + s + A[i], pos)
        if j > n:
            break
        k = j - 1
        if k > i:  # ref semantics: an empty window never emits or slides
            doc = sep.join(splits[i:k]).strip()
            if doc:
                docs.append(doc)
            # slide: first i' with tot(i',k) ≤ overlap AND
            # tot(i',k) + len_k + s ≤ chunk_size (tot monotonically ↓ in i')
            base = A[k] - s
            lk = A[k + 1] - A[k] - s
            t1 = base - chunk_overlap
            t2 = base - (chunk_size - lk - s)
            i = min(max(bisect_left(A, t1, i, k), bisect_left(A, t2, i, k)), k)
        pos = j + 1
    doc = sep.join(splits[i:n]).strip()
    if doc:
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

    # common case (C-speed check): every part already fits → merge directly,
    # skipping the per-part classification loop
    if not splits or max(map(len, splits)) < chunk_size:
        return _merge_splits(splits, sep, chunk_size, chunk_overlap)

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
