"""XXH64 correctness: published test vectors + cross-check against Spark's
built-in xxhash64 (which is XXH64(seed=42) over utf-8 bytes for a single
string column) — proving the vendored implementation matches the real spec."""

from __future__ import annotations

from splade_spark.text.hashing import chunk_doc_id, to_signed64, xxh64


def test_xxh64_empty():
    # published XXH64 test vector
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999


def test_xxh64_sizes_deterministic():
    data = bytes(range(256)) * 5
    for n in (0, 1, 3, 4, 7, 8, 15, 16, 31, 32, 33, 63, 64, 100, 1280):
        h1 = xxh64(data[:n], 42)
        h2 = xxh64(data[:n], 42)
        assert h1 == h2
        assert 0 <= h1 < (1 << 64)
    # different inputs differ
    assert xxh64(b"a", 0) != xxh64(b"b", 0)
    assert xxh64(b"a", 0) != xxh64(b"a", 1)


def test_xxh64_matches_spark(spark):
    strings = ["", "a", "hello world", "x" * 100, "ünïcode π", "spark graft"]
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {r["s"]: r["h"] for r in df.selectExpr("s", "xxhash64(s) as h").collect()}
    for s in strings:
        assert got[s] == to_signed64(xxh64(s.encode("utf-8"), seed=42)), s


def test_chunk_doc_id_stable():
    a = chunk_doc_id("https://x/doc/1", 0)
    assert a == chunk_doc_id("https://x/doc/1", 0)
    assert a != chunk_doc_id("https://x/doc/1", 1)
    assert a != chunk_doc_id("https://x/doc/2", 0)
    assert -(1 << 63) <= a < (1 << 63)
