"""Iceberg catalog gate (sources/iceberg.py): fallback layout in this
jar-less sandbox, real writeTo path skip-gated on the runtime jar."""

from __future__ import annotations

import os

import pytest

from splade_spark.sources.iceberg import (
    CATALOG_CONF, configured_catalog, iceberg_available, read_engine_table,
    use_iceberg, write_engine_table,
)


def test_gate_closed_falls_back_to_parquet_layout(spark, tmp_path):
    """No jar + no conf → both gates closed; writes land at the native
    ``index_dir/<name>`` parquet layout and read back identically."""
    assert configured_catalog(spark) is None
    assert use_iceberg(spark) is False
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["term_id", "term"])
    where = write_engine_table(df, "dictionary", str(tmp_path))
    assert where == os.path.join(str(tmp_path), "dictionary")
    assert os.path.exists(os.path.join(where, "_SUCCESS"))
    back = read_engine_table(spark, "dictionary", str(tmp_path))
    assert {(r.term_id, r.term) for r in back.collect()} == {(1, "a"), (2, "b")}
    # partitioned fallback keeps the partition-dir layout the engine reads
    pdf = spark.createDataFrame(
        [(0, 1, b"x"), (1, 2, b"y")], ["segment_id", "term_id", "docs_bin"]
    )
    where = write_engine_table(pdf, "blocks", str(tmp_path), partition_by=["segment_id"])
    assert os.path.isdir(os.path.join(where, "segment_id=0"))
    assert read_engine_table(spark, "blocks", str(tmp_path)).count() == 2


def test_conf_without_jar_stays_on_fallback(spark, tmp_path):
    """A configured catalog name does NOT open the gate without the runtime
    jar — half-configured sessions must not crash mid-build."""
    spark.conf.set(CATALOG_CONF, "local")
    try:
        assert configured_catalog(spark) == "local"
        if iceberg_available(spark):
            pytest.skip("Iceberg runtime present — gate would open for real")
        assert use_iceberg(spark) is False
        df = spark.createDataFrame([(1,)], ["n_docs"])
        where = write_engine_table(df, "corpus_stats", str(tmp_path))
        assert where.startswith(str(tmp_path))
    finally:
        spark.conf.unset(CATALOG_CONF)


def test_writeto_roundtrip_with_runtime(spark, tmp_path):
    """Real catalog path: runs only where the Iceberg runtime jar exists
    (skipped in this jar-less sandbox — the gate itself is what's under test
    above; this covers the open-gate branch wherever the jar is present)."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg Spark runtime jar not on the classpath")
    spark.conf.set("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse", str(tmp_path / "wh"))
    spark.conf.set(CATALOG_CONF, "local")
    try:
        df = spark.createDataFrame([(1, "a")], ["term_id", "term"])
        ident = write_engine_table(df, "dictionary", str(tmp_path))
        assert ident == "local.splade.dictionary"
        assert read_engine_table(spark, "dictionary", str(tmp_path)).count() == 1
    finally:
        spark.conf.unset(CATALOG_CONF)
