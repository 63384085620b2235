from splade_spark.oracle.pandas_oracle import PandasOracle  # noqa: F401
