from splade_spark.query.encode import encode_queries  # noqa: F401
from splade_spark.query.naive import score_naive, topk_naive  # noqa: F401
