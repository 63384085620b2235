from splade_spark.sources.web_pages import web_pages_from_documents, read_documents  # noqa: F401
