from splade_spark.streaming.incremental import refit_compact, stream_build_segments

__all__ = ["refit_compact", "stream_build_segments"]
