from splade_spark.streaming.incremental import stream_build_segments

__all__ = ["stream_build_segments"]
