from splade_spark.streaming.dedup import stream_canonicalize, stream_exact_dedup
from splade_spark.streaming.incremental import refit_compact, stream_build_segments
from splade_spark.streaming.windows import sessionize_events, windowed_event_counts

__all__ = [
    "refit_compact",
    "stream_build_segments",
    "stream_canonicalize",
    "stream_exact_dedup",
    "sessionize_events",
    "windowed_event_counts",
]
