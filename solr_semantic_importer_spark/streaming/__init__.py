from .incremental import append_batch, stream_build, windowed_event_counts  # noqa: F401
