from .incremental import alert_stream, incremental_index_stream  # noqa: F401
