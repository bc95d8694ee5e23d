from .ingest import (
    refresh_derived_tables,
    stream_ingest_weather,
    streaming_hourly_aggregate,
)

__all__ = [
    "stream_ingest_weather",
    "refresh_derived_tables",
    "streaming_hourly_aggregate",
]
