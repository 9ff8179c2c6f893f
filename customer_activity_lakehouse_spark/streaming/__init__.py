from .streams import (
    anomaly_stream,
    enrich_stream_with_dim,
    hourly_event_counts,
    purchases_with_recent_clicks,
    read_events_stream,
    read_rate_events_stream,
    sessionize_stream,
    sliding_event_rates,
    stream_dedup_events,
    write_stream_foreach_batch,
    write_stream_merge_upsert,
    write_stream_parquet,
)

__all__ = [
    "anomaly_stream",
    "enrich_stream_with_dim",
    "hourly_event_counts",
    "purchases_with_recent_clicks",
    "read_events_stream",
    "read_rate_events_stream",
    "sessionize_stream",
    "sliding_event_rates",
    "stream_dedup_events",
    "write_stream_foreach_batch",
    "write_stream_merge_upsert",
    "write_stream_parquet",
]
