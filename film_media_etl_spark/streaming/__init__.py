from .ingest_dedup import (
    read_documents_stream,
    stream_content_dedup,
    stream_curation_gate,
    stream_near_dup_filter,
)
from .incremental import incremental_fact, read_lineitem_stream, start_incremental_load
from .joins import stream_interval_join
from .sinks import (
    merge_user_totals,
    read_snapshot,
    start_incremental_summary,
    start_upsert_totals,
)
from .sketches import merge_cms, start_cms_stream
from .windows import (
    read_events_stream,
    stream_dedup,
    stream_session_agg,
    stream_holt_forecast,
    stream_stateful_topk,
    stream_stateful_user_totals,
    stream_tumbling_agg,
)

__all__ = [
    "read_events_stream",
    "stream_tumbling_agg",
    "stream_session_agg",
    "stream_dedup",
    "stream_holt_forecast",
    "stream_stateful_topk",
    "stream_stateful_user_totals",
    "read_lineitem_stream",
    "incremental_fact",
    "start_incremental_load",
    "stream_interval_join",
    "merge_user_totals",
    "read_snapshot",
    "start_incremental_summary",
    "start_upsert_totals",
    "read_documents_stream",
    "stream_content_dedup",
    "stream_curation_gate",
    "stream_near_dup_filter",
    "merge_cms",
    "start_cms_stream",
]
