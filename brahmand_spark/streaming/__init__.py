from .dedup_stream import dedup_against_stream, dedup_stream
from .joins import funnel_join
from .vector import ann_ingest_stream, ann_search_stream
from .stateful import running_user_stats, running_user_stats_batch
from .windows import (
    read_event_stream, sessionize, sliding_counts, streaming_dedup,
    streaming_url_dedup,
    tumbling_agg, windowed_cms_table, windowed_hll_registers,
)

__all__ = [
    "read_event_stream", "tumbling_agg", "sliding_counts", "sessionize",
    "streaming_dedup", "streaming_url_dedup", "running_user_stats", "running_user_stats_batch",
    "dedup_stream", "dedup_against_stream", "windowed_hll_registers",
    "windowed_cms_table", "funnel_join", "ann_search_stream", "ann_ingest_stream",
]
