from .windows import (
    run_stream_to_memory,
    sessionize_batch,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)

__all__ = [
    "run_stream_to_memory",
    "sessionize_batch",
    "session_window_agg",
    "sliding_window_agg",
    "streaming_dedup",
    "tumbling_window_agg",
]
