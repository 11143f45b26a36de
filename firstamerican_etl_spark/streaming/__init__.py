"""Structured Streaming surface (extension beyond the reference).

The reference's "streaming" is Polars' out-of-core batch engine
(fa-etl.py:107 ``collect(streaming=True)``), not event-time streaming
(SURVEY.md §2.9). This package supplies the real thing over the
``events`` stream shape: watermarked tumbling/sliding/session windows,
streaming dedup, and a custom stateful sessionizer via
``applyInPandasWithState`` — each transformation is the SAME logical
plan as its batch twin in plans/eventplans.py, applied to a readStream
DataFrame, so batch/stream parity is testable row-for-row.
"""

from firstamerican_etl_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    run_available_now,
    sliding_counts,
    stream_dedup,
    session_aggregate,
    tumbling_counts,
)
from firstamerican_etl_spark.streaming.stateful import (  # noqa: F401
    sessionize_with_state,
)
