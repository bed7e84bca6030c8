"""Metadata column names appended during compilation (reference
processors/constants.py:16-18)."""

EVENT_TIME_COL = "__event_time__"        # TimestampType event time
WINDOW_TIME_MS_COL = "__window_time_ms__"  # bigint: sliding window end - 1ms

METADATA_COLS = (EVENT_TIME_COL, WINDOW_TIME_MS_COL)
