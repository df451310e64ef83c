"""Structured Streaming operators (SURVEY §2B 'Streaming').

Each s_* qid replays the events table through a file source (ordered
parquet chunks, maxFilesPerTrigger=1, availableNow trigger) and must
produce the same result as its H-checked batch twin — the B oracle of
SURVEY §5.2.
"""
