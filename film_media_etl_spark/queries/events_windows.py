"""Batch-mode windowed aggregations over the events table (SURVEY §2.J).
Populated in the streaming milestone."""
