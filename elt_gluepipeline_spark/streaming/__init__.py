"""Incremental & streaming ingest (SURVEY.md §2.8 T1-T6): batch
high-watermark pipeline and its Structured Streaming re-expression."""
