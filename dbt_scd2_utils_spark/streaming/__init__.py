"""Structured Streaming surface: foreachBatch SCD sinks."""
