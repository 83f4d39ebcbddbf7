"""Structured Streaming layer: CDC sync pipeline (snapshot + tail),
foreachBatch MERGE, dead-letter queue."""
