"""Batch operator layer: relational queries, the countQuery DSL,
merge/CDC-apply, dedup, similarity, text analysis, monitoring."""
