"""sync_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
reference CDC/replication engine (``retail-ai-inc/sync``) Spark-first:

- batch operators (scan/filter/project/aggregate/sort/union/join) as
  declarative DataFrame plans optimized by Catalyst,
- the countQuery condition DSL compiled to Column expressions,
- field security (masking / AES-GCM encryption) incl. nested paths,
- CDC apply semantics (latest-per-key compaction + MERGE-style upsert)
  on Structured Streaming with checkpoint-based resume,
- backup/export planning (regex table expansion, date-suffix grouping,
  partition pruning, JSONL/CSV artifacts),
- monitoring analytics (row-count time series, JST daily windows),
- large-scale training-data extensions: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search,
  text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"

from sync_spark.session import get_spark  # noqa: F401
