"""Beyond-reference operators for large-scale training-data pipelines.

These are first-class additions on top of the reference's surface
(BASELINE.json north-star): deduplication, similarity search, text
analysis, and multimodal-column plumbing — each designed for the 100 TB
tier (linear passes, bounded shuffles, LSH instead of all-pairs).
"""

from spark_monotasks_spark.pipeline import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    sketches,
    text,
)
