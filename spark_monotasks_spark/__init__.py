"""spark_monotasks_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *query and data-processing capability
surface* of NetSys/spark-monotasks (a Spark 1.3 research fork; see
SURVEY.md).  The execution engine is modern Spark (Catalyst + Tungsten
+ AQE); this package supplies:

- ``session``    — tuned SparkSession factory (reference-parity confs)
- ``api``        — SQLContext-like facade (reference SQLContext.scala:215-917)
- ``tables``     — loaders for the TPC-H-ish test tables (TESTDATA.md)
- ``operators``  — relational operators with reference semantics (SURVEY §2)
- ``functions``  — scalar/agg function surface incl. Hive-builtin name map (§2.8)
- ``sources``    — read/write connectors with SaveMode semantics (§2.1)
- ``streaming``  — DStream-style ops on Structured Streaming (§2.10)
- ``pipeline``   — beyond-reference large-scale training-data ops
                   (dedup, similarity search, text analysis, multimodal)

Everything is declarative DataFrame/SQL so Catalyst keeps predicate
pushdown, column pruning, broadcast selection, and whole-stage codegen.
"""

from spark_monotasks_spark.session import get_spark, stop_spark
from spark_monotasks_spark.tables import TABLE_NAMES, load_tables

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "load_tables", "TABLE_NAMES", "__version__"]
