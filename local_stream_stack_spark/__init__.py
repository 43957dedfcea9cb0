"""local_stream_stack_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the public reference
``tnpxu/local-stream-stack`` (a config-driven orchestration layer over
Spark Structured Streaming: YAML pipeline -> Kafka source -> processor
chain -> Kafka sink), re-expressed Spark-first and extended with a real
operator library:

- batch relational core (scan/filter/project/agg/join/window/setops)
- streaming layer (watermarks, event-time windows, stateful dedup,
  latest-per-key compaction semantics as in Kafka compacted topics)
- LLM-data-pipeline operators (dedup exact/minhash/simhash, similarity
  search over embeddings, text analysis, multimodal column plumbing)

Everything is built on the public PySpark DataFrame/SQL API; Catalyst
does the optimization. No RDDs, no custom Catalyst rules.

Reference parity notes cite `/root/reference/<file>:<line>` in
docstrings (reference studied for behavior only; no code copied).
"""

from local_stream_stack_spark.session import get_spark, configure_for_oracle
from local_stream_stack_spark.catalog import TABLES, load_table, register_views

__all__ = [
    "get_spark",
    "configure_for_oracle",
    "TABLES",
    "load_table",
    "register_views",
]

__version__ = "0.1.0"
