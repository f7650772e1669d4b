"""psql_streamer_spark — a PySpark-native analytics + CDC streaming engine.

Re-expresses the capabilities of the reference CDC pipeline
(blind-oracle/psql-streamer: PostgreSQL logical replication -> normalized
JSON events -> batching mux -> routed Kafka fan-out) on top of Apache Spark:

- the Event data model        -> a fixed envelope StructType (schema.py)
- per-event transforms        -> DataFrame expression chains (transforms.py)
- routing / fan-out           -> expression-built `topic` column + multi-sink
                                 foreachBatch (routing.py / streaming/)
- mux batching + offsets      -> Structured Streaming triggers + checkpoints
- the analytics surface       -> operators/ (relational, dedup, similarity,
                                 text, multimodal), all Catalyst-first.

Everything here derives from the public Apache Spark API and the reference
repo's observable behavior; see SURVEY.md for the file:line parity map.
"""

from psql_streamer_spark.session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "__version__"]
