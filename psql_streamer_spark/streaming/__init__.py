from psql_streamer_spark.streaming.pipeline import CdcPipeline
from psql_streamer_spark.streaming.sinks import (
    KafkaSink,
    MemorySink,
    NoopSink,
    ParquetSink,
    Sink,
)

__all__ = [
    "CdcPipeline",
    "KafkaSink",
    "MemorySink",
    "NoopSink",
    "ParquetSink",
    "Sink",
]
