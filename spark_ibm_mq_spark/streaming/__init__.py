"""Streaming layer (SURVEY.md §7 M4): event-time windows, watermarked
dedup, stream-static joins, stateful sequence monitoring, and query
telemetry — the Structured-Streaming analytics the reference's consumers
hand-rolled over DStreams (README.md:10-17)."""

from spark_ibm_mq_spark.streaming.monitor import MQTelemetryListener
from spark_ibm_mq_spark.streaming.mq_sink import MQWritebackSink
from spark_ibm_mq_spark.streaming.readers import events_file_stream

__all__ = ["MQTelemetryListener", "MQWritebackSink", "events_file_stream"]
