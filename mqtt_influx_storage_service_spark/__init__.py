"""PySpark-native analytics engine with the query & data-processing
capabilities of OpenChirp/mqtt_influx_storage_service.

The reference (/root/reference, ~530 LoC Python) is an MQTT -> InfluxDB
ingest daemon; this package re-expresses its dataflow (Structured
Streaming ingest -> Parquet), the query surface its stored model implies
(time-series scans / bucketed aggs / last-value / registry joins), and
the LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) — all Spark-first, designed for 100 TB scale.

Layout:
    sources/    table loaders + MQTT-stream simulation seam
    functions/  column-expression builders (coercion, topics, vectors, text)
    operators/  batch query library (the ``queries()`` registry)
    streaming/  Structured Streaming ingest / CDC / stats pipelines
    plans/      plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
