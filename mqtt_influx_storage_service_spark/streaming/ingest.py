"""The reference's ingest daemon re-expressed as Structured Streaming.

Reference dataflow (SURVEY.md §3.1, influx_service.py): MQTT subscribe
(:47-97) → dispatch events vs data (:125-127) → topic decompose
(:129-139) → registry membership filter (:133-137) → union-type payload
coercion (:163-181) → narrow + wide point construction (:183-197) →
batched dual write (:199-212), with a registry CDC branch (:324-342)
and a 10-minute throughput stat (:310-322).

Spark shape: one ``readStream`` per topic feed → the SAME declarative
transformations the batch tier uses (``functions/topics.py``,
``functions/coercion.py``) → ``foreachBatch`` parquet sink with
checkpointing. Every transformation here takes a DataFrame and returns
a DataFrame without caring whether it is streaming or batch — that is
what makes the pipeline unit-testable (run it in batch, compare to the
oracle-checked ``refsemantics`` queries) and is idiomatic Structured
Streaming (one logical plan, micro-batched by the engine).

There is no native Spark MQTT connector, so the source is a seam
(SURVEY.md §7): :func:`mqtt_file_stream` reads a directory a bridge
process appends parquet files to. Swapping in a Kafka topic fed by an
MQTT-Kafka bridge changes ONE function; every transformation below the
seam is untouched.

Scale posture (100 TB/day ingest): the narrow sink partitions by
ingest date — time-range queries prune partitions, and the
per-micro-batch file count is bounded by shuffle partitions. The wide
("organized") layout is a DERIVED batch view over the narrow table
(dynamic pivot is not streamable, and materializing both layouts
doubles write amplification — the reference's dual write at :200 is an
InfluxDB artifact, not a semantic requirement; the pivot view serves
the same queries). The registry dimension stays snapshot-small and is
broadcast into the stream-static semi-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.coercion import coerce_payload
from ..functions.topics import DATA_TOPIC_PREFIX, parse_topic

# (arrival_ts, topic, payload) — the reference's queue tuple
# (influx_service.py:78-80); ts is stamped at arrival, so it is
# processing time, usable directly as event time for windowing.
MQTT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("topic", StringType(), False),
        StructField("payload", StringType(), True),
    ]
)


def mqtt_file_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source simulation of the MQTT subscribe (influx_service.py
    :47-97): each parquet file dropped into ``source_dir`` is one
    batch of messages. ``maxFilesPerTrigger`` caps micro-batch size —
    the backpressure knob the reference's bounded queue (:54) provides.
    """
    reader = spark.readStream.schema(MQTT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def mqtt_socket_stream(
    spark: SparkSession, host: str = "localhost", port: int = 1883
) -> DataFrame:
    """Live-socket implementation of the MQTT seam: a broker bridge
    (e.g. ``mosquitto_sub | nc -l``, or any process that relays broker
    messages as JSON lines over TCP) feeds Spark's built-in socket
    source. One line per message: ``{"ts": ..., "topic": ...,
    "payload": ...}``; a missing/unparseable ``ts`` falls back to the
    socket arrival timestamp — the reference stamps arrival time too
    (influx_service.py:78-80), so both paths agree on event-time
    semantics.

    Returns the SAME (ts, topic, payload) relation as
    :func:`mqtt_file_stream`, which is the point of the seam
    (SURVEY.md §7): :func:`start_ingest` takes either via its
    ``source=`` parameter and every transformation below is untouched.
    Caveats inherited from the socket source: driver-side, not
    replayable, so no exactly-once on THIS edge — a production broker
    bridge lands on Kafka (replayable) instead; the socket path exists
    to prove the seam swaps.
    """
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .option("includeTimestamp", "true")
        .load()
    )
    return bridge_lines_to_mqtt(raw, F.col("timestamp"))


def bridge_lines_to_mqtt(lines: DataFrame, arrival_ts) -> DataFrame:
    """The bridge-line contract, shared by EVERY transport that
    delivers broker messages as JSON lines (socket, Kafka, a text-file
    tail): ``{"ts": ..., "topic": ..., "payload": ...}`` per line in a
    ``value`` string column → the seam's (ts, topic, payload)
    relation. A missing/unparseable ``ts`` falls back to
    ``arrival_ts`` (the transport's arrival timestamp — the reference
    stamps arrival time too, influx_service.py:78-80); a line with no
    parseable topic is dropped, matching the reference's guard on
    empty topics. Pure column algebra: works identically on streaming
    and batch inputs, which is what the conformance test exploits."""
    j = F.from_json(
        F.col("value"), "ts timestamp, topic string, payload string"
    )
    return lines.select(
        F.coalesce(j.getField("ts"), arrival_ts).alias("ts"),
        j.getField("topic").alias("topic"),
        j.getField("payload").alias("payload"),
    ).filter(F.col("topic").isNotNull())


def mqtt_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka twin of :func:`mqtt_socket_stream` (VERDICT r5 #5): an
    MQTT→Kafka bridge (or the broker's own Kafka connector) lands each
    message as a JSON line in the record value; this source maps the
    Kafka record shape onto the seam contract via the SAME
    :func:`bridge_lines_to_mqtt` projection the socket path uses, with
    the Kafka broker timestamp as the arrival fallback. Unlike the
    socket edge, Kafka offsets are replayable, so the checkpointed
    sink's exactly-once guarantee extends to this transport — the
    production edge the reference's long-lived MQTT subscription
    (influx_service.py:47-97,424,432) maps to.

    Requires the ``spark-sql-kafka`` connector on the classpath (not
    bundled with PySpark; no broker nor connector ships in this
    container, so the wiring is pinned by the transport-agnostic
    conformance test instead of a live broker —
    tests/test_streaming.py::test_bridge_source_conformance).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )
    lines = raw.select(
        F.col("value").cast("string").alias("value"), F.col("timestamp")
    )
    return bridge_lines_to_mqtt(lines, F.col("timestamp"))


def make_source(spark: SparkSession, cfg) -> DataFrame:
    """One switchable source config (VERDICT r5 #5): build the ingest
    source from ``ServiceConfig`` keys — ``source_type`` in
    {``file`` (default), ``socket``, ``kafka``} plus the transport's
    own keys (``source_dir`` / ``socket_host``+``socket_port`` /
    ``kafka_bootstrap``+``kafka_topic``). Every branch returns the
    same (ts, topic, payload) relation, so ``start_ingest(source=
    make_source(spark, cfg))`` never knows which transport fed it."""
    kind = (cfg.get("source_type", "file") or "file").lower()
    if kind == "file":
        d = cfg.get("source_dir")
        if not d:
            raise ValueError("source_type=file needs source_dir")
        return mqtt_file_stream(spark, d)
    if kind == "socket":
        return mqtt_socket_stream(
            spark,
            cfg.get("socket_host", "localhost"),
            cfg.get_int("socket_port", 1883),
        )
    if kind == "kafka":
        bs, topic = cfg.get("kafka_bootstrap"), cfg.get("kafka_topic")
        if not bs or not topic:
            raise ValueError(
                "source_type=kafka needs kafka_bootstrap and kafka_topic"
            )
        return mqtt_kafka_stream(spark, bs, topic)
    raise ValueError(f"unknown source_type {kind!r}")


# --------------------------------------------------------------------------
# Transformations (streaming- and batch-applicable)
# --------------------------------------------------------------------------

def dispatch(msgs: DataFrame, events_topic: str) -> tuple[DataFrame, DataFrame]:
    """A2 (influx_service.py:125-127): route events-topic messages to
    the CDC branch, everything else to the point pipeline — two
    filtered branches of one stream."""
    is_events = F.col("topic") == F.lit(events_topic)
    return msgs.filter(~is_events), msgs.filter(is_events)


def to_points(msgs: DataFrame, devices: DataFrame | None = None) -> DataFrame:
    """A3+A4+A5+A6: topic decompose → (optional) registry membership
    semi-join → payload coercion → narrow layout.

    ``devices(device_id)`` is the registry dimension; it is broadcast
    (stream-static join) exactly like the reference's in-memory dict
    lookup under ``devices_lock`` (influx_service.py:133-137,396-401).
    """
    parsed = parse_topic(F.col("topic"))
    decomposed = msgs.filter(
        F.col("topic").startswith(DATA_TOPIC_PREFIX)
    ).select(
        "ts",
        parsed.getField("device_id").alias("device_id"),
        parsed.getField("transducer").alias("transducer"),
        "payload",
    )
    if devices is not None:
        decomposed = decomposed.join(
            F.broadcast(devices.select("device_id")), "device_id", "left_semi"
        )
    c = coerce_payload(F.col("payload"))
    coerced = decomposed.select(
        "ts", "device_id", "transducer", c.alias("v")
    )
    return coerced.select(
        F.concat_ws("_", "device_id", "transducer").alias("series_id"),
        "device_id",
        "transducer",
        "ts",
        F.col("v.value_type").alias("value_type"),
        F.col("v.value_double").alias("value_double"),
        F.col("v.value_bool").alias("value_bool"),
        F.col("v.value_str").alias("value_str"),
        F.to_date("ts").alias("ingest_date"),
    )


def split_malformed(msgs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A16 (influx_service.py:114-119): error isolation. The reference
    wraps each message in try/except so one bad message can't kill a
    worker; declaratively that becomes a quarantine split — data-topic
    messages whose topic doesn't match the 4-segment grammar go to a
    dead-letter branch instead of poisoning the pipeline (the
    badRecordsPath pattern). Payload coercion never rejects (it is a
    total function), so the topic grammar is the only parse that can
    fail."""
    on_data_prefix = F.col("topic").startswith(DATA_TOPIC_PREFIX)
    # try_element_at, not element_at: ANSI mode's And does not promise
    # short-circuit order after optimizer reordering, so a plain
    # element_at could throw on a 2-segment topic even behind the size
    # guard. try_ returns NULL, and NULL != "" is NULL → filtered.
    parts = F.split(F.col("topic"), "/")
    well_formed = (
        (F.size(parts) == 4)
        & (F.try_element_at(parts, F.lit(3)) != "")
        & (F.try_element_at(parts, F.lit(4)) != "")
    )
    return (
        msgs.filter(on_data_prefix & well_formed),
        msgs.filter(on_data_prefix & ~well_formed),
    )


def compact(spark: SparkSession, points_dir: str, ingest_date: str,
            warehouse_dir: str, target_files: int = 8) -> None:
    """Small-file compaction for one CLOSED date partition of the
    streaming sink: delegates to
    :func:`..tableformat.compact_point_partitions` (the r5 generalized
    form — fingerprint-idempotent, per-partition ATOMIC swap; the
    ``mode("overwrite")`` this replaced deleted-then-wrote, so a
    concurrent warehouse reader could see a partial partition), then
    trims the output to ``target_files`` semantics by re-running with a
    byte target derived from the partition size.

    In-place rewrites are deliberately NOT done: the streaming sink's
    ``_spark_metadata`` log is the authoritative file list for its
    root, so mutating files underneath it corrupts exactly-once reads —
    the streaming-dir → warehouse-dir promotion needs no log surgery,
    never races the live query (only closed partitions move), and batch
    queries read the warehouse root with plain partition pruning."""
    import math
    import os as _os

    from ..tableformat import compact_point_partitions

    part = f"{points_dir}/ingest_date={ingest_date}"
    total = sum(
        _os.path.getsize(_os.path.join(part, f))
        for f in _os.listdir(part)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    target_bytes = max(1, math.ceil(total / target_files))
    compact_point_partitions(
        spark,
        points_dir,
        warehouse_dir,
        target_bytes=target_bytes,
        only=[ingest_date],
    )


# wide_view's dynamic-pivot probe cap (VERDICT r9 #3): .pivot() with no
# value list collects every distinct transducer to the DRIVER and mints
# one output column each — a schema, not a result, so it must stay
# driver-small. Same cap-and-refuse idiom as
# functions/influxql.py::_bounded_index (CATALOG_MAX_SERIES).
WIDE_VIEW_MAX_FIELDS = 10_000


def _validate_wide_fields(fields: list[str | None]) -> None:
    """Refuse a pivot field list that mints colliding columns — runs on
    BOTH the auto-discovered list and an explicitly passed ``fields=``
    (ADVICE r13: the explicit path used to skip these and fail later
    with Spark's raw AMBIGUOUS_REFERENCE instead of the friendly
    refusal). Three collision classes, all rooted in Spark's default
    case-insensitive column resolution (spark.sql.caseSensitive=false):

    - two transducers differing only in case ('Temp'/'temp');
    - a transducer folding onto a fixed output column ('ts',
      'device_id' — the groupBy keys of the wide layout);
    - a NULL transducer (pivots to a column literally named 'null')
      alongside a transducer string-named 'null'.
    """
    named = [f for f in fields if f is not None]
    folded: dict[str, str] = {}
    for f in named:
        first = folded.setdefault(f.lower(), f)
        if first != f:
            raise ValueError(
                f"wide_view fields contain transducers {first!r} and "
                f"{f!r} differing only in case; column resolution is "
                "case-insensitive (spark.sql.caseSensitive=false), "
                "so pivoting both mints ambiguous columns — "
                "quarantine or rename one, or pass fields= "
                "excluding one"
            )
        if f.lower() in ("ts", "device_id"):
            raise ValueError(
                f"wide_view fields contain a transducer named {f!r}, "
                "which collides with the wide layout's fixed "
                f"{f.lower()!r} column under case-insensitive "
                "resolution — quarantine or rename it, or pass "
                "fields= excluding it"
            )
    if None in fields and any(f.lower() == "null" for f in named):
        raise ValueError(
            "wide_view fields contain both a NULL transducer (short "
            "topic) and a transducer literally named 'null'; "
            "pivoting both would mint duplicate 'null' columns — "
            "quarantine the NULL rows (streaming.ingest."
            "split_malformed) or pass fields= excluding one of them"
        )


def wide_view(points: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """A7 (influx_service.py:191-197): the 'organized' layout — one row
    per (device_id, ts), one column per transducer — as a DERIVED pivot
    over the narrow table. Batch-only by design: dynamic pivot needs
    the transducer universe, which streaming cannot know.

    Pass ``fields`` (the transducer names to become columns) on any
    real lake — an explicit list skips the driver-side distinct probe
    entirely, exactly how ``WidePointsCatalog`` feeds its bounded
    field list (functions/influxql.py:1151). Without it, the probe is
    BOUNDED: distinct().limit(MAX+1) so Spark stops the scan early,
    and above WIDE_VIEW_MAX_FIELDS the call refuses with a pointer at
    the catalog path instead of minting a million-column schema on the
    driver."""
    if fields is None:
        rows = (
            points.select("transducer")
            .distinct()
            .limit(WIDE_VIEW_MAX_FIELDS + 1)
            .collect()
        )
        if len(rows) > WIDE_VIEW_MAX_FIELDS:
            raise ValueError(
                f"wide_view found more than {WIDE_VIEW_MAX_FIELDS} distinct "
                "transducers; a pivot at that width is a driver/schema "
                "hazard — pass fields= explicitly (fed from a maintained "
                "series catalog, e.g. operators/timeseries.py::"
                "ts_series_catalog, the WidePointsCatalog route) or raise "
                "WIDE_VIEW_MAX_FIELDS deliberately"
            )
        # null-safe: a short data topic parses to a NULL transducer
        # (try_element_at) and can reach an un-quarantined points frame.
        # The dynamic pivot this probe replaced sorted nulls first and
        # minted a 'null' column; keep that contract instead of letting
        # sorted() throw on a None/str comparison.
        vals = [r[0] for r in rows]
        fields = sorted(v for v in vals if v is not None)
        if len(fields) < len(vals):
            # A NULL transducer pivots to a column literally named
            # 'null' — keep the dynamic pivot's contract (nulls sorted
            # first) by prepending the None slot before validation.
            fields = [None, *fields]
    # Collision guards (case pairs, fixed 'ts'/'device_id' columns,
    # NULL vs literal-'null') run on the auto-discovered AND the
    # explicitly passed list alike — an explicit list from an external
    # catalog can carry the same hazards (ADVICE r13); conforming
    # ingest never produces them (the topic parser lowercases,
    # reference influx_service.py:139).
    _validate_wide_fields(fields)
    return (
        points.groupBy("device_id", "ts")
        .pivot("transducer", fields)
        .agg(F.first("value_double"))
    )


def throughput_stats(msgs: DataFrame, interval: str = "10 minutes") -> DataFrame:
    """A13 (influx_service.py:310-322): points-written count + device
    count per tumbling window. The reference resets a counter every
    600s on a wall-clock thread; the declarative form is a tumbling
    event-time window with a watermark to bound state."""
    parsed = parse_topic(F.col("topic"))
    return (
        msgs.withWatermark("ts", interval)
        .select("ts", parsed.getField("device_id").alias("device_id"))
        .groupBy(F.window("ts", interval).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("points_written"),
            F.approx_count_distinct("device_id").alias("n_devices"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "points_written",
            "n_devices",
        )
    )


def stats_messages(stats: DataFrame) -> DataFrame:
    """A14 (influx_service.py:315-320): render each stat row as the
    reference's status JSON message."""
    return stats.select(
        "window_start",
        F.to_json(
            F.struct(
                F.concat(
                    F.lit("Points written 10 min avg : "),
                    F.col("points_written").cast("string"),
                    F.lit(" / #Devices: "),
                    F.col("n_devices").cast("string"),
                ).alias("message")
            )
        ).alias("status_json"),
    )


def activation_points_join(
    points: DataFrame,
    service_events: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-STREAM interval join correlating the two dispatch
    branches (A2): every narrow point a newly-created device publishes
    within ``horizon`` of its 'new' service event — i.e. device
    activation latency, the operational question the reference's
    operators answer by eyeballing logs (influx_service.py:324-342
    creates the device; the first write after it lands at :215).

    Both sides are watermarked, and the join condition carries the
    event-time band (equi on device_id + ``ts in [event_ts, event_ts +
    horizon]``), so Spark maintains BOUNDED state on both sides and
    evicts rows older than watermark+horizon — the stream-stream join
    contract. On batch inputs the watermark nodes are eliminated
    (EliminateEventTimeWatermark) and it is an ordinary interval join,
    so the stream/batch equivalence test runs the same code path.
    """
    ev = (
        service_events.filter(F.col("action") == "new")
        .select(
            F.col("device_id").alias("ev_device"),
            F.col("ts").alias("event_ts"),
        )
        .withWatermark("event_ts", watermark)
    )
    pts = points.withWatermark("ts", watermark)
    cond = (
        (F.col("device_id") == F.col("ev_device"))
        & (F.col("ts") >= F.col("event_ts"))
        & (F.col("ts") <= F.col("event_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return pts.join(ev, cond).select(
        "device_id",
        "series_id",
        "event_ts",
        "ts",
        (F.unix_micros("ts") - F.unix_micros("event_ts")).alias("latency_us"),
    )


def dedup_messages(msgs: DataFrame, within: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup (Tier C streaming mandate): drop exact
    (topic, payload) repeats within the watermark — bounded state, late
    duplicates beyond the watermark age out. Batch fallback uses plain
    dropDuplicates (same key set)."""
    if msgs.isStreaming:
        return msgs.withWatermark("ts", within).dropDuplicatesWithinWatermark(
            ["topic", "payload"]
        )
    return msgs.dropDuplicates(["topic", "payload"])


# --------------------------------------------------------------------------
# Registry CDC (A9/A10)
# --------------------------------------------------------------------------

# service event: {"action": "new|update|delete", "thing": {"id": ...}}
# (influx_service.py:324-328)
EVENT_SCHEMA = "struct<action: string, thing: struct<id: string>>"


def parse_service_events(events_msgs: DataFrame) -> DataFrame:
    """CDC branch: JSON payload → (ts, action, device_id)."""
    ev = F.from_json(F.col("payload"), EVENT_SCHEMA)
    return events_msgs.select(
        "ts",
        ev.getField("action").alias("action"),
        ev.getField("thing").getField("id").alias("device_id"),
    ).filter(F.col("device_id").isNotNull())


def apply_cdc(registry: DataFrame, batch: DataFrame) -> DataFrame:
    """A10 (influx_service.py:330-342): last-writer-wins upsert/delete.

    new/update ⇒ device present; delete ⇒ device absent. Implemented as
    a MERGE-shaped full-outer combine: take each device's LAST action
    in the batch, outer-join onto the current registry, keep rows whose
    final action is not delete. With a Delta/Iceberg table this is one
    ``MERGE INTO``; the parquet-snapshot form has identical semantics
    (per-key atomicity comes from the snapshot swap, mirroring the
    reference's devices_lock at :401).

    The reference applies events in ARRIVAL order; ``ts`` alone can
    tie (a new + delete stamped in the same microsecond would resolve
    nondeterministically), so the ordering struct carries a monotonic
    per-batch sequence — file/row order within the micro-batch, i.e.
    arrival order — as the tie-breaker.
    """
    seq = batch.withColumn("_seq", F.monotonically_increasing_id())
    w_last = (
        seq.groupBy("device_id")
        .agg(F.max_by("action", F.struct("ts", "_seq")).alias("action"),
             F.max("ts").alias("ts"))
    )
    current = registry.select("device_id", F.col("registered_ts"))
    merged = current.join(w_last, "device_id", "full_outer")
    return (
        merged.filter(
            F.when(F.col("action").isNotNull(), F.col("action") != "delete")
            .otherwise(F.lit(True))
        )
        .select(
            "device_id",
            F.coalesce(F.col("ts"), F.col("registered_ts")).alias("registered_ts"),
        )
    )


# properties.created_by the reference stamps on auto-created
# transducers (influx_service.py:253)
TRANSDUCER_CREATED_BY = "OpenChirp Influxdb Storage service"

REGISTRY_SCHEMA = "device_id string, registered_ts timestamp"
TRANSDUCER_SCHEMA = (
    "device_id string, transducer string, created_ts timestamp, created_by string"
)


def start_registry_cdc(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    bootstrap: DataFrame | None = None,
    events_topic: str = "openchirp/service/x/thing/events",
    available_now: bool = True,
) -> StreamingQuery:
    """A10 as a foreachBatch MERGE into a :class:`SnapshotTable` — the
    table-format form of the reference's locked dict mutation
    (influx_service.py:330-342,396-401).

    Exactly-once: the streaming checkpoint replays the last
    uncommitted micro-batch after a crash; the table's manifest
    records applied batch ids, so the replayed ``merge`` is a no-op
    instead of a double-apply (tests/test_tableformat.py pins this).
    ``combine=apply_cdc`` keeps last-writer-wins upsert/delete
    semantics identical to the batch/oracle form (ref_registry_cdc).
    """
    from ..tableformat import SnapshotTable

    table = SnapshotTable(spark, table_dir, ["device_id"], schema=REGISTRY_SCHEMA)
    if bootstrap is not None and table.version() == 0:
        table.overwrite(bootstrap)  # A9: snapshot load before the stream
    msgs = mqtt_file_stream(spark, source_dir)
    _data, events = dispatch(msgs, events_topic)
    cdc = parse_service_events(events)
    writer = (
        cdc.writeStream.foreachBatch(
            lambda batch, batch_id: table.merge(
                batch, batch_id=batch_id, combine=apply_cdc
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("registry_cdc")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def transducer_pairs(msgs: DataFrame) -> DataFrame:
    """Observed (device_id, transducer, ts) from well-formed data
    messages — the auto-create candidate stream (A11)."""
    well, _malformed = split_malformed(msgs)
    parsed = parse_topic(F.col("topic"))
    return well.select(
        parsed.getField("device_id").alias("device_id"),
        parsed.getField("transducer").alias("transducer"),
        "ts",
    )


def start_transducer_autocreate(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    events_topic: str = "openchirp/service/x/thing/events",
    available_now: bool = True,
) -> StreamingQuery:
    """A11 (influx_service.py:215-274): create unseen (device,
    transducer) pairs in the dimension, exactly once.

    The reference serializes creation with a per-key lock +
    re-check-after-acquire; declaratively that collapses to (a)
    groupBy pair key inside the batch — concurrent duplicates in one
    micro-batch become ONE candidate row with the earliest ts — and
    (b) ``insert_only`` MERGE — a pair already in the dimension keeps
    its original row (first-writer-wins), so replays and cross-batch
    duplicates never clobber the original creation record. Batch-id
    idempotence (same manifest mechanism as the registry CDC) makes
    crash-replay a no-op.
    """
    from ..tableformat import SnapshotTable

    table = SnapshotTable(
        spark, table_dir, ["device_id", "transducer"], schema=TRANSDUCER_SCHEMA
    )
    msgs = mqtt_file_stream(spark, source_dir)
    data, _events = dispatch(msgs, events_topic)
    pairs = transducer_pairs(data)

    def _create(batch: DataFrame, batch_id: int) -> None:
        candidates = (
            batch.groupBy("device_id", "transducer")
            .agg(F.min("ts").alias("created_ts"))
            .withColumn("created_by", F.lit(TRANSDUCER_CREATED_BY))
        )
        table.merge(candidates, batch_id=batch_id, insert_only=True)

    writer = (
        pairs.writeStream.foreachBatch(_create)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("transducer_autocreate")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bootstrap_registry(spark: SparkSession, snapshot_path: str) -> DataFrame:
    """A9 (influx_service.py:344-375): the REST bootstrap becomes a
    batch read of the registry snapshot. The subscribe-before-snapshot
    ordering trick (:424 before :432) maps to 'start the CDC stream's
    checkpoint before taking the snapshot' — replaying overlap is safe
    because apply_cdc is last-writer-wins idempotent."""
    return spark.read.parquet(snapshot_path)


# --------------------------------------------------------------------------
# Sinks / query lifecycle (A8, A17)
# --------------------------------------------------------------------------

def start_ingest(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    devices: DataFrame | None = None,
    events_topic: str = "openchirp/service/x/thing/events",
    available_now: bool = True,
    source: DataFrame | None = None,
) -> StreamingQuery:
    """Wire the full point path: source → dispatch → to_points →
    partitioned parquet sink with checkpoint (A8; exactly-once via the
    checkpoint + idempotent file commit protocol, replacing the
    reference's fire-and-forget HTTP write at :199-212).

    ``available_now`` processes everything present then stops — the
    batch-replay mode used by tests and backfills; ``False`` tails the
    directory continuously.

    Error isolation (A16, influx_service.py:114-119) is wired IN the
    production path: ``split_malformed`` quarantines data-topic
    messages that don't match the 4-segment grammar into a dead-letter
    sink (its own exactly-once parquet sink + checkpoint) instead of
    letting them poison the batch; ``parse_topic`` additionally uses
    ``try_element_at`` so a short topic can never throw under ANSI
    mode. Returns the points query; the dead-letter query runs
    alongside and is stopped by :func:`stop_all`.

    ``source`` overrides the file-stream default with any streaming
    DataFrame shaped like MQTT_SCHEMA — e.g. :func:`mqtt_socket_stream`
    for a live broker bridge, or a Kafka topic parsed to the same three
    columns. This is the seam SURVEY.md §7 promises: the pipeline below
    this line never knows which transport fed it.
    """
    msgs = source if source is not None else mqtt_file_stream(spark, source_dir)
    data, _events = dispatch(msgs, events_topic)
    well_formed, malformed = split_malformed(data)
    points = to_points(well_formed, devices)

    dead_writer = (
        malformed.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "dead_letter"))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "dead_letter"))
        .outputMode("append")
        .queryName("dead_letter")
    )
    writer = (
        points.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "points"))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "points"))
        .partitionBy("ingest_date")
        .outputMode("append")
    )
    if available_now:
        dead_writer = dead_writer.trigger(availableNow=True)
        writer = writer.trigger(availableNow=True)
    dead_q = dead_writer.start()
    q = writer.start()
    if available_now:
        # batch-replay mode: the caller awaits the returned points
        # query; make sure the quarantine branch also drains before the
        # replay is considered done
        dead_q.awaitTermination()
    return q


def start_enriched_ingest(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    lookup,
    events_topic: str = "openchirp/service/x/thing/events",
    available_now: bool = True,
    source: DataFrame | None = None,
) -> StreamingQuery:
    """A12 with LIVE enrichment (VERDICT r3 missing #2): the reference
    fetches device metadata per event (influx_service.py:276-307);
    the batch tier serves it from a dimension snapshot frozen at plan
    time (operators/timeseries.py ts_registry_enriched, the SURVEY
    §1.4 adjudication). This is the seam for users who need
    FRESH-per-batch metadata: ``lookup(spark) -> DataFrame`` is
    re-evaluated inside ``foreachBatch`` for EVERY micro-batch — point
    it at ``SnapshotTable.read`` (or a JDBC/REST-matview load) and a
    registry update between batches changes the enrichment of every
    subsequent batch (pinned in tests/test_streaming.py).

    Exactly-once without the file-sink log: each micro-batch lands in
    its own ``batch=<id>`` directory with ``mode("overwrite")`` — a
    crash-replay of the last uncommitted batch overwrites its own
    directory instead of appending duplicates, the standard idempotent
    foreachBatch layout. Readers hit the ``points_enriched`` root and
    see ``batch`` as a discovered partition column. The dimension is
    broadcast per batch (registry-sized, like the reference's
    in-memory device dict)."""
    msgs = source if source is not None else mqtt_file_stream(spark, source_dir)
    data, _events = dispatch(msgs, events_topic)
    well_formed, _malformed = split_malformed(data)
    points = to_points(well_formed)
    root = os.path.join(out_dir, "points_enriched")

    def _write(batch: DataFrame, batch_id: int) -> None:
        dim = lookup(spark)
        enriched = batch.join(F.broadcast(dim), "device_id", "left_outer")
        (
            enriched.write.mode("overwrite")
            .partitionBy("ingest_date")
            .parquet(os.path.join(root, f"batch={batch_id}"))
        )

    writer = (
        points.writeStream.foreachBatch(_write)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "enriched"))
        .queryName("enriched_ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_stats(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    interval: str = "10 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """Wire the stats path (A13/A14) to its own sink. Append mode +
    watermark: a window emits once it is final — the same at-most-once
    publish cadence as the reference's stats thread."""
    msgs = mqtt_file_stream(spark, source_dir)
    stats = throughput_stats(msgs, interval)
    writer = (
        stats.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "stats"))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stop_all(spark: SparkSession) -> None:
    """A17 (influx_service.py:100-112): graceful shutdown — stop every
    active query; checkpoints make restart exactly-once."""
    for q in spark.streams.active:
        q.stop()
