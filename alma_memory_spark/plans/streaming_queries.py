"""Structured Streaming query for the driver gate: a real streaming job
(readStream -> watermarked tumbling-window aggregation -> memory sink,
processed to completion) whose final result equals a batch oracle — so
even the streaming path is DuckDB-hash-checked, not just rows-counted.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alma_memory_spark.plans.registry import NOW, _now, _r6, register

# the driver's parquet stores ts as TIMESTAMP(MICROS); declaring the
# column as timestamp makes the file-source read it directly (the
# explicit schema also overrides Spark 4.1's NTZ inference).
_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


@register(
    "streaming_window_stats",
    """
    SELECT CAST(floor(epoch(ts) / 86400.0) * 86400 AS BIGINT) AS window_start,
           event_type,
           count(*) AS n,
           round(CAST(sum(value::DECIMAL(18,2)) AS DOUBLE), 6) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed aggregation (SURVEY §2.9): the events table is
    replayed through a FILE STREAM (readStream, maxFilesPerTrigger) into
    a watermarked 1-day tumbling-window count/sum, drained with
    processAllAvailable into a memory sink. The completed stream result
    must equal the batch oracle — this is the determinism property that
    makes streaming ingestion safe to adopt incrementally at scale.

    DECIMAL sums keep the aggregate order-independent across micro-batch
    boundaries exactly as across partitions in batch."""
    from alma_memory_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    # a CLONED session isolates this stream's conf (state-store sizing
    # below) from concurrent jobs on the caller's session — mutating
    # the shared spark.sql.shuffle.partitions would silently re-plan
    # any batch job built in the window
    s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    stream = (
        s2.readStream.schema(_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    agg = (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
        )
    )
    qname = "stream_win_" + uuid.uuid4().hex[:8]
    # state-store sizing (on the clone only): the stream has ~150
    # (window, type) keys; 32 shuffle partitions would mean 32
    # HDFS-backed state stores with per-batch snapshot overhead
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
        out = (
            s2.table(qname)
            .select(
                F.col("win.start").cast("long").alias("window_start"),
                "event_type",
                "n",
                _r6(F.col("sum_dec").cast("double")).alias("sum_value"),
            )
            # materialize before the stream/view goes away
            .cache()
        )
        out.count()
        return out
    finally:
        q.stop()


@register(
    "streaming_decay_at_read",
    f"""
    SELECT event_id,
           round(least(1.0, greatest(0.0,
             ( exp(-0.693 * ((epoch(TIMESTAMP '{NOW}') - epoch(ts)) / 86400.0) / 30.0)
               + least(0.4, 0.1 * ln(1.0 + coalesce(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0)))
             ) * 0.75
           )), 6) AS strength
    FROM events
    WHERE ts <= TIMESTAMP '{NOW}'
    """,
)
def streaming_decay_at_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decay-at-read on a REAL stream (SURVEY §2.9; reference design
    decay.py:74-122 — strength is never stored, always computed from
    timestamps at read): events replay through a file stream, the SAME
    strength_decay column expression used in batch attaches per-row
    strength in-flight, append-mode memory sink, drained with
    processAllAvailable. The oracle is the batch strength_decay query —
    the stateless-expression property means batch and stream must agree
    bit-for-bit, and this gate proves it on an actual streaming plan."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from alma_memory_spark.functions.temporal import strength_decay
    from alma_memory_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    stream = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    k = F.get_json_object("props", "$.k").cast("double")
    scored = (
        stream.filter(F.col("ts") <= _now())
        .select(
            "event_id",
            _r6(strength_decay("ts", _now(), 30.0, 1.0, k)).alias("strength"),
        )
    )
    qname = "stream_decay_" + uuid.uuid4().hex[:8]
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.table(qname).cache()
        out.count()
        return out
    finally:
        q.stop()
