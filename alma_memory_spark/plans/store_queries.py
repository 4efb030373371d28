"""Gate queries that drive the REAL ParquetStore write paths end-to-end
— upsert-by-id, delete-with-audit, and the JSON store round-trip — and
hash-check the resulting end state against an oracle that recomputes it
straight from the source table. Same pattern as archive_restore_roundtrip:
the store machinery (window-dedup keep-latest, audit-before-delete,
export/import) runs for real in a temp root; only the deterministic end
state is returned.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alma_memory_spark.plans.registry import _r6, _t, register

_CUTOFF = "2024-01-15 00:00:00"


def _seed_frame(spark: SparkSession, sf_dir: str, user_pred) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(user_pred)
    return ev.select(
        F.col("event_id").cast("string").alias("id"),
        F.concat(F.lit("u"), (F.col("user_id") % 5).cast("string")).alias("agent"),
        F.lit("p").alias("project_id"),
        F.col("value"),
        F.col("ts"),
    )


@register(
    "upsert_roundtrip",
    """
    SELECT CAST(event_id AS VARCHAR) AS id,
           'u' || CAST(user_id % 5 AS VARCHAR) AS agent,
           round(CASE WHEN event_id % 3 = 0 THEN value + 1000.0 ELSE value END, 6)
             AS value
    FROM events
    WHERE user_id <= 3
    ORDER BY id
    """,
)
def upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT OR REPLACE semantics through the real store (reference:
    sqlite_local.py:644-813): seed a table, upsert an overlapping batch
    (every third id, value + 1000), and return the final table. The
    oracle recomputes the keep-latest end state from events — row count
    unchanged (no duplicate ids), replaced rows carry the new value —
    hash-checking the union + window-dedup + atomic-swap rewrite."""
    from alma_memory_spark.sources.store import ParquetStore

    live = _seed_frame(spark, sf_dir, F.col("user_id") <= 3)
    root = tempfile.mkdtemp(prefix="alma_upsert_gate_")
    try:
        store = ParquetStore(spark, root)
        store.append("domain_knowledge", live)
        updates = live.filter(F.col("id").cast("long") % 3 == 0).withColumn(
            "value", F.col("value") + 1000.0
        )
        store.upsert("domain_knowledge", updates)
        out = (
            store.read("domain_knowledge")
            .select("id", "agent", _r6(F.col("value")).alias("value"))
            .orderBy("id")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "forget_audit_trail",
    f"""
    SELECT 'audit_' || md5(CAST(event_id AS VARCHAR)) AS id,
           CAST(event_id AS VARCHAR) AS memory_id,
           'domain_knowledge' AS memory_type,
           'u' || CAST(user_id % 5 AS VARCHAR) AS agent,
           'p' AS project_id,
           'expired' AS reason
    FROM events
    WHERE user_id = 9 AND ts < TIMESTAMP '{_CUTOFF}'
    ORDER BY memory_id
    """,
)
def forget_audit_trail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-before-delete ordering (reference: forgetting.py:306-330 —
    every forget writes the audit sink FIRST): age-based delete through
    the real store, gate returns the forget_audit table. The oracle
    derives the expected audit rows (md5-keyed ids, scope columns,
    reason) from the delete predicate over events, hash-checking the
    audit projection and the predicate plumbing."""
    from alma_memory_spark.sources.store import ParquetStore

    live = _seed_frame(spark, sf_dir, F.col("user_id") == 9)
    root = tempfile.mkdtemp(prefix="alma_forget_gate_")
    try:
        store = ParquetStore(spark, root)
        store.append("domain_knowledge", live)
        store.delete(
            "domain_knowledge",
            F.col("ts") < F.to_timestamp(F.lit(_CUTOFF)),
            reason="expired",
            memory_type="domain_knowledge",
        )
        out = (
            store.read("forget_audit")
            .select("id", "memory_id", "memory_type", "agent", "project_id", "reason")
            .orderBy("memory_id")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "json_store_roundtrip",
    """
    SELECT CAST(event_id AS VARCHAR) AS id,
           'u' || CAST(user_id % 5 AS VARCHAR) AS agent,
           round(value, 6) AS value,
           round(epoch(ts), 6) AS ts_epoch
    FROM events
    WHERE user_id = 11
    ORDER BY id
    """,
)
def json_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based JSON store round-trip (reference:
    alma/storage/file_based.py): export a table to the JSON format,
    import it into a FRESH store, return the imported rows. The oracle
    is the identity over events — any loss in the JSON writer/reader
    (type coercion, timestamp formatting, row drops) breaks the hash."""
    from alma_memory_spark import schemas as _schemas
    from alma_memory_spark.sources.store import ParquetStore

    live = _seed_frame(spark, sf_dir, F.col("user_id") == 11)
    root = tempfile.mkdtemp(prefix="alma_json_gate_")
    schema = "id string, agent string, project_id string, value double, ts timestamp"
    prev = _schemas.ALL_TABLES.get("_json_gate")
    _schemas.ALL_TABLES["_json_gate"] = schema
    try:
        src = ParquetStore(spark, root + "/a")
        dst = ParquetStore(spark, root + "/b")
        src.append("_json_gate", live)
        src.export_json("_json_gate", root + "/export")
        dst.import_json("_json_gate", root + "/export")
        out = (
            dst.read("_json_gate")
            .select(
                "id",
                "agent",
                _r6(F.col("value")).alias("value"),
                _r6(F.col("ts").cast("double")).alias("ts_epoch"),
            )
            .orderBy("id")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        if prev is None:
            _schemas.ALL_TABLES.pop("_json_gate", None)
        else:
            _schemas.ALL_TABLES["_json_gate"] = prev
        shutil.rmtree(root, ignore_errors=True)
