"""StructType schemas for the engine's tables.

Mirrors the reference's fixed relational schema (five memory tables +
auxiliary tables; reference: alma/types.py:144-252 and
alma/storage/sqlite_local.py:129-467) re-expressed as Spark types:

- ISO-string timestamps -> TimestampType (UTC)
- JSON metadata dict    -> MapType(string, string)
- float32 BLOB vectors  -> ArrayType(FloatType) column on the row
- JSON list columns     -> ArrayType(StringType)

Partition columns for the big memory tables are (project_id, agent) so
that the reference's universal `WHERE project_id = ? AND agent = ?`
template (sqlite_local.py:934-983) becomes partition pruning at scale.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


EMBEDDING = T.ArrayType(T.FloatType())
METADATA = T.MapType(T.StringType(), T.StringType())

HEURISTICS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("agent", T.StringType(), False),
        _f("project_id", T.StringType(), False),
        _f("condition", T.StringType()),
        _f("strategy", T.StringType()),
        _f("confidence", T.DoubleType()),
        _f("occurrence_count", T.IntegerType()),
        _f("success_count", T.IntegerType()),
        _f("last_validated", T.TimestampType()),
        _f("created_at", T.TimestampType()),
        _f("verification_status", T.StringType()),
        _f("embedding", EMBEDDING),
        _f("metadata", METADATA),
    ]
)

OUTCOMES = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("agent", T.StringType(), False),
        _f("project_id", T.StringType(), False),
        _f("task_type", T.StringType()),
        _f("task_description", T.StringType()),
        _f("success", T.BooleanType()),
        _f("strategy_used", T.StringType()),
        _f("duration_ms", T.IntegerType()),
        _f("error_message", T.StringType()),
        _f("user_feedback", T.StringType()),
        _f("timestamp", T.TimestampType()),
        _f("verification_status", T.StringType()),
        _f("embedding", EMBEDDING),
        _f("metadata", METADATA),
    ]
)

PREFERENCES = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("user_id", T.StringType(), False),
        _f("category", T.StringType()),
        _f("preference", T.StringType()),
        _f("source", T.StringType()),
        _f("confidence", T.DoubleType()),
        _f("timestamp", T.TimestampType()),
        _f("metadata", METADATA),
    ]
)

DOMAIN_KNOWLEDGE = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("agent", T.StringType(), False),
        _f("project_id", T.StringType(), False),
        _f("domain", T.StringType()),
        _f("fact", T.StringType()),
        _f("source", T.StringType()),
        _f("confidence", T.DoubleType()),
        _f("last_verified", T.TimestampType()),
        _f("verification_status", T.StringType()),
        _f("embedding", EMBEDDING),
        _f("metadata", METADATA),
    ]
)

ANTI_PATTERNS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("agent", T.StringType(), False),
        _f("project_id", T.StringType(), False),
        _f("pattern", T.StringType()),
        _f("why_bad", T.StringType()),
        _f("better_alternative", T.StringType()),
        _f("occurrence_count", T.IntegerType()),
        _f("last_seen", T.TimestampType()),
        _f("created_at", T.TimestampType()),
        _f("verification_status", T.StringType()),
        _f("embedding", EMBEDDING),
        _f("metadata", METADATA),
    ]
)

RETRIEVAL_FEEDBACK = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("memory_id", T.StringType(), False),
        _f("memory_type", T.StringType(), False),
        _f("query", T.StringType()),
        _f("agent", T.StringType()),
        _f("project_id", T.StringType()),
        _f("signal", T.StringType()),  # used | ignored | thumbs_up | thumbs_down
        _f("timestamp", T.TimestampType()),
    ]
)

MEMORY_STRENGTH = T.StructType(
    [
        _f("memory_id", T.StringType(), False),
        _f("memory_type", T.StringType(), False),
        _f("project_id", T.StringType()),
        _f("agent", T.StringType()),
        _f("initial_strength", T.DoubleType()),
        _f("decay_half_life_days", T.IntegerType()),
        _f("created_at", T.TimestampType()),
        _f("last_accessed", T.TimestampType()),
        _f("access_count", T.IntegerType()),
        _f("explicit_importance", T.DoubleType()),
        _f("reinforcement_events", T.ArrayType(T.TimestampType())),
    ]
)

CHECKPOINTS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("run_id", T.StringType(), False),
        _f("node_id", T.StringType()),
        _f("state", T.StringType()),  # JSON
        _f("sequence_number", T.IntegerType()),
        _f("branch_id", T.StringType()),
        _f("parent_checkpoint_id", T.StringType()),
        _f("state_hash", T.StringType()),
        _f("created_at", T.TimestampType()),
    ]
)

WORKFLOW_OUTCOMES = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("tenant_id", T.StringType()),
        _f("workflow_id", T.StringType()),
        _f("run_id", T.StringType()),
        _f("agent", T.StringType()),
        _f("project_id", T.StringType()),
        _f("result", T.StringType()),  # success|failure|partial|cancelled|timeout
        _f("summary", T.StringType()),
        _f("strategies_used", T.ArrayType(T.StringType())),
        _f("successful_patterns", T.ArrayType(T.StringType())),
        _f("failed_patterns", T.ArrayType(T.StringType())),
        _f("duration_seconds", T.DoubleType()),
        _f("node_count", T.IntegerType()),
        _f("error_message", T.StringType()),
        _f("created_at", T.TimestampType()),
    ]
)

GRAPH_ENTITIES = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("name", T.StringType()),
        _f("entity_type", T.StringType()),
        _f("properties", METADATA),
        _f("created_at", T.TimestampType()),
    ]
)

GRAPH_RELATIONSHIPS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("source_id", T.StringType(), False),
        _f("target_id", T.StringType(), False),
        _f("relation_type", T.StringType()),
        _f("properties", METADATA),
        _f("confidence", T.DoubleType()),
        _f("created_at", T.TimestampType()),
        _f("valid_from", T.TimestampType()),  # bitemporal validity
        _f("valid_to", T.TimestampType()),
    ]
)

SESSION_HANDOFFS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("agent", T.StringType(), False),
        _f("project_id", T.StringType()),
        _f("last_action", T.StringType()),
        _f("key_decisions", T.ArrayType(T.StringType())),
        _f("active_files", T.ArrayType(T.StringType())),
        _f("blockers", T.ArrayType(T.StringType())),
        _f("next_steps", T.ArrayType(T.StringType())),
        _f("created_at", T.TimestampType()),
    ]
)

ARCHIVED_MEMORIES = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("memory_type", T.StringType(), False),
        _f("agent", T.StringType()),
        _f("project_id", T.StringType()),
        _f("content", T.StringType()),  # JSON of the original row
        _f("embedding", EMBEDDING),
        _f("archive_reason", T.StringType()),
        _f("final_strength", T.DoubleType()),
        _f("archived_at", T.TimestampType()),
    ]
)

FORGET_AUDIT = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("memory_id", T.StringType(), False),
        _f("memory_type", T.StringType(), False),
        _f("agent", T.StringType()),
        _f("project_id", T.StringType()),
        _f("reason", T.StringType()),
        _f("deleted_at", T.TimestampType()),
    ]
)

ARTIFACTS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("memory_type", T.StringType(), False),
        _f("memory_id", T.StringType(), False),
        _f("storage_url", T.StringType()),
        _f("mime_type", T.StringType()),
        _f("checksum", T.StringType()),
        _f("created_at", T.TimestampType()),
        _f("metadata", METADATA),
    ]
)

AGENT_TRUST = T.StructType(
    [
        _f("agent", T.StringType(), False),
        _f("performance_score", T.DoubleType()),
        _f("behavior_scores", T.ArrayType(T.DoubleType())),  # 5 dims
        _f("success_streak", T.IntegerType()),
        _f("last_updated", T.TimestampType()),
    ]
)

# Progress tracking (reference: alma/progress/types.py WorkItem /
# ProgressLog — the trackable-work-unit surface)
WORK_ITEMS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("project_id", T.StringType(), False),
        _f("agent", T.StringType()),
        _f("title", T.StringType()),
        _f("description", T.StringType()),
        _f("item_type", T.StringType()),
        _f("status", T.StringType()),  # pending|in_progress|blocked|review|done|failed
        _f("priority", T.IntegerType()),  # 0-100
        _f("started_at", T.TimestampType()),
        _f("completed_at", T.TimestampType()),
        _f("time_spent_ms", T.LongType()),
        _f("attempt_count", T.IntegerType()),
        _f("parent_id", T.StringType()),
        _f("blocks", T.ArrayType(T.StringType())),
        _f("blocked_by", T.ArrayType(T.StringType())),
        _f("tests", T.ArrayType(T.StringType())),
        _f("tests_passing", T.BooleanType()),
        _f("acceptance_criteria", T.ArrayType(T.StringType())),
        _f("created_at", T.TimestampType()),
        _f("updated_at", T.TimestampType()),
        _f("metadata", METADATA),
    ]
)

PROGRESS_LOGS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("project_id", T.StringType(), False),
        _f("agent", T.StringType()),
        _f("session_id", T.StringType()),
        _f("items_total", T.IntegerType()),
        _f("items_done", T.IntegerType()),
        _f("items_in_progress", T.IntegerType()),
        _f("items_blocked", T.IntegerType()),
        _f("items_pending", T.IntegerType()),
        _f("current_item_id", T.StringType()),
        _f("current_action", T.StringType()),
        _f("created_at", T.TimestampType()),
    ]
)

MEMORY_TABLES = {
    "heuristics": HEURISTICS,
    "outcomes": OUTCOMES,
    "preferences": PREFERENCES,
    "domain_knowledge": DOMAIN_KNOWLEDGE,
    "anti_patterns": ANTI_PATTERNS,
}

ALL_TABLES = {
    **MEMORY_TABLES,
    "retrieval_feedback": RETRIEVAL_FEEDBACK,
    "memory_strength": MEMORY_STRENGTH,
    "checkpoints": CHECKPOINTS,
    "workflow_outcomes": WORKFLOW_OUTCOMES,
    "graph_entities": GRAPH_ENTITIES,
    "graph_relationships": GRAPH_RELATIONSHIPS,
    "session_handoffs": SESSION_HANDOFFS,
    "archived_memories": ARCHIVED_MEMORIES,
    "forget_audit": FORGET_AUDIT,
    "agent_trust": AGENT_TRUST,
    "artifacts": ARTIFACTS,
    "work_items": WORK_ITEMS,
    "progress_logs": PROGRESS_LOGS,
}

# Tables partitioned by (project_id, agent) on disk — the reference's two
# universal predicates become partition pruning.
PARTITIONED_BY_PROJECT_AGENT = {
    "heuristics",
    "outcomes",
    "domain_knowledge",
    "anti_patterns",
}
