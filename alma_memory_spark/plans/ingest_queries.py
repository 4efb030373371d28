"""Gate query for the multi-format chat-export ingestion pipeline:
materialize one export file per supported format (payload text drawn
deterministically from the documents table), run the REAL
detect_format -> normalize_directory path, and hash-check the unified
transcript against an oracle that reconstructs the expected rows from
documents in SQL. Detection, per-format parsing/projection, turn
numbering, and role mapping are all on the hash.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alma_memory_spark.plans.registry import _t, probe_plan, register
from alma_memory_spark.session import tiny_df as _tiny

# (file, doc_ids, roles) layout shared by the Spark side and the oracle.
# Formats covered: Claude-Code JSONL, Codex JSONL (meta line + turns),
# Claude.ai JSON, ChatGPT JSON (mapping keyed out of order, sorted by
# create_time), Slack JSON, `> `-marked transcript, plain text.
_LAYOUT = [
    ("f1_claude_code.jsonl", [0, 1], ["user", "assistant"]),
    ("f2_codex.jsonl", [2, 3], ["user", "assistant"]),
    ("f3_claude_ai.json", [4, 5], ["human", "assistant"]),
    ("f4_chatgpt.json", [6, 7], ["user", "assistant"]),
    ("f5_slack.json", [8, 9], ["alice", "bob"]),
    ("f6_transcript.txt", [10, 11, 12], ["user", "user", "user"]),
    ("f7_plain.txt", [13], ["user"]),
]

_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{fname}' AS source, {turn} AS turn, '{role}' AS role, text
    FROM documents WHERE doc_id = {doc}"""
    for fname, docs, roles in _LAYOUT
    for turn, (doc, role) in enumerate(zip(docs, roles), start=1)
)


@register(
    "chat_ingest_formats",
    f"""
    SELECT * FROM (
    {_ORACLE}
    ) ORDER BY source, turn
    """,
)
def chat_ingest_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-export ingestion across all supported formats (reference:
    alma/ingestion/normalizer.py:30-151): write one export per format
    with payloads from the documents table, then run the real
    detect_format + normalize_directory dispatch. The oracle
    reconstructs the expected (source, turn, role, text) rows straight
    from documents, so a wrong detection, a broken per-format
    projection, mis-numbered turns, or role-mapping drift all break the
    hash."""
    texts = {
        r["doc_id"]: r["text"]
        for r in _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") <= 13)
        .collect()
    }
    d = tempfile.mkdtemp(prefix="alma_ingest_gate_")
    try:
        with open(os.path.join(d, "f1_claude_code.jsonl"), "w") as f:
            f.write(json.dumps({"type": "user", "message": {"content": texts[0]}}) + "\n")
            f.write(
                json.dumps({"type": "assistant", "message": {"content": texts[1]}}) + "\n"
            )
        with open(os.path.join(d, "f2_codex.jsonl"), "w") as f:
            f.write(json.dumps({"type": "session_meta", "id": "sess-1"}) + "\n")
            f.write(json.dumps({"type": "user", "content": texts[2]}) + "\n")
            f.write(json.dumps({"type": "assistant", "content": texts[3]}) + "\n")
        with open(os.path.join(d, "f3_claude_ai.json"), "w") as f:
            json.dump(
                {
                    "chat_messages": [
                        {"sender": "human", "text": texts[4]},
                        {"sender": "assistant", "text": texts[5]},
                    ]
                },
                f,
            )
        with open(os.path.join(d, "f4_chatgpt.json"), "w") as f:
            json.dump(
                {
                    "mapping": {
                        # keyed out of order on purpose: normalization
                        # must sort by create_time
                        "zz": {
                            "message": {
                                "author": {"role": "assistant"},
                                "create_time": 2.0,
                                "content": {"parts": [texts[7]]},
                            }
                        },
                        "aa": {
                            "message": {
                                "author": {"role": "user"},
                                "create_time": 1.0,
                                "content": {"parts": [texts[6]]},
                            }
                        },
                    }
                },
                f,
            )
        with open(os.path.join(d, "f5_slack.json"), "w") as f:
            json.dump(
                [
                    {"type": "message", "user": "alice", "text": texts[8]},
                    {"type": "channel_join", "user": "sys"},
                    {"type": "message", "user": "bob", "text": texts[9]},
                ],
                f,
            )
        with open(os.path.join(d, "f6_transcript.txt"), "w") as f:
            for i in (10, 11, 12):
                f.write(f"> {texts[i]}\n")
        with open(os.path.join(d, "f7_plain.txt"), "w") as f:
            f.write(texts[13] + "\n")

        from alma_memory_spark.sources.ingestion import normalize_directory

        out = (
            normalize_directory(spark, d)
            .select(
                F.element_at(F.split("source_file", "/"), -1).alias("source"),
                "turn",
                "role",
                "text",
            )
            .orderBy("source", "turn")
        )
        probe_plan("chat_ingest_formats", "normalize", out)
        rows = out.collect()
        return _tiny(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)
