"""Gate queries for the remaining SURVEY §2 rows that lacked a
driver-checked oracle entry: memory-health metrics, entity detection,
workflow state reducers, and MMR diversification (greedy selection,
oracle via its closed form — see mmr_diversify)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alma_memory_spark.session import tiny_df as _tiny
from alma_memory_spark.plans.registry import (
    _COS_SQL,
    _QV_SQL,
    NOW,
    QUERY_VEC,
    _now,
    _r6,
    _t,
    register,
)

STALE_CUTOFF = "2024-01-01 00:00:00"
WEAK_VALUE = 10.0
ENTITY_RE = "[A-Z][a-z]+"


@register(
    "scope_health_reducers",
    f"""
    SELECT user_id,
           count(*) AS total,
           count(*) FILTER (WHERE value < {WEAK_VALUE}) AS weak_count,
           count(*) FILTER (WHERE ts < TIMESTAMP '{STALE_CUTOFF}') AS stale_count,
           round(count(*) FILTER (WHERE value < {WEAK_VALUE}) * 1.0 / count(*), 6) AS weak_ratio,
           round(count(*) FILTER (WHERE ts < TIMESTAMP '{STALE_CUTOFF}') * 1.0 / count(*), 6) AS stale_ratio,
           CAST(sum(value::DECIMAL(18,4)) AS DOUBLE) AS sum_value,
           max(value) AS max_value,
           min(value) AS min_value,
           count(DISTINCT event_type) AS union_size
    FROM events
    GROUP BY user_id
    """,
)
def scope_health_reducers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite gate: health metrics AND the workflow state reducers
    from ONE keyed aggregation pass (merged r3 from health_metrics +
    state_reducers — both green, merged per the r2 verdict to fit the
    50-query correctness cap; the merged form is also the better plan:
    one map-side-combinable shuffle instead of two).

    Health columns — per-scope totals plus weak/stale ratios against
    thresholds (reference: MemoryHealthMonitor,
    alma/learning/forgetting.py:873-1208 — weak = strength below
    threshold, stale = not accessed since cutoff).
    Reducer columns — the sum / max / min / union / append merge
    strategies for parallel branch states (reference:
    alma/workflow/reducers.py:50-235); union -> distinct cardinality,
    append -> the `total` row count; DECIMAL sum keeps the distributed
    fold order-independent."""
    ev = _t(spark, sf_dir, "events")
    weak = F.count(F.when(F.col("value") < WEAK_VALUE, 1))
    stale = F.count(F.when(F.col("ts") < F.to_timestamp(F.lit(STALE_CUTOFF)), 1))
    return ev.groupBy("user_id").agg(
        F.count("*").alias("total"),
        weak.alias("weak_count"),
        stale.alias("stale_count"),
        _r6(weak * F.lit(1.0) / F.count("*")).alias("weak_ratio"),
        _r6(stale * F.lit(1.0) / F.count("*")).alias("stale_ratio"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.count_distinct("event_type").alias("union_size"),
    )


def _markers_sql(low: str, markers: list[str]) -> str:
    terms = " + ".join(
        "(CASE WHEN position('{m}' IN {low}) > 0 THEN 1 ELSE 0 END)".format(
            m=m.replace("'", "''"), low=low
        )
        for m in markers
    )
    return f"(({terms}) * 1.0 / {len(markers)})"


def _chunk_classify_sql() -> str:
    from alma_memory_spark.sources.ingestion import (
        CHUNK_CHARS,
        CHUNK_OVERLAP,
        MIN_EXTRACT_CONFIDENCE,
        TYPE_MARKERS,
    )

    step = CHUNK_CHARS - CHUNK_OVERLAP
    scores = {t: _markers_sql("low", ms) for t, ms in TYPE_MARKERS.items()}
    best = "greatest(" + ", ".join(f"s_{t}" for t in scores) + ")"
    type_case = (
        "CASE "
        + " ".join(f"WHEN s_{t} = best THEN '{t}'" for t in scores)
        + " END"
    )
    score_cols = ",\n             ".join(f"{e} AS s_{t}" for t, e in scores.items())
    return f"""
    WITH chunks AS (
      SELECT doc_id, substring(text, s, {CHUNK_CHARS}) AS chunk
      FROM documents,
           LATERAL unnest(generate_series(
             1, greatest(length(text) - {CHUNK_OVERLAP}, 1), {step})) AS t(s)
    ), scored AS (
      SELECT doc_id, chunk,
             {score_cols}
      FROM (SELECT doc_id, chunk, lower(chunk) AS low FROM chunks)
    ), ranked AS (
      SELECT doc_id, chunk, {best} AS best,
             s_{list(scores)[0]}, s_{list(scores)[1]}, s_{list(scores)[2]}, s_{list(scores)[3]}
      FROM scored
    )
    SELECT doc_id, chunk,
           round(least(best * 2.0, 1.0), 6) AS extract_confidence,
           CASE WHEN round(least(best * 2.0, 1.0), 6) >= {MIN_EXTRACT_CONFIDENCE}
                THEN {type_case} END AS memory_type
    FROM ranked
    """


@register("chunk_classify", _chunk_classify_sql())
def chunk_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-mining ingestion pipeline: overlapping character chunking
    (sequence + substr, no UDF) -> marker-rule classification into the
    five memory types with confidence = matched-marker fraction, kept at
    >= 0.3 (reference: chunker alma/ingestion/file_miner.py:119, rule
    classifier alma/ingestion/memory_extractor.py:373-493). Explode
    inflates by ~len/900 — bounded, and everything stays whole-stage
    codegen; ties pick the first type in declaration order on BOTH
    sides."""
    from alma_memory_spark.sources.ingestion import chunk_text_df, classify_chunks

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_text_df(docs)
    return classify_chunks(chunks).select(
        "doc_id", "chunk", "extract_confidence", "memory_type"
    )


def _compression_sql() -> str:
    from alma_memory_spark.operators.compression import (
        LEVEL_SENTENCES,
        MIN_LENGTH_FOR_COMPRESSION,
    )

    from alma_memory_spark.functions.text import SQL_WS_RE

    budget = LEVEL_SENTENCES["medium"]
    # SQL_WS_RE is the explicit whitespace class shared with the Spark
    # side (Java \s includes \x0B, RE2 does not; functions/text.py)
    return rf"""
    WITH c AS (
      SELECT doc_id, text,
             string_split(
               regexp_replace(text, '([.!?]){SQL_WS_RE}', '\1' || chr(1), 'g'), chr(1)
             ) AS sents
      FROM documents
    ), o AS (
      SELECT doc_id,
             CASE WHEN length(text) < {MIN_LENGTH_FOR_COMPRESSION} THEN text
                  ELSE array_to_string(sents[1:{budget}], ' ') END AS compressed,
             length(text) AS original_length
      FROM c
    )
    SELECT doc_id, compressed,
           round(original_length * 1.0 / greatest(length(compressed), 1), 6)
             AS compression_ratio
    FROM o
    """


@register("compression_stats", _compression_sql())
def compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based compression, batch column form (reference:
    alma/compression/pipeline.py — levels none/light/medium/heavy, pass
    through below min_length 200, deterministic non-LLM default): keep
    the first `budget` sentences, report the compression ratio. Pure
    column expressions (regex sentence split + slice) — scan-speed on
    100 TB; the oracle splits via replace-then-split because RE2 lacks
    lookbehind, which is equivalent for any input."""
    from alma_memory_spark.operators.compression import compress_column

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return compress_column(docs, "text", "medium").select(
        "doc_id", "compressed", "compression_ratio"
    )


_XV_CONF_SQL = "round((vec_id % 100) / 100.0, 6)"


@register(
    "cross_verify",
    f"""
    WITH m AS (
      SELECT vec_id AS id,
             vec_id % 5 AS domain,
             {_XV_CONF_SQL} AS confidence,
             list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), pairs AS (
      SELECT a.id AS id, min(b.id) AS contradicting_source
      FROM m a JOIN m b
        ON a.domain = b.domain AND a.id <> b.id AND b.confidence > a.confidence
      WHERE round(
              list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i]))
              / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                 * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) < -0.2
      GROUP BY a.id
    )
    SELECT m.id, m.confidence,
           CASE WHEN p.contradicting_source IS NOT NULL THEN 'contradicted'
                WHEN m.confidence >= 0.7 THEN 'verified'
                ELSE 'uncertain' END AS verification_status,
           m.confidence AS verification_confidence,
           p.contradicting_source,
           CASE WHEN p.contradicting_source IS NOT NULL THEN 'cross_verify'
                ELSE 'confidence' END AS verification_method
    FROM m LEFT JOIN pairs p ON m.id = p.id
    """,
)
def cross_verify_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-verification (reference: alma/retrieval/verification.py:
    623-729 — each candidate vs its same-domain peers; the deterministic
    non-LLM analog flags `contradicted` when a strictly
    higher-confidence peer's embedding points the opposite way, cosine
    < -0.2; else the confidence fallback classifies
    verified/uncertain). Blocked self-join + min-peer aggregation —
    fully declarative, same scaling shape as consolidation. Synthetic
    memory frame: id = vec_id, domain = vec_id % 5, confidence =
    (vec_id % 100)/100."""
    from datetime import datetime, timezone

    from alma_memory_spark.operators.verification import cross_verify

    emb = _t(spark, sf_dir, "embeddings")
    mem = emb.select(
        F.col("vec_id").alias("id"),
        F.lit("p").alias("project_id"),
        (F.col("vec_id") % 5).alias("domain"),
        _r6((F.col("vec_id") % 100) / F.lit(100.0)).alias("confidence"),
        "embedding",
    )
    out = cross_verify(mem, now=datetime(2024, 2, 15, tzinfo=timezone.utc))
    return out.select(
        "id",
        "confidence",
        "verification_status",
        F.col("verification_confidence").alias("verification_confidence"),
        "contradicting_source",
        "verification_method",
    )


@register(
    "mmr_diversify",
    f"""
    WITH qv AS (SELECT {_QV_SQL} AS q),
    cand AS (
      SELECT vec_id, {_COS_SQL} AS similarity
      FROM embeddings, qv
      ORDER BY similarity DESC, vec_id ASC
      LIMIT 50
    ),
    head AS (
      SELECT vec_id, similarity FROM cand
      ORDER BY similarity DESC, vec_id ASC LIMIT 1
    ),
    rest AS (
      SELECT c.vec_id, c.similarity,
             c.similarity - 0.3 * sqrt(greatest(c.similarity, 0.0)
                                       * greatest(h.similarity, 0.0)) AS val
      FROM cand c, head h
      WHERE c.vec_id <> h.vec_id
    ),
    ranked AS (
      SELECT vec_id, similarity,
             1 + row_number() OVER (ORDER BY val DESC, similarity DESC, vec_id ASC)
               AS mmr_rank
      FROM rest
    )
    SELECT CAST(mmr_rank AS INT) AS mmr_rank, vec_id, similarity FROM (
      SELECT 1 AS mmr_rank, vec_id, similarity FROM head
      UNION ALL
      SELECT mmr_rank, vec_id, similarity FROM ranked WHERE mmr_rank <= 10
    ) ORDER BY mmr_rank
    """,
)
def mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification end-to-end: distributed exact cosine top-50
    candidate stage, then the driver-side greedy re-order
    next = argmax(score - lambda * max_sim_to_selected) with pairwise
    sim estimated as sqrt(sim_a * sim_b) (reference:
    alma/retrieval/engine.py:639-715). Inherently sequential over <= 50
    collected rows — the one deliberately non-distributed operator,
    applied AFTER the distributed top-k.

    Oracle: with the sqrt(sim_a*sim_b) estimate the greedy collapses to
    a closed form — the first pick is the global argmax s1, and because
    every later selection has sim <= s1, each candidate's penalty is the
    CONSTANT lambda*sqrt(max(s,0)*max(s1,0)); ranks 2..k are therefore a
    single sort by (s - penalty) desc with the original
    (similarity desc, vec_id asc) order as tiebreak (Python's strict `>`
    keeps the first remaining index on ties). The SQL derives the same
    ranking independently, making this a hash-checked gate at any SF."""
    from alma_memory_spark.functions.vector import cosine_similarity
    from alma_memory_spark.operators.mmr import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    qlit = F.array(*[F.lit(float(x)) for x in QUERY_VEC])
    cand = (
        emb.select(
            "vec_id", _r6(cosine_similarity("embedding", qlit)).alias("similarity")
        )
        .orderBy(F.desc("similarity"), F.asc("vec_id"))
        .limit(50)
    )
    rows = [r.asDict() for r in cand.collect()]
    for r in rows:
        r["score"] = r["similarity"]
    picked = mmr_rerank(rows, diversity_factor=0.3, top_k=10, sim_key="similarity")
    out = [
        (i + 1, r["vec_id"], float(r["similarity"])) for i, r in enumerate(picked)
    ]
    return _tiny(spark, out, "mmr_rank INT, vec_id BIGINT, similarity DOUBLE")


ARCHIVE_CUTOFF = "2024-01-15 00:00:00"


@register(
    "archive_restore_roundtrip",
    f"""
    SELECT CAST(event_id AS VARCHAR) AS id,
           'domain_knowledge' AS memory_type,
           'u' || CAST(user_id % 5 AS VARCHAR) AS agent,
           'p' AS project_id,
           'decay' AS archive_reason,
           round(value, 6) AS value
    FROM events
    WHERE user_id = 7 AND ts < TIMESTAMP '{ARCHIVE_CUTOFF}' AND event_id % 10 <> 0
    ORDER BY id
    """,
)
def archive_restore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive -> restore round-trip through the REAL ParquetStore
    (reference: base.py:991-1128): seed a live table from events
    (user 7's slice), archive() rows older than the cutoff (anti-join
    rewrite + JSON-payload append to archived_memories), then
    restore_from_archive() every archived id divisible by 10. The gate
    returns the final archive table — ids, scope columns, reason, and
    the `value` field extracted back OUT of the JSON payload — and the
    oracle recomputes that end state straight from events, so the
    append/anti-join/payload/restore semantics are all hash-checked."""
    import shutil
    import tempfile

    from alma_memory_spark.sources.store import ParquetStore

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") == 7)
    live = ev.select(
        F.col("event_id").cast("string").alias("id"),
        F.concat(F.lit("u"), (F.col("user_id") % 5).cast("string")).alias("agent"),
        F.lit("p").alias("project_id"),
        F.col("value"),
        F.col("ts"),
    )
    root = tempfile.mkdtemp(prefix="alma_archive_gate_")
    try:
        store = ParquetStore(spark, root)
        store.append("domain_knowledge", live)
        store.archive(
            "domain_knowledge",
            F.col("ts") < F.to_timestamp(F.lit(ARCHIVE_CUTOFF)),
            reason="decay",
        )
        restore_ids = [
            r["id"]
            for r in store.read("archived_memories")
            .filter((F.col("id").cast("long") % 10) == 0)
            .select("id")
            .collect()
        ]
        if restore_ids:
            store.restore_from_archive(restore_ids)
        out = (
            store.read("archived_memories")
            .select(
                "id",
                "memory_type",
                "agent",
                "project_id",
                "archive_reason",
                _r6(F.get_json_object("content", "$.value").cast("double")).alias(
                    "value"
                ),
            )
            .orderBy("id")
        )
        rows = out.collect()  # materialize before the temp dir vanishes
        return _tiny(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "entity_detection",
    f"""
    WITH n AS (
      SELECT count(*) FILTER (WHERE doc_id % 3 = 0) AS n3,
             count(*) FILTER (WHERE doc_id % 4 = 0) AS n4,
             count(*) FILTER (WHERE doc_id % 5 = 0) AS n5
      FROM documents
    )
    SELECT 'candidates' AS stage, entity AS name,
           count(*) AS frequency, count(DISTINCT doc_id) AS n_docs,
           CAST(NULL AS BIGINT) AS person_signals,
           CAST(NULL AS BIGINT) AS project_signals,
           CAST(NULL AS VARCHAR) AS entity_type
    FROM (
      SELECT doc_id, unnest(regexp_extract_all(text, '{ENTITY_RE}')) AS entity
      FROM documents
    )
    GROUP BY entity
    HAVING count(*) >= 3
    UNION ALL
    SELECT 'full', name, frequency, CAST(NULL AS BIGINT), person_signals,
           project_signals, entity_type
    FROM (
      SELECT 'Helena' AS name, n3 AS frequency, n3 AS person_signals,
             CAST(0 AS BIGINT) AS project_signals, 'person' AS entity_type FROM n
      UNION ALL
      SELECT 'Spark', n4, CAST(0 AS BIGINT), n4, 'tool' FROM n
      UNION ALL
      SELECT 'Vector Database', n5, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'concept' FROM n
      UNION ALL
      SELECT 'Vector', n5, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'concept' FROM n
      UNION ALL
      SELECT 'Database', n5, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'concept' FROM n
    )
    UNION ALL
    SELECT 'graph', source || '->' || target, weight, n_docs,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 'RELATED_TO'
    FROM (
      SELECT p.a AS source, p.b AS target,
             count(*) AS weight, count(DISTINCT doc_id) AS n_docs
      FROM (
        SELECT ge.doc_id, ua.a, ub.b
        FROM (
          SELECT doc_id,
                 list_distinct(regexp_extract_all(sent, '{ENTITY_RE}')) AS es
          FROM (
            SELECT doc_id, unnest(string_split_regex(
              text
              || CASE WHEN doc_id % 3 = 0 THEN ' Helena said hello' ELSE '' END
              || CASE WHEN doc_id % 4 = 0 THEN ' please use Spark version two' ELSE '' END
              || CASE WHEN doc_id % 5 = 0 THEN ' about Vector Database design' ELSE '' END,
              '[.!?]')) AS sent
            FROM documents
          )
          WHERE len(regexp_extract_all(sent, '{ENTITY_RE}')) > 0
        ) ge, LATERAL unnest(ge.es) AS ua(a), LATERAL unnest(ge.es) AS ub(b)
        WHERE ua.a < ub.b
      ) p
      GROUP BY p.a, p.b
    )
    """,
)
def entity_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite gate: BOTH entity-detection stages (merged r3 from
    entity_candidates + entity_detection_full, both driver-green in r2,
    to fit the 50-query correctness cap).

    'candidates' rows — frequency stage over the BASE corpus: candidate
    capitalized tokens with corpus frequency >= min_frequency 3
    (reference: alma/extraction/entity_detector.py:401-728).
    regexp_extract_all + explode keeps tokenization JVM-side; the
    all-lowercase base corpus provably yields zero candidates — the
    empty-result path is itself checked.
    'full' rows — the FULL pipeline (frequency candidates +
    name-adjacent signal scoring + person/tool/concept classification)
    on a corpus with injected ground truth: deterministic entity
    sentences added by doc_id arithmetic ('Helena said ...' -> person
    dialogue signal, 'Spark version' -> project signal, 'Vector
    Database' -> multi-word candidate with no signals -> concept). The
    oracle derives every frequency and signal count ARITHMETICALLY from
    the same doc_id predicates — an independent derivation that breaks
    if extraction, the dynamic per-name signal regexes, or the
    classification rule drift."""
    from alma_memory_spark.operators.entities import detect_entities

    docs = _t(spark, sf_dir, "documents")
    candidates = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(ENTITY_RE), 0)
            ).alias("entity"),
        )
        .groupBy("entity")
        .agg(
            F.count("*").alias("frequency"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("frequency") >= 3)
        .select(
            F.lit("candidates").alias("stage"),
            F.col("entity").alias("name"),
            "frequency",
            "n_docs",
            F.lit(None).cast("long").alias("person_signals"),
            F.lit(None).cast("long").alias("project_signals"),
            F.lit(None).cast("string").alias("entity_type"),
        )
    )
    text2 = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" Helena said hello")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 4 == 0, F.lit(" please use Spark version two")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit(" about Vector Database design")
        ).otherwise(F.lit("")),
    )
    full = detect_entities(docs.select("doc_id", text2.alias("text"))).select(
        F.lit("full").alias("stage"),
        "name",
        F.col("frequency").cast("long").alias("frequency"),
        F.lit(None).cast("long").alias("n_docs"),
        F.col("person_signals").cast("long").alias("person_signals"),
        F.col("project_signals").cast("long").alias("project_signals"),
        "entity_type",
    )
    # 'graph' rows — text -> property-graph extraction over the same
    # injected corpus (reference: alma/graph/extraction.py:86-183, the
    # LLM provider env-gated; deterministic sentence co-occurrence is
    # the batch default): within-sentence entity pairs become
    # RELATED_TO edges with co-occurrence weight + doc reach, oracled
    # by the same unnest derivation in DuckDB.
    from alma_memory_spark.operators.entities import extract_graph

    _, rels = extract_graph(docs.select("doc_id", text2.alias("text")))
    graph = rels.select(
        F.lit("graph").alias("stage"),
        F.concat(F.col("source"), F.lit("->"), F.col("target")).alias("name"),
        F.col("weight").cast("long").alias("frequency"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("person_signals"),
        F.lit(None).cast("long").alias("project_signals"),
        F.col("relation_type").alias("entity_type"),
    )
    return candidates.unionByName(full).unionByName(graph)
