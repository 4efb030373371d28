"""Learning layer: outcomes -> heuristics / anti-patterns, write guard.

Reference semantics (re-expressed as distributed aggregations):

- Heuristic extraction (alma/learning/heuristic_extractor.py:110-342):
  group outcomes by (agent, task_type), cluster similar strategies, and
  per cluster emit a heuristic when n >= min_occurrences (3) and the
  cluster's confidence >= 0.5, with
  success_rate = successes / n and
  confidence = success_rate * (0.5 + 0.5 * min(n / 20, 1)).
  The reference's greedy first-match clustering is order-dependent; here
  clustering is a deterministic similarity self-join + connected
  components via iterative min-propagation (documented deviation: same
  clusters on transitive similarity, stable under parallelism).

- Anti-pattern creation (protocols.py:231-279): >= 2 failures with
  similar error (substring containment) -> AntiPattern with
  occurrence_count = n.

- Write guard (alma/learning/write_guard.py): a save is blocked when any
  of (task, strategy, error) matches a stored anti-pattern by normalized
  substring containment either way, or token overlap >= 0.45 of the
  pattern's tokens. Implemented as a broadcast join against the (small)
  anti-pattern set — a pre-write filter, not a per-row RPC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alma_memory_spark.functions.vector import cosine_similarity

MIN_OCCURRENCES = 3
MIN_CONFIDENCE = 0.5
STRATEGY_SIM_THRESHOLD = 0.75  # embedding cosine (protocols.py similarity_threshold)
GUARD_TOKEN_OVERLAP = 0.45


def _norm(col: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def _guard_tokens(col: Column) -> Column:
    """Tokens of >= 3 chars (write_guard.py _tokens)."""
    return F.array_distinct(
        F.filter(
            F.split(_norm(col), "[^a-z0-9_]+"),
            lambda t: F.length(t) >= 3,
        )
    )


def connected_components(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 10
) -> DataFrame:
    """Connected components by iterative min-id label propagation.
    `nodes`: one column `node`; `pairs`: columns (src, dst), undirected
    semantics. Returns (node, cluster_id). Converges in <= diameter
    iterations — small for near-dup clusters; each iteration is one
    shuffle on node id."""
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    labels = nodes.withColumn("cluster_id", F.col("node"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_cluster"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_cluster"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels.cache()
        if changed == 0:
            break
    return labels


def cluster_by_similarity(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
    embedding_col: str = "embedding",
    threshold: float = STRATEGY_SIM_THRESHOLD,
    max_iter: int = 10,
) -> DataFrame:
    """Deterministic similarity clustering within groups: similarity
    self-join (cosine >= threshold) -> connected components. Returns df
    + `cluster_id`.

    The self-join is blocked on key_cols, so cost is O(group^2) not
    O(n^2); at scale the blocks are the unit of parallelism."""
    a = df.select(*key_cols, F.col(id_col).alias("_ida"), F.col(embedding_col).alias("_ea"))
    b = df.select(*key_cols, F.col(id_col).alias("_idb"), F.col(embedding_col).alias("_eb"))
    cond = None
    for k in key_cols:
        c = a[k] == b[k]
        cond = c if cond is None else (cond & c)
    pairs = (
        a.join(b, cond)
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cosine_similarity("_ea", "_eb") >= threshold)
        .select(F.col("_ida").alias("src"), F.col("_idb").alias("dst"))
    )
    labels = connected_components(
        df.select(F.col(id_col).alias("node")), pairs, max_iter
    )
    return df.join(labels, df[id_col] == labels.node).drop("node")


def extract_heuristics(
    outcomes: DataFrame,
    min_occurrences: int = MIN_OCCURRENCES,
    min_confidence: float = MIN_CONFIDENCE,
    similarity_threshold: float = STRATEGY_SIM_THRESHOLD,
) -> DataFrame:
    """Batch heuristic extraction: per (project, agent, task_type,
    strategy-cluster): n, successes, success_rate, confidence; keep
    clusters passing the thresholds. Returns heuristic candidate rows
    (the reference's update-or-create then applies upsert-by-id)."""
    clustered = cluster_by_similarity(
        outcomes.filter(F.col("strategy_used").isNotNull()),
        ["project_id", "agent", "task_type"],
        threshold=similarity_threshold,
    )
    n = F.count("*")
    succ = F.sum(F.when(F.col("success"), 1).otherwise(0))
    rate = succ.cast("double") / n
    conf = rate * (F.lit(0.5) + F.lit(0.5) * F.least(n / F.lit(20.0), F.lit(1.0)))
    return (
        clustered.groupBy("project_id", "agent", "task_type", "cluster_id")
        .agg(
            n.alias("occurrence_count"),
            succ.cast("int").alias("success_count"),
            rate.alias("success_rate"),
            conf.alias("confidence"),
            # lexicographic-min representative: stable as the cluster
            # grows across incremental learns (a min-row-id would shift)
            F.min("strategy_used").alias("strategy"),
            F.max("timestamp").alias("last_validated"),
            F.min("timestamp").alias("created_at"),
        )
        .filter(
            (F.col("occurrence_count") >= min_occurrences)
            & (F.col("confidence") >= min_confidence)
            & (F.col("success_rate") > 0.5)
        )
        .withColumn("condition", F.concat(F.lit("task type: "), F.col("task_type")))
        .withColumn(
            "id",
            F.concat(
                F.lit("heur_"),
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", "project_id", "agent", "task_type", "strategy"
                        )
                    ),
                    1,
                    12,
                ),
            ),
        )
        .drop("cluster_id")
    )


def extract_anti_patterns(outcomes: DataFrame, min_failures: int = 2) -> DataFrame:
    """Anti-pattern creation: failures whose errors are mutually similar
    (substring containment, protocols.py:424-429) grouped; >= 2 similar
    failures -> candidate. Containment clustering via normalized-prefix
    grouping would miss mid-string containment, so we self-join on
    containment within (project, agent) — failure sets are small."""
    fails = outcomes.filter(
        (~F.col("success")) & F.col("error_message").isNotNull()
    ).select(
        "project_id",
        "agent",
        "id",
        "task_description",
        "strategy_used",
        _norm(F.col("error_message")).alias("err"),
        "timestamp",
    )
    a = fails.alias("a")
    b = fails.alias("b")
    sim = F.col("a.err").contains(F.col("b.err")) | F.col("b.err").contains(
        F.col("a.err")
    )
    pairs = a.join(
        b,
        (F.col("a.project_id") == F.col("b.project_id"))
        & (F.col("a.agent") == F.col("b.agent"))
        & (F.col("a.id") < F.col("b.id"))
        & sim,
    ).select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    # containment is not transitive -> close it with connected components
    labels = connected_components(fails.select(F.col("id").alias("node")), pairs)
    clustered = fails.join(labels, fails.id == labels.node).drop("node")
    return (
        clustered.groupBy("project_id", "agent", "cluster_id")
        .agg(
            F.count("*").alias("occurrence_count"),
            # shortest error is the cluster's "core" pattern and stays
            # stable as longer variants join (content-stable identity)
            F.min("strategy_used").alias("pattern"),
            F.min(F.struct(F.length("err").alias("l"), F.col("err").alias("e")))
            .getField("e")
            .alias("why_bad"),
            F.max("timestamp").alias("last_seen"),
            F.min("timestamp").alias("created_at"),
        )
        .filter(F.col("occurrence_count") >= min_failures)
        .withColumn(
            "id",
            F.concat(
                F.lit("anti_"),
                F.substring(
                    F.md5(F.concat_ws("|", "project_id", "agent", "why_bad")), 1, 12
                ),
            ),
        )
        .withColumn("occurrence_count", F.col("occurrence_count").cast("int"))
        .withColumn("better_alternative", F.lit(None).cast("string"))
        .drop("cluster_id")
    )


def write_guard_filter(
    candidates: DataFrame,
    anti_patterns: DataFrame,
    text_cols: list[str],
    pattern_col: str = "pattern",
) -> tuple[DataFrame, DataFrame]:
    """Split candidate rows into (allowed, blocked) against stored
    anti-patterns (write_guard.py semantics: normalized substring
    containment either way, or token overlap >= 0.45 of pattern tokens).
    Anti-join against a broadcast pattern set: O(n * |patterns|) map-side,
    no shuffle of the candidate side."""
    pats = anti_patterns.select(
        F.col("id").alias("_ap_id"),
        _norm(F.col(pattern_col)).alias("_ap_text"),
        _guard_tokens(F.col(pattern_col)).alias("_ap_toks"),
    )
    blob = _norm(F.concat_ws("  ", *[F.coalesce(F.col(c), F.lit("")) for c in text_cols]))
    cand = candidates.withColumn("_blob", blob).withColumn(
        "_toks", _guard_tokens(F.col("_blob"))
    )
    joined = cand.crossJoin(F.broadcast(pats))
    overlap = F.size(F.array_intersect("_toks", "_ap_toks")).cast("double") / F.greatest(
        F.size("_ap_toks").cast("double"), F.lit(1.0)
    )
    hit = (
        F.col("_blob").contains(F.col("_ap_text"))
        | F.col("_ap_text").contains(F.col("_blob"))
        | (overlap >= GUARD_TOKEN_OVERLAP)
    )
    blocked_ids = joined.filter(hit).select(F.col("id"), F.col("_ap_id")).distinct()
    blocked = candidates.join(blocked_ids.select("id").distinct(), "id", "left_semi")
    allowed = candidates.join(blocked_ids.select("id").distinct(), "id", "left_anti")
    return allowed, blocked
