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


def blocked_connected_components(
    pairs: DataFrame, block_cols: list[str]
) -> DataFrame:
    """Connected components when every edge lives inside one block
    (similarity self-joins blocked on key columns guarantee this):
    groupBy(block) + per-block union-find in an Arrow batch. ONE shuffle,
    zero iterative jobs — the block is the unit of parallelism, the same
    bound the blocked similarity join already imposes upstream, so this
    scales to any number of blocks. `pairs` must have block_cols + (src,
    dst). Returns (node, cluster_id) as strings for every node that
    appears in an edge (singletons absent — callers coalesce to own id);
    cluster_id is the lexicographic min node id of the component."""
    import pandas as pd

    p = pairs.select(
        *block_cols,
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    block_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in p.schema
        if f.name in block_cols
    )
    out_schema = (block_schema + ", " if block_schema else "") + (
        "node string, cluster_id string"
    )
    bcols = list(block_cols)

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for s, d in zip(pdf["src"], pdf["dst"]):
            if s not in parent:
                parent[s] = s
            if d not in parent:
                parent[d] = d
            rs, rd = find(s), find(d)
            if rs != rd:
                # smaller root wins => component root = min node id
                lo, hi = (rs, rd) if rs < rd else (rd, rs)
                parent[hi] = lo
        nodes = list(parent)
        out = {c: [pdf[c].iloc[0]] * len(nodes) for c in bcols}
        out["node"] = nodes
        out["cluster_id"] = [find(n) for n in nodes]
        return pd.DataFrame(out)

    return p.groupBy(*bcols).applyInPandas(uf, out_schema)


def connected_components(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Connected components by iterative min-id label propagation.
    `nodes`: one column `node`; `pairs`: columns (src, dst), undirected
    semantics. Returns (node, cluster_id). Converges in <= diameter
    iterations — small for near-dup clusters; each iteration is one
    shuffle on node id.

    Each iteration ends in an eager localCheckpoint: the loop references
    `labels` twice per pass, so without lineage truncation the logical
    plan doubles every iteration and the driver OOMs on planning long
    before the data is large. With truncation, cost per iteration is
    flat, so the loop scales to 1000-executor edge sets (for truly huge
    graphs, swap in alternating large-star/small-star for O(log n)
    rounds — diameter of near-dup clusters is small, so min-label wins
    here)."""
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = nodes.withColumn("cluster_id", F.col("node")).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_cluster"))
        )
        stepped = labels.join(nbr_min, labels.node == nbr_min.dst, "left").select(
            "node",
            F.least(
                F.col("cluster_id"), F.coalesce(F.col("nbr_cluster"), F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        # pointer-jump (path halving): node -> label(label(node)); squares
        # the propagation distance so convergence is O(log diameter)
        # rounds instead of O(diameter) — round count, not data volume,
        # dominates iterative jobs.
        jump = stepped.select(
            F.col("node").alias("jnode"), F.col("cluster_id").alias("jcluster")
        )
        new_labels = (
            stepped.join(jump, stepped.cluster_id == jump.jnode, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("jcluster"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        ).localCheckpoint()  # eager: truncates lineage AND materializes
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
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
    O(n^2); at scale the blocks are the unit of parallelism. Edges never
    cross blocks, so components are computed per block with a one-shuffle
    union-find (no iterative jobs)."""
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
        .select(
            *[a[k] for k in key_cols],
            F.col("_ida").alias("src"),
            F.col("_idb").alias("dst"),
        )
    )
    labels = blocked_connected_components(pairs, key_cols).select("node", "cluster_id")
    return (
        df.join(labels, df[id_col].cast("string") == labels.node, "left")
        .drop("node")
        .withColumn(
            "cluster_id",
            F.coalesce(F.col("cluster_id"), F.col(id_col).cast("string")),
        )
    )


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
    ).select(
        F.col("a.project_id").alias("project_id"),
        F.col("a.agent").alias("agent"),
        F.col("a.id").alias("src"),
        F.col("b.id").alias("dst"),
    )
    # containment is not transitive -> close it with connected components
    # (edges stay inside a (project, agent) block -> per-block union-find)
    labels = blocked_connected_components(pairs, ["project_id", "agent"]).select(
        "node", "cluster_id"
    )
    clustered = (
        fails.join(labels, fails.id == labels.node, "left")
        .drop("node")
        .withColumn("cluster_id", F.coalesce("cluster_id", "id"))
    )
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
