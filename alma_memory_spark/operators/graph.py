"""Property graph: vertices/edges DataFrames, k-hop traversal, bitemporal
as-of queries.

Reference (alma/graph/store.py): entities + relationships with
confidence and validity interval (valid_from / valid_to); var-length
traversal 1..max_hops with optional relation-type filter
(store.py:355-411); as-of filtering valid_from <= t AND (valid_to IS
NULL OR valid_to >= t) (store.py:535-559).

Spark shape: iterative frontier expansion — hop h joins the frontier to
the edge table and unions into the visited set. max_hops defaults to 2
(reference default), so this is <= 2 broadcast-able joins, not a general
graph engine; GraphFrames would slot in behind the same API if present.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alma_memory_spark.functions.temporal import valid_as_of


def edges_as_of(relationships: DataFrame, at: datetime) -> DataFrame:
    """Bitemporal as-of filter on the edge set."""
    return relationships.filter(valid_as_of("valid_from", "valid_to", at))


def k_hop_neighbors(
    relationships: DataFrame,
    start_ids: list[str],
    max_hops: int = 2,
    relation_types: list[str] | None = None,
    at: datetime | None = None,
    directed: bool = False,
) -> DataFrame:
    """Entity ids reachable within 1..max_hops of any start id.

    Returns (id, hop) with the minimal hop count. Undirected traversal
    mirrors the reference's default Cypher `-[r*1..n]-` pattern."""
    edges = relationships
    if at is not None:
        edges = edges_as_of(edges, at)
    if relation_types:
        edges = edges.filter(F.col("relation_type").isin(relation_types))
    fwd = edges.select(F.col("source_id").alias("src"), F.col("target_id").alias("dst"))
    e = fwd if directed else fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    e = e.distinct()

    spark = relationships.sparkSession
    from alma_memory_spark.session import tiny_df

    frontier = tiny_df(spark, [(i,) for i in start_ids], "id string")
    visited = frontier.withColumn("hop", F.lit(0))
    # Fixed-depth expansion with NO per-hop driver round-trip: max_hops
    # is a small contract bound (reference default 2), and an exhausted
    # frontier simply yields empty joins for the remaining hops — the
    # whole traversal stays ONE lazily-built plan executed by the
    # caller's single action. Deliberately NOT cached: a session-lived
    # .cache() per hop would accumulate executor storage across calls
    # with nothing ever releasing it, and at depth <= 2-3 the doubled
    # lineage recompute is cheaper than that leak. Deep traversals
    # should pass a checkpointed edge frame instead.
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, e.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        visited = visited.unionByName(nxt)
        frontier = nxt.select("id")
    return visited.filter(F.col("hop") > 0)


def neighborhood(
    entities: DataFrame,
    relationships: DataFrame,
    start_ids: list[str],
    max_hops: int = 2,
    relation_types: list[str] | None = None,
    at: datetime | None = None,
) -> DataFrame:
    """k-hop neighbor entities with their rows + hop distance."""
    hops = k_hop_neighbors(relationships, start_ids, max_hops, relation_types, at)
    return entities.join(hops, "id")


def relationships_as_of(
    relationships: DataFrame,
    at: datetime,
    source_id: str | None = None,
    relation_types: list[str] | None = None,
) -> DataFrame:
    """The reference's get_relationships_as_of (store.py:535-559)."""
    out = edges_as_of(relationships, at)
    if source_id is not None:
        out = out.filter(
            (F.col("source_id") == source_id) | (F.col("target_id") == source_id)
        )
    if relation_types:
        out = out.filter(F.col("relation_type").isin(relation_types))
    return out
