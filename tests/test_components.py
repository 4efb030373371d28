"""Global connected components (alternating large-star/small-star) vs a
driver-side union-find reference."""

import random

from alma_memory_spark.operators.components import (
    connected_components,
    near_dup_groups,
)
from alma_memory_spark.session import tiny_df


def _uf_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _spark_labels(spark, edges, typ="long", **kw):
    df = tiny_df(spark, edges, f"src {typ}, dst {typ}")
    got = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in got}


def test_cc_random_graphs_match_union_find(spark):
    # both exits: the small-graph driver finish (default) and the fully
    # distributed star-contraction loop (driver_finish_edges=0)
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(5, 60)
        m = rng.randint(0, n * 2)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        want = _uf_labels(edges)
        assert _spark_labels(spark, edges) == want, trial
        kw = {"driver_finish_edges": 0}
        assert _spark_labels(spark, edges, **kw) == want, trial


def test_cc_long_chain_converges_in_log_rounds(spark):
    # a 64-node path has diameter 63; label propagation would need 63
    # rounds, the alternating algorithm O(log n) — max_iter=10 passing
    # proves the log-round behavior, not just termination
    edges = [(i, i + 1) for i in range(63)]
    df = tiny_df(spark, edges, "src long, dst long")
    got = connected_components(
        df, max_iter=10, driver_finish_edges=0
    ).collect()
    assert {r["node"] for r in got} == set(range(64))
    assert {r["component"] for r in got} == {0}


def test_cc_string_ids_and_self_loops(spark):
    edges = [("b", "a"), ("c", "b"), ("x", "x"), ("z", "y")]
    df = tiny_df(spark, edges, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    # the pure self-loop node never appears (no real edge)
    assert got == {"a": "a", "b": "a", "c": "a", "y": "y", "z": "y"}


def test_cc_empty_edges(spark):
    df = tiny_df(spark, [], "src long, dst long")
    assert connected_components(df).count() == 0


def test_near_dup_groups_canonical_flags(spark):
    pairs = [(2, 1), (3, 2), (9, 8)]
    df = tiny_df(spark, pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: (r["group_id"], r["is_canonical"])
        for r in near_dup_groups(df).collect()
    }
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        8: (8, True),
        9: (8, False),
    }


def test_cc_nonconvergence_raises_not_mislabels(spark):
    # a partially contracted graph is not a star forest; the operator
    # must refuse to read labels off it
    import pytest as _pytest

    edges = [(i, i + 1) for i in range(63)]
    df = tiny_df(spark, edges, "src long, dst long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1, driver_finish_edges=0)
