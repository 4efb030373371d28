"""Measured scale-up for global connected components (SCALE.md r6).

Generates synthetic near-dup edge sets of growing size with a
worst-case mix (long chains — the diameter killer for label
propagation — plus broad star families and random clutter), runs
`connected_components`, and records rounds-to-convergence, wall time,
and label correctness vs a driver union-find. The point to prove is
the O(log n) round count: edges x100 should add ~constant rounds, not
rounds x100.

Run:  python scripts/measure_cc.py
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alma_memory_spark.operators import components as C  # noqa: E402
from alma_memory_spark.session import get_spark, tiny_df  # noqa: E402


def make_edges(n_nodes: int, rng: random.Random) -> list[tuple[int, int]]:
    edges = []
    # one long chain over the first third (diameter ~ n/3)
    third = n_nodes // 3
    edges += [(i, i + 1) for i in range(third - 1)]
    # star families over the middle third
    for c in range(third, 2 * third, 50):
        edges += [(c, c + j) for j in range(1, min(50, 2 * third - c))]
    # random clutter over the last third
    for _ in range(third):
        a = rng.randrange(2 * third, n_nodes)
        b = rng.randrange(2 * third, n_nodes)
        if a != b:
            edges.append((a, b))
    return edges


def uf_labels(edges):
    parent: dict[int, int] = {}

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
    comp: dict[int, list[int]] = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def main() -> None:
    spark = get_spark("measure-cc", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    rng = random.Random(7)
    results = []
    # count rounds by patching the star steps
    orig_small = C._small_star
    rounds = {"n": 0}

    def counting_small(e):
        rounds["n"] += 1
        return orig_small(e)

    C._small_star = counting_small
    try:
        for n_nodes in (1_000, 10_000, 100_000):
            edges = make_edges(n_nodes, rng)
            df = tiny_df(spark, edges, "src long, dst long")
            rounds["n"] = 0
            t0 = time.time()
            got = {
                r["node"]: r["component"]
                for r in C.connected_components(
                    df, driver_finish_edges=0
                ).collect()
            }
            dt = time.time() - t0
            ok = got == uf_labels(edges)
            results.append(
                {
                    "nodes": n_nodes,
                    "edges": len(edges),
                    "rounds": rounds["n"],
                    "sec": round(dt, 2),
                    "correct": ok,
                }
            )
            print(json.dumps(results[-1]))
    finally:
        C._small_star = orig_small
    print(json.dumps({"cc_scaleup": results}))


if __name__ == "__main__":
    main()
