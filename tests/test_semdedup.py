"""SemDeDup-shape semantic dedup: quantizer reuse, cross-cell family
merge, determinism under repartition."""

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from alma_memory_spark.operators.semdedup import (
    semantic_dedup_groups,
    semantic_dedup_pairs,
    stride_centroids,
)
from alma_memory_spark.session import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["cos_sim"]) for r in df.collect()}


def test_pairs_stable_under_repartition(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    a = _pairs(semantic_dedup_pairs(emb, threshold=0.4, cent_every=50))
    b = _pairs(
        semantic_dedup_pairs(emb.repartition(13), threshold=0.4, cent_every=50)
    )
    assert a == b and len(a) > 0


def test_persisted_ivf_quantizer_reuse(spark, tmp_path):
    """The VERDICT-r7 composition: the SAME persisted IVF index the ANN
    serving path maintains can drive semantic dedup. With
    kmeans_iters=0 the IVF centroids are the stride seeds (normalized),
    so cell assignments — and therefore the pair set — match the
    self-derived stride quantizer."""
    from alma_memory_spark.operators.ann_index import IVFIndex

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = IVFIndex.build(
        spark, emb, str(tmp_path / "ivf"), cent_every=50, kmeans_iters=0
    )
    via_index = _pairs(semantic_dedup_pairs(emb, threshold=0.4, quantizer=idx))
    via_stride = _pairs(semantic_dedup_pairs(emb, threshold=0.4, cent_every=50))
    assert via_index == via_stride and len(via_index) > 0

    # and the loaded handle (fresh session surrogate) behaves the same
    loaded = IVFIndex.load(spark, str(tmp_path / "ivf"))
    assert _pairs(semantic_dedup_pairs(emb, threshold=0.4, quantizer=loaded)) == via_index


def test_families_are_cell_bounded_transitive_chains(spark):
    """Pins the SemDeDup contract: transitive chains WITHIN a cell
    collapse into one family with a deterministic min-id keeper, and a
    near-dup straddling a cell boundary is knowingly missed (every
    edge is within-cell — the approximation that buys never running an
    all-pairs compare)."""
    dim = 8
    # two far-apart anchor directions -> two cells (ids 0 and 4 are the
    # stride seeds at cent_every=4)
    a = np.zeros(dim); a[0] = 1.0
    b = np.zeros(dim); b[1] = 1.0
    rows = [
        (0, [float(x) for x in a]),                      # seed cell 0
        (1, [float(x) for x in (0.96 * a + 0.28 * b)]),  # near a
        (2, [float(x) for x in (0.71 * a + 0.71 * b)]),  # equidistant
        (3, [float(x) for x in (0.28 * a + 0.96 * b)]),  # near b
        (4, [float(x) for x in b]),                      # seed cell 4
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semantic_dedup_pairs(emb, threshold=0.7, cent_every=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # equidistant vec 2 tie-breaks to the LARGER cell (4) in every
    # engine; it chains 3 and 4 transitively even though cos(2,4)=0.71
    # is near the floor, while the cross-cell near-dup (1,2) with
    # cos=0.88 is NOT emitted — the documented approximation
    assert (2, 3) in got and (3, 4) in got and (1, 2) not in got
    groups = semantic_dedup_groups(pairs).collect()
    comp = {r["doc_id"]: r["group_id"] for r in groups}
    assert comp == {0: 0, 1: 0, 2: 2, 3: 2, 4: 2}
    canon = {r["doc_id"] for r in groups if r["is_canonical"]}
    assert canon == {0, 2}


def test_stride_centroids_raise_on_empty(spark):
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="no centroids"):
        stride_centroids(emb, "vec_id", "embedding", 50)


def test_incremental_pairs_match_full_run_restricted_to_batch(spark, tmp_path):
    """The accumulation contract (NearDupIndex.add analog): pairs from
    an incremental batch == the full quantizer-pinned run restricted to
    pairs touching the batch; a second increment after quantizer.add()
    keeps agreeing."""
    from alma_memory_spark.operators.ann_index import IVFIndex
    from alma_memory_spark.operators.semdedup import (
        semantic_dedup_pairs_incremental,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    a = emb.filter(F.col("vec_id") < 350)
    b = emb.filter((F.col("vec_id") >= 350) & (F.col("vec_id") < 430))
    c = emb.filter(F.col("vec_id") >= 430)
    idx = IVFIndex.build(
        spark, a, str(tmp_path / "ivf"), cent_every=50, kmeans_iters=0
    )

    def touching(pairs, lo, hi):
        return {
            p for p in pairs
            if lo <= p[0] < hi or lo <= p[1] < hi
        }

    inc_b = _pairs(semantic_dedup_pairs_incremental(idx, b, threshold=0.4))
    full_ab = _pairs(
        semantic_dedup_pairs(a.unionByName(b), threshold=0.4, quantizer=idx)
    )
    assert inc_b == touching(full_ab, 350, 430) and inc_b

    # publish B, then increment C: the union across increments equals
    # the full run's pair set
    idx2 = idx.add(b)
    inc_c = _pairs(semantic_dedup_pairs_incremental(idx2, c, threshold=0.4))
    full_abc = _pairs(
        semantic_dedup_pairs(emb, threshold=0.4, quantizer=idx)
    )
    base_a = full_abc - touching(full_abc, 350, 500)
    assert base_a | inc_b | inc_c == full_abc

    # empty batch: no rows, schema intact
    empty = semantic_dedup_pairs_incremental(
        idx2, emb.filter("vec_id < 0"), threshold=0.4
    )
    assert empty.count() == 0 and empty.columns == ["id_a", "id_b", "cos_sim"]


def test_kmeans_refined_quantizer_yields_valid_pairs(spark, tmp_path):
    """A kmeans-refined IVFIndex is a legal quantizer: pairs stay
    within-cell cosine >= threshold (values exact vs a driver check),
    deterministic across runs."""
    import numpy as np

    from alma_memory_spark.operators.ann_index import IVFIndex

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = IVFIndex.build(
        spark, emb, str(tmp_path / "ivfk"), cent_every=50, kmeans_iters=2
    )
    pairs = _pairs(semantic_dedup_pairs(emb, threshold=0.4, quantizer=idx))
    assert pairs
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for a, b, s in pairs:
        va, vb = vecs[a], vecs[b]
        want = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
        assert abs(want - s) <= 1e-6 and s >= 0.4
    assert pairs == _pairs(semantic_dedup_pairs(emb, threshold=0.4, quantizer=idx))


def test_incremental_replayed_batch_emits_no_self_pairs(spark, tmp_path):
    """crash-redelivery shape: incrementing a batch whose ids are
    ALREADY in the lists must not pair a doc with its own stored copy
    (same-id pairs are excluded by id, not row position)."""
    from alma_memory_spark.operators.ann_index import IVFIndex
    from alma_memory_spark.operators.semdedup import (
        semantic_dedup_pairs_incremental,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = IVFIndex.build(
        spark, emb, str(tmp_path / "ivfr"), cent_every=50, kmeans_iters=0
    )
    replay = emb.filter(F.col("vec_id") % 10 == 0)  # already indexed
    pairs = semantic_dedup_pairs_incremental(idx, replay, threshold=0.4)
    got = pairs.collect()
    assert all(r["id_a"] != r["id_b"] for r in got)


def test_semdedup_index_build_add_load_roundtrip(spark, tmp_path):
    """Persisted semantic dedup index: build(70%) + add(30%) equals the
    quantizer-pinned full run pair-for-pair; replayed add appends
    nothing; load() serves the same state; groups/drop_list derive."""
    from alma_memory_spark.operators.semdedup import SemDedupIndex

    emb = load_table(spark, SF_DIR, "embeddings")
    a = emb.filter(F.col("vec_id") % 10 < 7)
    b = emb.filter(F.col("vec_id") % 10 >= 7)
    idx = SemDedupIndex.build(
        spark, a, str(tmp_path / "sd"), threshold=0.4, cent_every=50
    )
    n1 = idx.add(b)
    assert n1 >= 1
    want = _pairs(semantic_dedup_pairs(emb, threshold=0.4, quantizer=idx.ivf))
    got = {
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in idx.pairs().collect()
    }
    assert got == want
    # replay: no new pairs, no membership duplication, state unchanged
    before = idx.pairs().count()
    assert idx.add(b) == 0
    assert idx.pairs().count() == before
    assert idx.n_docs == emb.count()

    loaded = SemDedupIndex.load(spark, str(tmp_path / "sd"))
    assert loaded.threshold == 0.4 and loaded.n_docs == idx.n_docs
    assert {
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in loaded.pairs().collect()
    } == want
    g = loaded.groups().collect()
    assert all((r["doc_id"] == r["group_id"]) == r["is_canonical"] for r in g)
    drops = {r["doc_id"] for r in loaded.drop_list().collect()}
    assert drops == {r["doc_id"] for r in g if not r["is_canonical"]}


def test_semdedup_index_superseded_handle_raises(spark, tmp_path):
    from alma_memory_spark.operators.semdedup import SemDedupIndex

    emb = load_table(spark, SF_DIR, "embeddings")
    v1 = SemDedupIndex.build(
        spark, emb.filter("vec_id % 2 = 0"), str(tmp_path / "sv"),
        threshold=0.4,
    )
    SemDedupIndex.build(spark, emb, str(tmp_path / "sv"), threshold=0.4)
    with pytest.raises(RuntimeError, match="reload"):
        v1.add(emb.filter("vec_id % 2 = 1"))


def test_streaming_semdedup_maintenance_matches_one_shot(spark, tmp_path):
    """stream_documents_into_indexes(semdedup_index=...): after the
    second half of the embeddings replays through a file stream in
    micro-batches, accumulated pairs equal the quantizer-pinned
    one-shot run over the full corpus."""
    from alma_memory_spark.operators.semdedup import SemDedupIndex
    from alma_memory_spark.streaming.ingest import (
        stream_documents_into_indexes,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    idx = SemDedupIndex.build(
        spark, half_a, str(tmp_path / "ssd"), threshold=0.4, cent_every=50
    )
    inbox = str(tmp_path / "inbox")
    half_b.repartition(4).write.parquet(inbox)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 2)
        .parquet(inbox)
    )
    batches = []
    q = stream_documents_into_indexes(
        stream, semdedup_index=idx,
        checkpoint=str(tmp_path / "ckpt"), id_col="vec_id",
        vec_col="embedding", on_batch=batches.append,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) >= 2
    want = _pairs(semantic_dedup_pairs(emb, threshold=0.4, quantizer=idx.ivf))
    got = {
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in idx.pairs().collect()
    }
    assert got == want and want
    assert idx.n_docs == emb.count()


def test_multi_probe_assignment_recovers_boundary_pairs(spark):
    """n_assign is the recall knob for THE SemDeDup approximation: a
    crafted near-dup pair that straddles a cell boundary (each member
    nearest a different centroid) is missed at n_assign=1 and found at
    n_assign=2, while single-probe output stays a strict subset and
    non-boundary behavior is unchanged."""
    import math

    def nrm(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    A = [1.0, 0.0, 0.0, 0.0]
    B = nrm([0.7, 0.714142842854285, 0.0, 0.0])
    # p leans toward A, q toward B; cos(p, q) ~ 0.999
    p = nrm([1.0, 0.42, 0.0, 0.0])
    q = nrm([1.0, 0.52, 0.0, 0.0])
    rows = [
        (0, A),        # centroid seed (id % 50 == 0)
        (50, B),       # centroid seed
        (1, p),
        (2, q),
        (3, nrm([0.0, 0.0, 1.0, 0.0])),  # unrelated direction
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    single = _pairs(
        semantic_dedup_pairs(df, threshold=0.99, cent_every=50, n_assign=1)
    )
    multi = _pairs(
        semantic_dedup_pairs(df, threshold=0.99, cent_every=50, n_assign=2)
    )
    single_ids = {(a, b) for a, b, _s in single}
    multi_ids = {(a, b) for a, b, _s in multi}
    # the boundary pair is the multi-probe win
    assert (1, 2) not in single_ids
    assert (1, 2) in multi_ids
    # single-probe pairs survive multi-probe (subset, same sims)
    assert single <= multi
    # no duplicate pair rows despite shared cells
    got = semantic_dedup_pairs(
        df, threshold=0.99, cent_every=50, n_assign=2
    ).collect()
    assert len(got) == len({(r["id_a"], r["id_b"]) for r in got})
    # and on the real corpus the subset property holds too
    emb = load_table(spark, SF_DIR, "embeddings")
    s1 = _pairs(semantic_dedup_pairs(emb, threshold=0.4, cent_every=50))
    s2 = _pairs(
        semantic_dedup_pairs(emb, threshold=0.4, cent_every=50, n_assign=2)
    )
    assert s1 <= s2


def test_semdedup_index_multiprobe_matches_pinned_full_run(spark, tmp_path):
    """r9 (VERDICT r8 #1): the PERSISTED index at n_assign=2 — build +
    add accumulates exactly the quantizer-pinned full multi-probe run;
    a crafted boundary pair split across build/add is FOUND (the
    single-probe persisted path missed it); replay appends nothing;
    load() restores the n_assign knob."""
    import math

    from alma_memory_spark.operators.semdedup import SemDedupIndex

    emb = load_table(spark, SF_DIR, "embeddings")
    a = emb.filter(F.col("vec_id") % 10 < 7)
    b = emb.filter(F.col("vec_id") % 10 >= 7)
    idx = SemDedupIndex.build(
        spark, a, str(tmp_path / "sd2"), threshold=0.4, cent_every=50,
        n_assign=2,
    )
    assert idx.add(b) >= 1
    want = _pairs(
        semantic_dedup_pairs(
            emb, threshold=0.4, quantizer=idx.ivf, n_assign=2
        )
    )
    got = {
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in idx.pairs().collect()
    }
    assert got == want
    # strictly more recall than the single-probe accumulation
    want1 = _pairs(semantic_dedup_pairs(emb, threshold=0.4, quantizer=idx.ivf))
    assert want1 <= want
    # replay: no new pairs, no membership duplication
    before = idx.pairs().count()
    assert idx.add(b) == 0
    assert idx.pairs().count() == before
    loaded = SemDedupIndex.load(spark, str(tmp_path / "sd2"))
    assert loaded.n_assign == 2
    assert {
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in loaded.pairs().collect()
    } == want

    # boundary corpus: p lands with the build, q arrives via add() —
    # they straddle the A/B cell boundary, so only multi-probe
    # membership lets the increment see p at all
    def nrm(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    A = [1.0, 0.0, 0.0, 0.0]
    B = nrm([0.7, 0.714142842854285, 0.0, 0.0])
    p = nrm([1.0, 0.42, 0.0, 0.0])
    q = nrm([1.0, 0.52, 0.0, 0.0])
    build_rows = [(0, A), (50, B), (1, p), (3, nrm([0.0, 0.0, 1.0, 0.0]))]
    bdf = spark.createDataFrame(
        build_rows, "vec_id long, embedding array<double>"
    )
    qdf = spark.createDataFrame(
        [(2, q)], "vec_id long, embedding array<double>"
    )
    for n_assign, expect_found in ((1, False), (2, True)):
        bidx = SemDedupIndex.build(
            spark, bdf, str(tmp_path / f"bd{n_assign}"), threshold=0.99,
            cent_every=50, n_assign=n_assign,
        )
        bidx.add(qdf)
        found = {(r["id_a"], r["id_b"]) for r in bidx.pairs().collect()}
        assert ((1, 2) in found) is expect_found


def test_semdedup_index_compact_folds_files_preserves_content(spark, tmp_path):
    """r9 (VERDICT r8 #2): compact() folds per-add file accumulation to
    ONE file per pairs-bucket / ivf-cell partition with content
    identical through the canonical views, exact stats, and a working
    fresh handle; the superseded handle fails loudly."""
    from alma_memory_spark.operators.semdedup import SemDedupIndex

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter((F.col("vec_id") % 10 < 6) | (F.col("vec_id") % 50 == 0))
    idx = SemDedupIndex.build(
        spark, base, str(tmp_path / "sdc"), threshold=0.4, cent_every=50,
        n_buckets=8, n_assign=2,
    )
    for m in (6, 7, 8):
        idx.add(emb.filter((F.col("vec_id") % 10 == m) & (F.col("vec_id") % 50 != 0)))
    leftover = emb.filter((F.col("vec_id") % 10 == 9) & (F.col("vec_id") % 50 != 0))

    def pairset(i):
        return {(r["id_a"], r["id_b"], r["cos_sim"]) for r in i.pairs().collect()}

    def listset(i):
        return {
            (r["id"], r["cell"])
            for r in i.ivf._lists_df().select("id", "cell").collect()
        }

    def max_files_per_part(root):
        worst = 0
        for d in os.listdir(root):
            full = os.path.join(root, d)
            if not (os.path.isdir(full) and "=" in d):
                continue
            worst = max(
                worst,
                sum(1 for f in os.listdir(full) if f.endswith(".parquet")),
            )
        return worst

    pairs_before = pairset(idx)
    lists_before = listset(idx)
    n_before = idx.n_docs
    assert max_files_per_part(os.path.join(idx.vroot, "pairs")) > 1

    out = idx.compact()
    assert pairset(out) == pairs_before
    assert listset(out) == lists_before
    assert out.n_docs == n_before
    assert out.n_assign == 2
    assert max_files_per_part(os.path.join(out.vroot, "pairs")) == 1
    assert max_files_per_part(
        os.path.join(out.ivf.vroot, "lists")
    ) == 1

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="reload"):
        idx.add(leftover)
    # the compacted index keeps accumulating, equal to the pinned run
    out.add(leftover)
    from alma_memory_spark.operators.semdedup import semantic_dedup_pairs

    want = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in semantic_dedup_pairs(
            emb, threshold=0.4, quantizer=out.ivf, n_assign=2
        ).collect()
    }
    assert pairset(out) == want


def test_incremental_function_form_multiprobe_contract(spark, tmp_path):
    """r9: the function-form increment at n_assign=2 against an
    n_assign=2-built quantizer equals the full multi-probe run
    restricted to the batch (the knob must match the membership —
    documented in the docstring)."""
    from alma_memory_spark.operators.ann_index import IVFIndex
    from alma_memory_spark.operators.semdedup import (
        semantic_dedup_pairs_incremental,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    a = emb.filter(F.col("vec_id") < 400)
    b = emb.filter(F.col("vec_id") >= 400)
    idx = IVFIndex.build(
        spark, a, str(tmp_path / "ivf2"), cent_every=50, n_assign=2
    )
    inc = _pairs(
        semantic_dedup_pairs_incremental(idx, b, threshold=0.4, n_assign=2)
    )
    full = _pairs(
        semantic_dedup_pairs(emb, threshold=0.4, quantizer=idx, n_assign=2)
    )
    want = {p for p in full if p[0] >= 400 or p[1] >= 400}
    assert inc == want and inc
    # no duplicate pair rows despite shared probed cells
    rows = semantic_dedup_pairs_incremental(
        idx, b, threshold=0.4, n_assign=2
    ).collect()
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})


def test_auto_cent_every_bounds_and_balance():
    """r13 (VERDICT r12 #1): sqrt(n) clamped to [16, 2048]."""
    from alma_memory_spark.operators.semdedup import (
        AUTO_OCC_MAX,
        AUTO_OCC_MIN,
        auto_cent_every,
    )

    assert auto_cent_every(0) == AUTO_OCC_MIN
    assert auto_cent_every(100) == AUTO_OCC_MIN
    assert auto_cent_every(2500) == 50
    assert auto_cent_every(141_000) == 375
    assert auto_cent_every(10**12) == AUTO_OCC_MAX


def test_semantic_dedup_pairs_auto_matches_explicit(spark):
    """cent_every='auto' must be exactly the explicit
    auto_cent_every(n) run — same quantizer rule, same pairs."""
    from alma_memory_spark.operators.semdedup import (
        auto_cent_every,
        semantic_dedup_pairs,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    got = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in semantic_dedup_pairs(
            emb, threshold=0.3, cent_every="auto"
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in semantic_dedup_pairs(
            emb, threshold=0.3, cent_every=auto_cent_every(n)
        ).collect()
    }
    assert got == want and len(got) > 0


def test_semantic_dedup_families_matches_pairs_path(spark):
    """r13: semantic_dedup_families (per-cell LOCAL CC -> star edges,
    O(occ) rows/cell) must be ROW-identical to the pairs->groups
    composition for the same arguments — on real embeddings, on a
    pair-dense clustered corpus, and under multi-probe."""
    import numpy as np

    from alma_memory_spark.operators.semdedup import (
        semantic_dedup_families,
        semantic_dedup_groups,
        semantic_dedup_pairs,
    )

    def fam_rows(df):
        return sorted(
            (r["doc_id"], r["group_id"], r["is_canonical"])
            for r in df.collect()
        )

    emb = load_table(spark, SF_DIR, "embeddings")
    for na in (1, 2):
        want = fam_rows(
            semantic_dedup_groups(
                semantic_dedup_pairs(
                    emb, threshold=0.3, cent_every=40, n_assign=na
                )
            )
        )
        got = fam_rows(
            semantic_dedup_families(
                emb, threshold=0.3, cent_every=40, n_assign=na
            )
        )
        assert got == want and len(got) > 0, f"n_assign={na}"

    # pair-dense clustered corpus: long transitive chains inside cells
    # (the case star edges must NOT break) — vectors drift slowly so
    # a~b, b~c with a!~c occurs
    rng = np.random.default_rng(5)
    base = rng.normal(size=(8,))
    rows = []
    v = base.copy()
    for i in range(300):
        v = v + rng.normal(scale=0.02, size=(8,))
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    chain = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = fam_rows(
        semantic_dedup_groups(
            semantic_dedup_pairs(chain, threshold=0.995, cent_every=30)
        )
    )
    got = fam_rows(
        semantic_dedup_families(chain, threshold=0.995, cent_every=30)
    )
    assert got == want and len(got) > 0


def test_semantic_dedup_families_randomized_vs_pairs(spark):
    """r13 property pin for the hand-rolled in-kernel local CC
    (min-label propagation with path halving): across seeded random
    corpora of varying density/threshold — including near-degenerate
    all-similar and all-distinct regimes — families must equal the
    pairs->global-CC composition exactly."""
    import numpy as np

    from alma_memory_spark.operators.semdedup import (
        semantic_dedup_families,
        semantic_dedup_groups,
        semantic_dedup_pairs,
    )

    def fam_rows(df):
        return sorted(
            (r["doc_id"], r["group_id"], r["is_canonical"])
            for r in df.collect()
        )

    for seed, n, dim, scale, thr, ce in [
        (11, 180, 4, 0.6, 0.9, 20),     # low-dim, dense collisions
        (12, 240, 6, 0.05, 0.999, 35),  # tight clusters
        (13, 150, 8, 1.0, 0.2, 25),     # nearly-everything-similar
        (14, 200, 8, 2.0, 0.98, 60),    # nearly-nothing-similar
    ]:
        rng = np.random.default_rng(seed)
        n_anchor = max(3, n // 40)
        anchors = rng.normal(size=(n_anchor, dim))
        base = anchors[rng.integers(0, n_anchor, size=n)]
        V = base + rng.normal(scale=scale, size=(n, dim))
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in V[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        want = fam_rows(
            semantic_dedup_groups(
                semantic_dedup_pairs(emb, threshold=thr, cent_every=ce)
            )
        )
        got = fam_rows(
            semantic_dedup_families(emb, threshold=thr, cent_every=ce)
        )
        assert got == want, f"seed={seed}"
