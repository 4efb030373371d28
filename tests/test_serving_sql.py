"""SQL-compiled serving plan (operators/serving_sql.py, VERDICT r10 #1).

The contract under test: the compiled-SQL fast path is BIT-identical
to the DataFrame serving path for every retrieve() variant it serves —
full-precision float equality, not rounded — and falls back safely for
shapes it does not compile. Staleness: templates/views are keyed on
the store version stamp, so a write is visible to the very next
retrieve."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from alma_memory_spark import schemas
from alma_memory_spark.engine import AlmaSpark
from alma_memory_spark.testing import fixtures as FX

ANCHOR = datetime(2024, 6, 2, tzinfo=timezone.utc)


def _seed_prefs(spark):
    rows = [
        {
            "id": f"pref_{i:03d}",
            "user_id": "u1" if i % 2 else "u2",
            "category": "style",
            "preference": f"preference number {i}",
            "source": "explicit",
            "confidence": (i % 10) / 10.0,
            "timestamp": FX.NOW,
            "metadata": {},
        }
        for i in range(12)
    ]
    return spark.createDataFrame(rows, schemas.PREFERENCES)


@pytest.fixture()
def seeded(spark, tmp_path):
    from alma_memory_spark.embedding import HashEmbedder

    eng = AlmaSpark(
        spark,
        str(tmp_path / "store"),
        embedder=HashEmbedder(16),
        clock=lambda: ANCHOR,
    )
    eng.store.append("heuristics", FX.seed_heuristics(spark))
    eng.store.append("outcomes", FX.seed_outcomes(spark))
    eng.store.append("domain_knowledge", FX.seed_knowledge(spark))
    eng.store.append("anti_patterns", FX.seed_anti_patterns(spark))
    eng.store.append("preferences", _seed_prefs(spark))
    eng.store.append("retrieval_feedback", FX.seed_feedback(spark))
    return eng


def _slices_equal(a, b):
    """Full-precision comparison of two MemorySlice results."""
    for attr in (
        "heuristics",
        "outcomes",
        "preferences",
        "domain_knowledge",
        "anti_patterns",
    ):
        ra, rb = getattr(a, attr), getattr(b, attr)
        assert len(ra) == len(rb), (attr, len(ra), len(rb))
        for da, db in zip(ra, rb):
            assert set(da) == set(db), (attr, set(da) ^ set(db))
            for k in da:
                va, vb = da[k], db[k]
                if isinstance(va, list):
                    va, vb = list(va), list(vb)
                assert va == vb, (attr, k, va, vb)


VARIANTS = [
    dict(task="validate schema before writing", agent="helena", project_id="proj-a"),
    dict(
        task="remember what did we deploy",
        agent="helena",
        project_id="proj-a",
        top_k=7,
        mode="recall",
    ),
    dict(
        task="error debugging broken test",
        agent="victor",
        project_id="proj-b",
        mode="diagnostic",
    ),
    dict(
        task="how to test forms",
        agent="helena",
        project_id="proj-a",
        use_feedback=True,
    ),
    dict(
        task="preferences and style",
        agent="helena",
        project_id="proj-a",
        user_id="u1",
    ),
    dict(
        task="shared memory read",
        agent="helena",
        project_id="proj-a",
        inherit_from=["victor"],
    ),
    dict(task="no project scope read", agent="senior_dev"),
    dict(
        task="plan design options broadly",
        agent="helena",
        project_id="proj-a",
        mode="broad",
    ),
]


def test_sql_path_bitwise_equals_df_path(seeded):
    for kw in VARIANTS:
        # same task both passes; flush the slice cache between them so
        # the second call cannot be served the first call's slice
        seeded.serving_sql_enabled = True
        seeded._cache.clear()
        a = seeded.retrieve(**kw)
        seeded.serving_sql_enabled = False
        seeded._cache.clear()
        b = seeded.retrieve(**kw)
        _slices_equal(a, b)
    seeded.serving_sql_enabled = True
    # the comparisons above must have exercised the REAL fast path —
    # an analysis-error fallback would compare DF against DF; dump the
    # failing statement for diagnosis if one happened
    if seeded._srv_fallbacks:
        err, text = seeded._srv_last_error
        with open("/tmp/srv_sql_fail.txt", "w") as fh:
            fh.write(err + "\n\n" + text)
    assert seeded._srv_fallbacks == 0, seeded._srv_last_error and seeded._srv_last_error[0]
    assert seeded._srv_hits >= len(VARIANTS)


def test_sql_path_sees_fresh_writes(seeded, spark):
    sl1 = seeded.retrieve("authentication oauth tokens", agent="helena", project_id="proj-a")
    n1 = len(sl1.domain_knowledge)
    # append a new high-similarity fact and retrieve again: the stamp
    # bump must invalidate views + template and serve the new row
    from alma_memory_spark.embedding import hash_embed

    row = {
        "id": "dk_fresh",
        "agent": "helena",
        "project_id": "proj-a",
        "domain": "authentication",
        "fact": "authentication oauth tokens",
        "source": "user_stated",
        "confidence": 1.0,
        "last_verified": ANCHOR,
        "verification_status": None,
        "embedding": hash_embed("authentication oauth tokens", 16),
        "metadata": {},
    }
    seeded.store.append(
        "domain_knowledge", spark.createDataFrame([row], schemas.DOMAIN_KNOWLEDGE)
    )
    seeded._cache.clear()
    sl2 = seeded.retrieve("authentication oauth tokens", agent="helena", project_id="proj-a")
    ids = [r["id"] for r in sl2.domain_knowledge]
    assert "dk_fresh" in ids
    assert len(sl2.domain_knowledge) >= n1


def test_compiler_literals_roundtrip():
    from alma_memory_spark.operators import serving_sql as SS

    assert SS.double_literal(0.1) == "0.1D"
    assert SS.double_literal(1e-07) == "1e-07D"
    # quotes escape by DOUBLING — valid in both
    # spark.sql.parser.escapedStringLiterals modes (ADVICE r11)
    assert SS.string_literal("o'brien") == "'o''brien'"
    # the python fold must equal the JVM's left-to-right double fold
    import math

    qv = [0.1, 0.2, 0.3]
    acc = 0.0
    for v in qv:
        acc += v * v
    assert SS.qv_norm(qv) == math.sqrt(acc)


def test_now_epoch_matches_spark_cast(spark):
    """now_epoch_seconds must equal Cast(lit(ts) AS DOUBLE) exactly —
    the value Catalyst constant-folds in the DataFrame path."""
    from pyspark.sql import functions as F

    from alma_memory_spark.operators import serving_sql as SS

    for dt in [
        datetime(2024, 2, 15, tzinfo=timezone.utc),
        datetime(2031, 12, 31, 23, 59, 59, 123456, tzinfo=timezone.utc),
        datetime(1969, 7, 20, 20, 17, 40, 7, tzinfo=timezone.utc),
    ]:
        got = SS.now_epoch_seconds(dt)
        want = spark.range(1).select(F.lit(dt).cast("double")).collect()[0][0]
        assert got == want, (dt, got, want)


def test_unsupported_shapes_fall_back(seeded):
    from alma_memory_spark.operators import serving_sql as SS

    with pytest.raises(SS.ServingSQLUnsupported):
        SS.compile_serving_template(
            [], 5, 0.2, None, None, None, ("a",), prefs=None
        )
    # engine-level: a compiler rejection must not break retrieve
    import alma_memory_spark.engine as EM

    orig = EM.AlmaSpark._sql_serving_rows

    def boom(self, *a, **kw):
        raise SS.ServingSQLUnsupported("forced")

    EM.AlmaSpark._sql_serving_rows = boom
    try:
        seeded._cache.clear()
        sl = seeded.retrieve("fallback path works", agent="helena", project_id="proj-a")
        assert sl is not None
    finally:
        EM.AlmaSpark._sql_serving_rows = orig


def test_batch_sql_path_bitwise_equals_df_path(seeded):
    """r11: retrieve_batch's compiled-SQL path (qid-dimension VALUES
    bind) is bit-identical to the DataFrame batch path at full
    precision, including the preferences branch."""
    tasks = [
        "validate schema before writing rows",
        "mock the api layer and assert contracts",
        "remember the deployment switchover",
    ]
    seeded.serving_sql_enabled = True
    seeded._cache.clear()
    a = seeded.retrieve_batch(tasks, agent="helena", project_id="proj-a",
                              user_id="u1", top_k=7)
    seeded.serving_sql_enabled = False
    seeded._cache.clear()
    b = seeded.retrieve_batch(tasks, agent="helena", project_id="proj-a",
                              user_id="u1", top_k=7)
    seeded.serving_sql_enabled = True
    assert set(a) == set(b) == set(tasks)
    for t in tasks:
        _slices_equal(a[t], b[t])


def test_reserved_column_collision_falls_back(spark, tmp_path):
    """r11: a store table already exposing a pipeline-added column
    (e.g. `similarity` — seen in the wild via StructType.add's
    in-place-mutation footgun) must NOT produce an ambiguous compiled
    statement: the compiler refuses, the engine falls back to the
    DataFrame path (whose withColumn REPLACES the column), and the
    retrieve still serves."""
    from pyspark.sql import types as T

    from alma_memory_spark.embedding import HashEmbedder, hash_embed

    schema = T.StructType(
        list(schemas.DOMAIN_KNOWLEDGE.fields)
        + [T.StructField("similarity", T.DoubleType())]
    )
    rows = [
        {
            "id": f"d{i}", "agent": "helena", "project_id": "p",
            "domain": "d", "fact": f"fact number {i}",
            "source": "user_stated", "confidence": 0.9,
            "last_verified": ANCHOR, "verification_status": None,
            "embedding": hash_embed(f"fact number {i}", 16),
            "metadata": {}, "similarity": 0.123,
        }
        for i in range(6)
    ]
    eng = AlmaSpark(
        spark, str(tmp_path / "store"), embedder=HashEmbedder(16),
        clock=lambda: ANCHOR,
    )
    eng.store.append("domain_knowledge", spark.createDataFrame(rows, schema))
    sl = eng.retrieve("fact number 3", agent="helena", project_id="p")
    assert sl.domain_knowledge, "retrieve must still serve via fallback"
    # the compiler refused (no analysis error, no sql hit for dk)
    assert eng._srv_fallbacks == 0 and eng._srv_last_error is None
    assert eng._srv_hits == 0


# ---------------------------------------------------------------------------
# ANN serving through the SQL template (r12, VERDICT r11 #1)
# ---------------------------------------------------------------------------


def test_ann_sql_path_bitwise_equals_df_path(seeded):
    """retrieve(use_ann=True) with a scope-expressible IVF index now
    compiles: the probe stays on the index path and its candidate set
    binds as a VALUES table. Mixed branch shapes (only domain_knowledge
    indexed; heuristics/outcomes/anti_patterns keep the exact cosine
    scan) must still be bit-identical to the DataFrame ANN path, with
    the fast path actually taken (hit counters, zero fallbacks)."""
    rep = seeded.index_vectors("domain_knowledge", cent_every=7)
    assert rep["indexed"]
    for nprobe in (rep["n_cells"], 1):
        seeded.serving_sql_enabled = True
        seeded._cache.clear()
        h0, f0 = seeded._srv_hits, seeded._srv_fallbacks
        a = seeded.retrieve(
            "validate schema before writing", agent="helena",
            project_id="proj-a", top_k=6, use_ann=True, nprobe=nprobe,
        )
        assert seeded._srv_hits == h0 + 1, seeded._srv_last_error
        assert seeded._srv_fallbacks == f0
        seeded.serving_sql_enabled = False
        seeded._cache.clear()
        b = seeded.retrieve(
            "validate schema before writing", agent="helena",
            project_id="proj-a", top_k=6, use_ann=True, nprobe=nprobe,
        )
        _slices_equal(a, b)
    seeded.serving_sql_enabled = True


def test_ann_sql_empty_candidates_matches_df(seeded):
    """A scoped ANN probe that returns NO candidates binds as the
    all-NULL VALUES row — the inner join matches nothing, exactly the
    DataFrame path's empty-join branch. No fallback, no analysis
    error."""
    seeded.index_vectors("domain_knowledge", cent_every=7)
    seeded.serving_sql_enabled = True
    seeded._cache.clear()
    h0 = seeded._srv_hits
    a = seeded.retrieve(
        "anything at all", agent="ghost_agent", project_id="proj-a",
        use_ann=True, nprobe=2,
    )
    assert seeded._srv_hits == h0 + 1, seeded._srv_last_error
    assert a.domain_knowledge == []
    seeded.serving_sql_enabled = False
    seeded._cache.clear()
    b = seeded.retrieve(
        "anything at all", agent="ghost_agent", project_id="proj-a",
        use_ann=True, nprobe=2,
    )
    seeded.serving_sql_enabled = True
    _slices_equal(a, b)


def test_ann_batch_sql_path_bitwise_equals_df_path(seeded):
    """retrieve_batch(use_ann=True): search_batch's (qid, id,
    similarity) candidates bind as one VALUES table; per-task slices
    bit-identical to the DataFrame batch ANN path."""
    rep = seeded.index_vectors("domain_knowledge", cent_every=7)
    tasks = [
        "validate schema before writing rows",
        "mock the api layer and assert contracts",
        "remember the deployment switchover",
    ]
    seeded.serving_sql_enabled = True
    seeded._cache.clear()
    h0, f0 = seeded._srv_hits, seeded._srv_fallbacks
    a = seeded.retrieve_batch(
        tasks, agent="helena", project_id="proj-a", top_k=6,
        use_ann=True, nprobe=rep["n_cells"],
    )
    assert seeded._srv_hits == h0 + 1, seeded._srv_last_error
    assert seeded._srv_fallbacks == f0
    seeded.serving_sql_enabled = False
    seeded._cache.clear()
    b = seeded.retrieve_batch(
        tasks, agent="helena", project_id="proj-a", top_k=6,
        use_ann=True, nprobe=rep["n_cells"],
    )
    seeded.serving_sql_enabled = True
    for t in tasks:
        _slices_equal(a[t], b[t])


def test_ann_batch_small_routes_to_sql_text_probe(seeded, monkeypatch):
    """r14 (VERDICT r13 #3): batches up to _ANN_BATCH_SQL_MAX must
    splice the probe as SQL TEXT — zero search_batch() frame
    construction, zero temp views. Pinned by making the DataFrame
    probe unreachable: search_batch raises, the retrieve must still be
    SQL-served. Past the threshold the view path is REQUIRED (arrow
    kernel wins at large batch) — pinned by dropping the threshold to
    0 and counting the register call."""
    from alma_memory_spark import engine as E
    from alma_memory_spark.operators.ann_index import IVFIndex

    rep = seeded.index_vectors("domain_knowledge", cent_every=7)
    tasks = ["probe text routing one", "probe text routing two"]
    seeded.serving_sql_enabled = True
    seeded._cache.clear()

    def boom(self, *a, **kw):
        raise AssertionError("search_batch frame built for a small batch")

    monkeypatch.setattr(IVFIndex, "search_batch", boom)
    h0 = seeded._srv_hits
    out = seeded.retrieve_batch(
        tasks, agent="helena", project_id="proj-a", top_k=6,
        use_ann=True, nprobe=rep["n_cells"],
    )
    assert seeded._srv_hits == h0 + 1, seeded._srv_last_error
    assert out[tasks[0]] is not None
    monkeypatch.undo()

    # threshold 0: the view path must be taken (register called once
    # per ann branch)
    monkeypatch.setattr(E, "_ANN_BATCH_SQL_MAX", 0)
    calls = []
    orig = type(seeded)._register_cand_view

    def counting(self, table, cand_df):
        calls.append(table)
        return orig(self, table, cand_df)

    monkeypatch.setattr(type(seeded), "_register_cand_view", counting)
    seeded._cache.clear()
    out2 = seeded.retrieve_batch(
        tasks, agent="helena", project_id="proj-a", top_k=6,
        use_ann=True, nprobe=rep["n_cells"],
    )
    assert calls == ["domain_knowledge"]
    for t in tasks:
        _slices_equal(out[t], out2[t])


def test_token_collision_refuses_to_compile(seeded):
    """ADVICE r11: bind() does global token substitution, so a config
    string CONTAINING a token (here a project id with @NOWD@) must
    refuse at compile time and fall back to the DataFrame path —
    never silently rewrite the literal."""
    from alma_memory_spark.operators import serving_sql as SS

    with pytest.raises(SS.ServingSQLUnsupported):
        SS.compile_serving_template(
            [SS.BranchInput("domain_knowledge", "v", ("id", "embedding"), (("id", "string"), ("embedding", "array<float>")))],
            5, 0.2, None, None, "proj@NOWD@x", ("a",),
        )
    # engine-level: the retrieve still serves (DF fallback), 0 sql hits
    seeded._cache.clear()
    h0 = seeded._srv_hits
    sl = seeded.retrieve(
        "token safety", agent="helena", project_id="proj@NOWD@x",
    )
    assert sl is not None
    assert seeded._srv_hits == h0
    assert seeded._srv_fallbacks == 0 and (
        seeded._srv_last_error is None
    ), "compiler must refuse BEFORE any analysis error"


def test_legacy_parser_mode_refuses_to_compile(seeded, spark):
    """ADVICE r11: under spark.sql.parser.escapedStringLiterals=true
    the \\' escaping rules change — the engine must refuse to compile
    (DataFrame fallback) rather than risk splicing text into the
    statement."""
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        seeded._cache.clear()
        seeded._srv_templates.clear()
        h0 = seeded._srv_hits
        sl = seeded.retrieve(
            "legacy parser mode", agent="helena", project_id="proj-a"
        )
        assert sl is not None
        assert seeded._srv_hits == h0
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
    seeded._cache.clear()
    sl2 = seeded.retrieve(
        "legacy parser mode again", agent="helena", project_id="proj-a"
    )
    assert seeded._srv_hits == h0 + 1, "default mode compiles again"
    assert sl2 is not None


def test_parser_mode_flip_after_template_cached(seeded, spark):
    """ADVICE r12: a template cached under the default parser mode
    must NOT execute after escapedStringLiterals flips to true — its
    literals were escaped for the default mode. The per-run check in
    _srv_run forces the DataFrame fallback even on a cache hit."""
    seeded._cache.clear()
    sl = seeded.retrieve("flip check", agent="helena", project_id="proj-a")
    assert sl is not None
    h0 = seeded._srv_hits
    assert h0 > 0, "template cached under default mode"
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        seeded._cache.clear()
        sl2 = seeded.retrieve("flip check", agent="helena", project_id="proj-a")
        assert sl2 is not None
        assert seeded._srv_hits == h0, (
            "cached template must not execute under the legacy parser mode"
        )
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")


def test_quote_in_scope_string_served_correctly(seeded, spark):
    """A single quote inside an agent/project id must survive the
    doubled-quote literal in BOTH parser modes' default (the compiled
    statement analyzes and the scoped read returns the right rows)."""
    from alma_memory_spark.embedding import hash_embed

    rows = [
        {
            "id": "q1", "agent": "o'brien", "project_id": "proj'x",
            "domain": "d", "fact": "quoted scope fact",
            "source": "user_stated", "confidence": 0.9,
            "last_verified": ANCHOR, "verification_status": None,
            "embedding": hash_embed("quoted scope fact", 16),
            "metadata": {},
        }
    ]
    seeded.store.append(
        "domain_knowledge",
        seeded.spark.createDataFrame(rows, schemas.DOMAIN_KNOWLEDGE),
    )
    seeded._cache.clear()
    h0 = seeded._srv_hits
    sl = seeded.retrieve(
        "quoted scope fact", agent="o'brien", project_id="proj'x"
    )
    assert seeded._srv_hits == h0 + 1, seeded._srv_last_error
    assert [r["id"] for r in sl.domain_knowledge] == ["q1"]


def test_ann_sql_plan_probes_inside_one_job(seeded):
    """Plan-shape pin for the r12 design claim, updated for the r13
    JVM probe kernel (VERDICT r12 #4): the compiled ANN statement's
    physical plan must contain the probe's pruned lists SCAN on the
    BUILD side of a broadcast join — the probe executes INSIDE the one
    serving job, not as a separate candidate-collect job — and must
    carry NO Python evaluation node at all (the scoring kernel is a
    column expression, so serving never pays the Python-worker round
    trip that dominated warm ANN latency through r12)."""
    import alma_memory_spark.engine as EM

    seeded.index_vectors("domain_knowledge", cent_every=7)
    seeded.retrieve(
        "plan warm", agent="helena", project_id="proj-a",
        use_ann=True, nprobe=2,
    )
    plans = []
    orig = EM.AlmaSpark._srv_run

    def capture(self, text):
        df = self.spark.sql(text)
        plans.append(df._jdf.queryExecution().executedPlan().toString())
        return orig(self, text)

    EM.AlmaSpark._srv_run = capture
    try:
        seeded._cache.clear()
        seeded.retrieve(
            "plan audit question", agent="helena", project_id="proj-a",
            use_ann=True, nprobe=2,
        )
    finally:
        EM.AlmaSpark._srv_run = orig
    assert plans, "SQL path did not serve"
    p = plans[-1]
    assert "MapInPandas" not in p and "Python" not in p, (
        "serving statement must be pure JVM (r13)"
    )
    # the probe's pruned cell-partitioned lists scan runs inside this
    # statement: its partition column (`cell`) appears in the plan's
    # scan output, and the candidate side joins broadcast
    assert "cell#" in p, "probe lists scan missing from the statement plan"
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, p[:500]
    # the per-call candidate views must not leak
    leftover = [
        t.name for t in seeded.spark.catalog.listTables()
        if t.name.startswith("alma_cand_")
    ]
    assert leftover == [], leftover


def test_concurrent_ann_retrieves_do_not_cross_talk(seeded):
    """r12: the per-call unique candidate views exist because two
    concurrent ANN retrieves on ONE engine must never serve each
    other's candidates. Run two distinct ANN queries concurrently many
    times and require every slice to equal its serial result."""
    from concurrent.futures import ThreadPoolExecutor

    seeded.index_vectors("domain_knowledge", cent_every=7)
    q1 = dict(
        task="validate schema before writing", agent="helena",
        project_id="proj-a", top_k=6, use_ann=True, nprobe=2,
    )
    q2 = dict(
        task="remember what did we deploy", agent="victor",
        project_id="proj-b", top_k=6, use_ann=True, nprobe=2,
    )
    seeded._cache.clear()
    want1 = seeded.retrieve(**q1)
    seeded._cache.clear()
    want2 = seeded.retrieve(**q2)
    with ThreadPoolExecutor(max_workers=2) as ex:
        for _ in range(4):
            seeded._cache.clear()
            f1 = ex.submit(seeded.retrieve, **q1)
            f2 = ex.submit(seeded.retrieve, **q2)
            _slices_equal(f1.result(), want1)
            _slices_equal(f2.result(), want2)
    assert seeded._srv_fallbacks == 0, seeded._srv_last_error
    leftover = [
        t.name for t in seeded.spark.catalog.listTables()
        if t.name.startswith("alma_cand_")
    ]
    assert leftover == [], leftover
